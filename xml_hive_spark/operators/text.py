"""Text-analysis operators over the ``documents`` table (BASELINE.md
north_star: language-ID, quality scoring, token counting, fingerprinting).

Everything is built-in string/array functions — JVM-side, codegen'd, no
Python UDFs — so the per-document cost is a tight columnar pass and the
only shuffle is the final aggregate (if any).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xml_hive_spark.operators import query, t

_STOPWORDS = ("the", "a", "of", "and", "to")
_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@query(
    "text_token_stats",
    oracle=f"""
SELECT doc_id,
       len(string_split_regex(text, '\\s+'))                AS ws_tokens,
       len(regexp_extract_all(lower(text), '{_TOKEN_RE}'))  AS re_tokens,
       CAST(len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS INTEGER)
           AS distinct_words,
       round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
             / len(string_split_regex(text, '\\s+')), 4)    AS avg_word_len
FROM documents
""",
    tags=("text", "tokens"),
)
def text_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting: whitespace tokens + regex (BPE-ish pre-tokenizer)
    tokens + distinct words + mean word length."""
    docs = t(spark, sf, "documents")
    ws = F.split(F.col("text"), r"\s+")
    return docs.select(
        "doc_id",
        F.size(ws).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_TOKEN_RE), 0)).alias(
            "re_tokens"
        ),
        F.size(F.array_distinct(F.split(F.lower("text"), r"\s+"))).alias(
            "distinct_words"
        ),
        F.round(
            F.length(F.regexp_replace("text", r"\s+", "")).cast("double") / F.size(ws),
            4,
        ).alias("avg_word_len"),
    )


@query(
    "text_quality_score",
    oracle=f"""
WITH s AS (
  SELECT doc_id, n_chars,
         len(string_split_regex(lower(text), '\\s+')) AS n_words,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         w -> list_contains({list(_STOPWORDS)!r}, w))) AS n_stop
  FROM documents
)
SELECT doc_id, n_words,
       CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
       least(n_words / 100.0, 1.0) * 0.5
           + (1.0 - CAST(n_stop AS DOUBLE) / n_words) * 0.3
           + least(CAST(n_chars AS DOUBLE) / n_words / 10.0, 1.0) * 0.2
           AS quality_score
FROM s
""",
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic quality score: length, stopword ratio, mean word length —
    the standard cheap pre-filter stage of an LLM data pipeline."""
    docs = t(spark, sf, "documents")
    words = F.split(F.lower("text"), r"\s+")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    stop_ratio = n_stop.cast("double") / n_words
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.5
        + (F.lit(1.0) - stop_ratio) * 0.3
        + F.least(F.col("n_chars").cast("double") / n_words / 10.0, F.lit(1.0)) * 0.2
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality_score"),
    )


@query(
    "text_language_id",
    oracle="""
SELECT doc_id, lang AS labeled_lang,
       len(list_filter(string_split_regex(lower(text), '\\s+'),
                       w -> w IN ('the', 'a', 'of'))) AS en_markers,
       len(list_filter(string_split_regex(lower(text), '\\s+'),
                       w -> w IN ('der', 'die', 'das', 'und'))) AS de_markers,
       CASE WHEN len(list_filter(string_split_regex(lower(text), '\\s+'),
                                 w -> w IN ('der', 'die', 'das', 'und')))
                 > len(list_filter(string_split_regex(lower(text), '\\s+'),
                                   w -> w IN ('the', 'a', 'of')))
            THEN 'de'
            WHEN len(list_filter(string_split_regex(lower(text), '\\s+'),
                                 w -> w IN ('the', 'a', 'of'))) > 0
            THEN 'en' ELSE 'unknown' END AS predicted_lang
FROM documents
""",
    tags=("text", "langid"),
)
def text_language_id(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-marker language ID heuristic (n-gram profile shape). The
    synthetic corpus shares one vocabulary across its ``lang`` labels, so
    this demonstrates the operator rather than real LID accuracy."""
    docs = t(spark, sf, "documents")
    words = F.split(F.lower("text"), r"\s+")

    def markers(*ws: str):
        arr = F.array(*[F.lit(w) for w in ws])
        return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))

    en = markers("the", "a", "of")
    de = markers("der", "die", "das", "und")
    pred = (
        F.when(de > en, F.lit("de"))
        .when(en > 0, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        en.alias("en_markers"),
        de.alias("de_markers"),
        pred.alias("predicted_lang"),
    )


@query(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
           string_split_regex(lower(text), '\\s+'))), ' ')) AS fingerprint,
       md5(lower(trim(text)))                               AS content_hash
FROM documents
""",
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprinting: OpenRefine-style key (sorted distinct
    words → md5) + raw content hash. Grouping by fingerprint is
    word-order-insensitive dedup."""
    docs = t(spark, sf, "documents")
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split(F.lower("text"), r"\s+"))))
    )
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.md5(F.lower(F.trim("text"))).alias("content_hash"),
    )


@query(
    "source_stats",
    oracle="""
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY source, lang
""",
    tags=("text", "agg"),
)
def source_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus composition report (per-source/lang doc+char counts) — the
    bookkeeping aggregate every training-data pipeline runs."""
    docs = t(spark, sf, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )
