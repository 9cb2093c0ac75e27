"""Text-preparation operators for LLM training-data pipelines
(BASELINE.md north_star) over the ``documents`` table: cleaning /
normalization, corpus vocabulary building, and token-budget sequence
packing. Complements ``text.py`` (per-document stats) with the
corpus-level transforms a pretraining pipeline runs before
tokenization.

All three are pure built-in-function plans (JVM-side, codegen'd):

- cleaning is a per-row columnar pass, zero shuffles;
- vocabulary is explode → hash-agg (partial+final, so the shuffle
  carries (word, partial_count) pairs — vocabulary-sized, not
  corpus-sized) → TakeOrdered top-k;
- packing is one window shuffle on the language key: each document is
  assigned to a training sequence by its running token count, the
  streaming-friendly FIFO formulation (greedy first-fit packing is
  inherently sequential; the running-sum form is the one that
  parallelizes — one pass, no driver loop — and is what large-scale
  pipelines actually ship).

Cross-engine determinism: token counts are integers, so every
aggregate here is exact; tie-breaks in the vocabulary top-k are pinned
by (count DESC, word ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xml_hive_spark.operators import query, t

# one training sequence holds this many whitespace tokens
_PACK_BUDGET = 512

# document chunking: words per training chunk
_CHUNK_WORDS = 20


@query(
    "text_clean_normalize",
    oracle=r"""
SELECT doc_id,
       substring(clean, 1, 48)                       AS prefix,
       CAST(length(clean) AS BIGINT)                 AS clean_chars,
       CAST(len(string_split(clean, ' ')) AS BIGINT) AS n_words
FROM (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '<[^>]*>', ' ', 'g'),
                             '\s+', ' ', 'g')) AS clean
  FROM documents
) ORDER BY doc_id
""",
    tags=("text", "llm-prep"),
)
def text_clean_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Markup strip + whitespace collapse + case fold — the first stage
    of every pretraining text pipeline. Spark ``regexp_replace`` is
    global by default; DuckDB needs the explicit ``'g'`` flag."""
    docs = t(spark, sf, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "<[^>]*>", " "),
            r"\s+",
            " ",
        )
    )
    return (
        docs.select(
            "doc_id",
            F.substring(clean, 1, 48).alias("prefix"),
            F.length(clean).cast("bigint").alias("clean_chars"),
            F.size(F.split(clean, " ")).cast("bigint").alias("n_words"),
        )
        .orderBy("doc_id")
    )


@query(
    "vocab_topk",
    oracle=r"""
SELECT word, CAST(count(*) AS BIGINT) AS freq
FROM (
  SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
  FROM documents
) WHERE word <> ''
GROUP BY word
ORDER BY freq DESC, word ASC
LIMIT 50
""",
    tags=("text", "llm-prep", "agg"),
)
def vocab_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus vocabulary: whitespace-token frequencies, top 50.

    Scale shape: explode feeds a partial+final hash-agg, so the shuffle
    moves one (word, count) pair per distinct word per task — bounded
    by vocabulary size, not corpus size; the top-k is
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    docs = t(spark, sf, "documents")
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(50)
    )


@query(
    "pack_sequences",
    oracle=f"""
SELECT lang,
       CAST(floor((cum_tokens - n_tok) / {_PACK_BUDGET}.0) AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT)    AS n_docs,
       CAST(sum(n_tok) AS BIGINT)  AS seq_tokens
FROM (
  SELECT lang, n_tok,
         sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM (
    SELECT doc_id, lang,
           CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok
    FROM documents
  )
)
GROUP BY lang, seq_id
ORDER BY lang, seq_id
""",
    tags=("text", "llm-prep", "window"),
)
def pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget sequence packing: assign documents (in doc_id order
    within each language) to training sequences of ~{budget} whitespace
    tokens by their exclusive running token count — the parallel FIFO
    formulation of greedy packing (one window shuffle on ``lang``; a
    first-fit bin packer is a sequential driver loop and cannot scale).
    A document lands in the sequence its preceding cumulative count
    falls in, so sequences can overflow by at most one document — the
    standard streaming-packing tradeoff."""
    docs = t(spark, sf, "documents")
    n_tok = F.size(F.split(F.col("text"), r"\s+")).cast("bigint")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = docs.select("doc_id", "lang", n_tok.alias("n_tok")).withColumn(
        "cum_tokens", F.sum("n_tok").over(w)
    )
    return (
        staged.withColumn(
            "seq_id",
            F.floor(
                (F.col("cum_tokens") - F.col("n_tok")) / float(_PACK_BUDGET)
            ).cast("bigint"),
        )
        .groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("seq_tokens"),
        )
        .orderBy("lang", "seq_id")
    )


@query(
    "doc_chunks_udtf",
    oracle=f"""
SELECT doc_id,
       CAST(c.chunk_idx AS INTEGER) AS chunk_idx,
       array_to_string(words[(c.chunk_idx*{_CHUNK_WORDS}+1):(c.chunk_idx*{_CHUNK_WORDS}+{_CHUNK_WORDS})], ' ')
           AS chunk_text,
       CAST(least({_CHUNK_WORDS}, len(words) - c.chunk_idx*{_CHUNK_WORDS}) AS INTEGER)
           AS n_words
FROM (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS words
  FROM documents
), LATERAL (
  SELECT unnest(generate_series(0,
      CAST(ceil(len(words) / {_CHUNK_WORDS}.0) AS BIGINT) - 1)) AS chunk_idx
) c
ORDER BY doc_id, chunk_idx
""",
    tags=("text", "llm-prep", "udtf"),
)
def doc_chunks_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """Document chunking as a native Python UDTF (Spark 4 ``@udtf``,
    Arrow-optimized): each document expands to fixed-size word chunks —
    the tokenize-and-chunk stage ahead of sequence packing, and the
    genuine table-function surface (Hive UDTF ≙ LATERAL table function;
    ``apply_in_pandas_centered`` covers the grouped-map cousin).

    Scale shape: the UDTF is a per-row expansion — no shuffle, no
    state; Arrow moves whole batches across the Python boundary. Python
    ``str.split()`` (drops empty tokens) is mirrored in the oracle by
    ``list_filter(string_split_regex(...), w -> w <> '')``."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "doc_id bigint, chunk_idx int, chunk_text string, n_words int"
    ), useArrow=True)
    class ChunkDoc:
        def eval(self, doc_id, text):
            words = (text or "").split()
            for i in range(0, len(words), _CHUNK_WORDS):
                piece = words[i : i + _CHUNK_WORDS]
                yield doc_id, i // _CHUNK_WORDS, " ".join(piece), len(piece)

    spark.udtf.register("chunk_doc", ChunkDoc)
    t(spark, sf, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk_text, c.n_words
        FROM documents d, LATERAL chunk_doc(d.doc_id, d.text) c
        ORDER BY doc_id, chunk_idx
        """
    )


@query(
    "doc_chunk_pack_pipeline",
    oracle=f"""
WITH cleaned AS (
  SELECT doc_id, lang,
         trim(regexp_replace(regexp_replace(lower(text), '<[^>]*>', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS clean
  FROM documents
),
chunks AS (
  SELECT doc_id, lang,
         CAST(least({_CHUNK_WORDS}, len(words) - c.chunk_idx*{_CHUNK_WORDS}) AS BIGINT)
             AS n_words,
         c.chunk_idx
  FROM (
    SELECT doc_id, lang,
           list_filter(string_split(clean, ' '), w -> w <> '') AS words
    FROM cleaned
  ), LATERAL (
    SELECT unnest(generate_series(0,
        CAST(ceil(len(words) / {_CHUNK_WORDS}.0) AS BIGINT) - 1)) AS chunk_idx
  ) c
),
packed AS (
  SELECT lang, n_words,
         sum(n_words) OVER (PARTITION BY lang ORDER BY doc_id, chunk_idx
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM chunks
)
SELECT lang,
       CAST(floor((cum - n_words) / {_PACK_BUDGET}.0) AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT)   AS n_chunks,
       CAST(sum(n_words) AS BIGINT) AS seq_tokens
FROM packed GROUP BY lang, seq_id ORDER BY lang, seq_id
""",
    tags=("text", "llm-prep", "pipeline"),
)
def doc_chunk_pack_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The integrated pretraining-prep pipeline: clean/normalize →
    UDTF chunking → token-budget sequence packing, one plan end to end
    (each stage is the corresponding standalone operator's transform).

    Scale shape: cleaning is columnar (zero shuffles), chunking is a
    per-row Arrow UDTF expansion (zero shuffles), packing is the single
    window shuffle on ``lang`` — the whole pipeline moves the corpus
    over the network exactly once. Fully SQL-oracled: chunk counts and
    running sums are closed-form over the cleaned word lists."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, lang string, chunk_idx int, n_words int",
          useArrow=True)
    class ChunkClean:
        def eval(self, doc_id, lang, clean):
            words = (clean or "").split()
            for i in range(0, len(words), _CHUNK_WORDS):
                yield doc_id, lang, i // _CHUNK_WORDS, len(words[i : i + _CHUNK_WORDS])

    spark.udtf.register("chunk_clean", ChunkClean)
    docs = t(spark, sf, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "<[^>]*>", " "), r"\s+", " "
        )
    )
    docs.select("doc_id", "lang", clean.alias("clean")).createOrReplaceTempView(
        "cleaned_docs"
    )
    chunks = spark.sql(
        """
        SELECT c.doc_id, c.lang, c.chunk_idx, c.n_words
        FROM cleaned_docs d, LATERAL chunk_clean(d.doc_id, d.lang, d.clean) c
        """
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = chunks.withColumn("cum", F.sum("n_words").over(w))
    return (
        packed.withColumn(
            "seq_id",
            F.floor((F.col("cum") - F.col("n_words")) / float(_PACK_BUDGET)).cast(
                "bigint"
            ),
        )
        .groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("n_words").cast("bigint").alias("seq_tokens"),
        )
        .orderBy("lang", "seq_id")
    )


@query(
    "quality_filter_verdicts",
    oracle=r"""
SELECT lang, verdict, CAST(count(*) AS BIGINT) AS n_docs
FROM (
  SELECT lang,
         CASE
           WHEN n_words < 10 THEN 'too_short'
           WHEN n_words > 400 THEN 'too_long'
           WHEN alpha_ratio < 0.6 THEN 'low_alpha'
           WHEN dup_word_ratio > 0.5 THEN 'repetitive'
           ELSE 'keep'
         END AS verdict
  FROM (
    SELECT lang,
           len(string_split_regex(text, '\s+')) AS n_words,
           CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
               / length(text) AS alpha_ratio,
           1.0 - CAST(len(list_distinct(string_split_regex(lower(text), '\s+')))
                      AS DOUBLE) / len(string_split_regex(text, '\s+'))
               AS dup_word_ratio
    FROM documents
  )
)
GROUP BY lang, verdict
ORDER BY lang, verdict
""",
    tags=("text", "llm-prep", "filter"),
)
def quality_filter_verdicts(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus quality filtering with reject reasons — the triage stage
    of a pretraining pipeline (Gopher/C4-style rules): length bounds,
    alphabetic ratio, and repeated-word ratio, each doc labeled with
    the FIRST failing rule (rule order is part of the contract).
    Per-row columnar pass + one aggregate; every rule is a built-in
    string/array function, fully SQL-oracled."""
    docs = t(spark, sf, "documents")
    n_words = F.size(F.split(F.col("text"), r"\s+"))
    alpha_ratio = (
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")).cast("double")
        / F.length(F.col("text"))
    )
    dup_word_ratio = 1.0 - (
        F.size(F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))).cast(
            "double"
        )
        / n_words
    )
    verdict = (
        F.when(n_words < 10, "too_short")
        .when(n_words > 400, "too_long")
        .when(alpha_ratio < 0.6, "low_alpha")
        .when(dup_word_ratio > 0.5, "repetitive")
        .otherwise("keep")
    )
    return (
        docs.select("lang", verdict.alias("verdict"))
        .groupBy("lang", "verdict")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "verdict")
    )
