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


_BM25_TERMS = ("hash", "join", "spark")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "text_bm25_topk",
    oracle="""
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       unnest(string_split_regex(lower(text), '\\s+')) AS t(term)
  WHERE t.term <> ''
), dl AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id
), corpus AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl,
         CAST(count(*) AS DOUBLE) AS n_docs
  FROM dl
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM toks WHERE term IN ('hash', 'join', 'spark')
  GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         SUM(ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
             * (tf.tf * 2.2
                / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / corpus.avgdl))))
         ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN corpus
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 4) AS bm25,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
FROM scored
ORDER BY rank
LIMIT 10
""",
    tags=("text", "search", "bm25"),
)
def text_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 ranking of the corpus against a fixed query (terms
    'hash join spark'; k1=1.2, b=0.75, Lucene's ln(1 + (N-df+0.5)/
    (df+0.5)) idf) — the retrieval primitive of a training-data search
    stack, expressed as pure DataFrame ops: one explode + two
    hash-aggs build tf/dl, the per-term df and corpus stats are tiny
    aggregates broadcast back, and the final score is a JVM-side
    expression — no UDF anywhere. The arithmetic is written with
    IDENTICAL association in Spark and the DuckDB oracle so the driver
    hash gate value-checks it (score rounded to 4 to absorb libm ulp
    noise in ln).

    Scale shape: tf/dl shuffles are corpus-token-bound (one pass);
    df/avgdl move <=|query| rows to a broadcast; top-10 is a global
    TakeOrdered. At 100 TB the token explode is the dominant cost and
    it is embarrassingly parallel."""
    from pyspark.sql.window import Window

    docs = t(spark, sf, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dl")
    )
    corpus = F.broadcast(
        dl.agg(
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
            F.count(F.lit(1)).cast("double").alias("n_docs"),
        )
    )
    tf = (
        toks.filter(F.col("term").isin(list(_BM25_TERMS)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_ = F.broadcast(
        tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(_BM25_K1) * (
        F.lit(0.25) + F.lit(_BM25_B) * (F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(corpus)
        .groupBy("doc_id")
        .agg(
            F.sum(idf * (F.col("tf") * F.lit(_BM25_K1 + 1.0) / denom))
            .alias("score")
        )
    )
    # top-10 FIRST via orderBy+limit — planned as TakeOrderedAndProject
    # (per-partition partial top-k, no single-reducer Exchange of every
    # matching doc); the rank window then runs over only the 10 survivors
    # (pinned in test_plans.py next to the ntile pin)
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(10)
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("doc_id", F.round("score", 4).alias("bm25"), "rank")
        .orderBy("rank")
    )


def _cm_bucket(col, seed: str):
    """Count-min hash: the low byte of md5(token || seed) — 2 hex chars
    → [0, 256). Engine-portable (md5 is identical everywhere; the DuckDB
    twin decodes the same two hex chars with strpos arithmetic)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(col, F.lit("#" + seed)).cast("binary")), 1, 2
        ),
        16,
        10,
    ).cast("int")


@query(
    "sketch_count_min",
    oracle="""
WITH toks AS (
  SELECT t.word AS token FROM (
    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
    FROM documents
  ) t WHERE t.word <> ''
),
cells AS (
  SELECT r, c, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT 0 AS r, (strpos('0123456789abcdef', substr(md5(token || '#0'), 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5(token || '#0'), 2, 1)) - 1) AS c FROM toks
    UNION ALL
    SELECT 1 AS r, (strpos('0123456789abcdef', substr(md5(token || '#1'), 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5(token || '#1'), 2, 1)) - 1) AS c FROM toks
    UNION ALL
    SELECT 2 AS r, (strpos('0123456789abcdef', substr(md5(token || '#2'), 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5(token || '#2'), 2, 1)) - 1) AS c FROM toks
  ) GROUP BY r, c
),
exact AS (
  SELECT token, CAST(count(*) AS BIGINT) AS exact_n
  FROM toks GROUP BY token ORDER BY exact_n DESC, token LIMIT 20
),
probes AS (
  SELECT token, exact_n, 0 AS r, (strpos('0123456789abcdef', substr(md5(token || '#0'), 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5(token || '#0'), 2, 1)) - 1) AS c FROM exact
  UNION ALL
  SELECT token, exact_n, 1 AS r, (strpos('0123456789abcdef', substr(md5(token || '#1'), 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5(token || '#1'), 2, 1)) - 1) AS c FROM exact
  UNION ALL
  SELECT token, exact_n, 2 AS r, (strpos('0123456789abcdef', substr(md5(token || '#2'), 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5(token || '#2'), 2, 1)) - 1) AS c FROM exact
)
SELECT p.token, p.exact_n, MIN(cells.n) AS cm_est
FROM probes p JOIN cells USING (r, c)
GROUP BY p.token, p.exact_n
""",
    tags=("text", "sketch", "agg"),
)
def sketch_count_min(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min sketch frequency estimation with a FULL cross-engine
    oracle: build a d=3 × w=256 sketch over the whitespace-token stream,
    then estimate the counts of the 20 most frequent tokens (reported
    next to their exact counts; ``cm_est >= exact_n`` always, equality
    when no collision — both invariants pinned in tests/test_text_extra
    assertions and by the value oracle itself, since DuckDB recomputes
    the identical sketch from the identical md5 hashes).

    Scale shape — the reason sketches exist: the sketch is a MERGEABLE
    summary. Each task's partial ``(r, c) → count`` cells are combined
    by the same hash-agg as any sum (one shuffle of ≤ d×w rows per
    task, independent of corpus size or vocabulary), where an exact
    per-token count shuffles one row per distinct token. d×w = 768
    cells bound the memory forever; estimation is a broadcast-sized
    join against the cells. Probing the exact top-20 here keeps the
    demo honest (the estimate is checked against truth); a production
    pipeline probes whatever token set it cares about without ever
    materializing exact counts."""
    docs = t(spark, sf, "documents")
    toks = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
        )
        .filter(F.col("token") != "")
    )
    tok = F.col("token")
    cells = None
    for i in range(3):
        part = toks.select(
            F.lit(i).alias("r"), _cm_bucket(tok, str(i)).alias("c")
        )
        cells = part if cells is None else cells.unionAll(part)
    cells = cells.groupBy("r", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("token").asc())
        .limit(20)
    )
    probes = None
    for i in range(3):
        part = exact.select(
            "token", "exact_n", F.lit(i).alias("r"),
            _cm_bucket(tok, str(i)).alias("c"),
        )
        probes = part if probes is None else probes.unionAll(part)
    return (
        probes.join(cells, ["r", "c"])
        .groupBy("token", "exact_n")
        .agg(F.min("n").alias("cm_est"))
    )


@query(
    "text_repetition_score",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents
), idx AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i FROM words
), big AS (
  SELECT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS bg
  FROM idx
), bgc AS (
  SELECT doc_id, MAX(c) AS max_bg FROM (
    SELECT doc_id, bg, count(*) AS c FROM big GROUP BY doc_id, bg
  ) GROUP BY doc_id
), wstats AS (
  SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct
  FROM words
)
SELECT s.doc_id,
       CAST(s.n_words AS BIGINT) AS n_words,
       round(1.0 - CAST(s.n_distinct AS DOUBLE) / s.n_words, 4) AS dup_word_ratio,
       round(CAST(b.max_bg AS DOUBLE) / (s.n_words - 1), 4) AS top_bigram_ratio,
       (round(CAST(b.max_bg AS DOUBLE) / (s.n_words - 1), 4) > 0.08
        OR round(1.0 - CAST(s.n_distinct AS DOUBLE) / s.n_words, 4) > 0.65)
           AS repetitive
FROM wstats s JOIN bgc b USING (doc_id)
""",
    tags=("text", "quality", "repetition"),
)
def text_repetition_score(spark: SparkSession, sf: str) -> DataFrame:
    """Repetition-based quality gate (the Gopher/MassiveText rule family,
    Rae et al. 2021 §A1.1): fraction of duplicate word occurrences and
    the fraction of all bigrams taken by the single most frequent
    bigram. Boilerplate, keyword-stuffed, and looping generated text
    score high on both; the flag thresholds (0.08 / 0.65) are applied
    to the ROUNDED ratios in both engines so the boundary comparison is
    bit-identical cross-engine.

    Scale shape: everything before the final per-doc aggregate is a
    per-row array expression (JVM codegen, zero shuffle); the bigram
    histogram is an explode → two-level hash-agg keyed on (doc_id,
    bigram) — map-side partial combine absorbs the intra-doc repeats,
    so the shuffle carries at most the distinct-bigram count per doc.
    No driver state, no window over the corpus; at 100 TB this is one
    shuffle of bounded per-doc summaries. The reference has no text
    analytics (delegates everything to Hive; SURVEY.md §2.B) — this is
    part of the LLM-pipeline extension family."""
    docs = t(spark, sf, "documents")
    w = F.split(F.lower("text"), r"\s+")
    base = docs.select("doc_id", w.alias("w")).filter(F.size("w") >= 2)
    stats = base.select(
        "doc_id",
        F.size("w").cast("long").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
    )
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(w, 1, size(w) - 1),"
                " (x, i) -> concat(x, ' ', element_at(w, i + 2)))"
            )
        ).alias("bg"),
    )
    max_bg = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_bg"))
    )
    dup_ratio = F.round(
        F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_words"), 4
    )
    top_bg = F.round(
        F.col("max_bg").cast("double") / (F.col("n_words") - 1), 4
    )
    return stats.join(max_bg, "doc_id").select(
        "doc_id",
        "n_words",
        dup_ratio.alias("dup_word_ratio"),
        top_bg.alias("top_bigram_ratio"),
        ((top_bg > 0.08) | (dup_ratio > 0.65)).alias("repetitive"),
    )


@query(
    "phrase_search_positional",
    oracle="""
WITH w AS (
  SELECT doc_id, t.i AS pos,
         list_extract(string_split(text, ' '), t.i + 1) AS word
  FROM documents CROSS JOIN range(0, 300) t(i)
  WHERE t.i < len(string_split(text, ' '))
)
SELECT a.doc_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(MIN(a.pos) AS BIGINT) AS first_pos
FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.word = 'table' AND b.word = 'table'
GROUP BY a.doc_id
""",
    tags=("text", "search", "inverted-index", "phrase"),
)
def phrase_search_positional(spark: SparkSession, sf: str) -> DataFrame:
    """Exact PHRASE search ("table table") via a positional inverted
    index — the capability BM25 ranking (``text_bm25_topk``) does not
    give: postings are (term, doc, position) rows, and a phrase match
    is the positional intersection posting(w1).pos + 1 =
    posting(w2).pos within one document — the classic inverted-index
    phrase algorithm, run as ONE equi-join on (doc, adjacent-position)
    after per-term posting selection.

    Scale shape: the term filters cut the postings to the phrase's
    terms BEFORE the join (predicate pushdown into the exploded
    postings — the inverted-index property: only matching terms'
    postings move); the join is keyed on doc_id so it co-partitions
    with the corpus. No window, no cartesian; output is one row per
    matching document."""
    docs = t(spark, sf, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    )
    a = words.filter(F.col("word") == "table").select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    b = words.filter(F.col("word") == "table").select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b")
    )
    return (
        a.join(
            b,
            (a.doc_id == b.doc_b) & (b.pos_b == a.pos_a + 1),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.min("pos_a").cast("long").alias("first_pos"),
        )
    )
