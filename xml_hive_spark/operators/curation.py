"""Corpus-curation operators: provenance reporting, language-mix
rebalancing, PII redaction, and content-defined chunking.

These are the governance/preparation steps a pretraining corpus passes
through around the dedup/quality gates: per-source accounting (what am
I training on?), mixture reweighting (DoReMi-style sampling weights to
hit a target language mix), PII scrubbing (regexp surgery, counted and
hash-verified), and content-defined chunk boundaries (the
shift-invariant chunking that makes storage/dedup robust to insertions,
as in LBFS/restic-style CDC).

Scale notes (100 TB): everything here is either a per-row projection
(redaction, chunking — pure codegen or one expression per row) or a
domain-sized aggregate (|sources|, |langs| rows out). No driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xml_hive_spark.operators import query, t

_DUCK_TOKENS = "list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '')"
_SPARK_TOKENS = "filter(split(lower(text), '\\\\s+'), w -> w <> '')"


@query(
    "corpus_provenance_report",
    oracle=f"""
WITH s AS (
  SELECT source, lang, n_chars,
         len({_DUCK_TOKENS}) AS n_words
  FROM documents
),
tot AS (SELECT count(*) AS n FROM documents)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT lang) AS INT) AS n_langs,
       CAST(sum(n_words) AS BIGINT) AS total_words,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(*) AS DOUBLE) / any_value(tot.n) AS corpus_share
FROM s, tot
GROUP BY source
ORDER BY source
""",
    tags=("curation", "provenance", "reporting"),
)
def corpus_provenance_report(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source corpus accounting: document/word/char volume, language
    coverage, and share of corpus — the provenance table every dataset
    card starts from.

    Scale shape: one scan, one hash-agg keyed on source (plus the
    multi-distinct Expand for the language count), |sources| rows out;
    the corpus total is the one driver scalar."""
    docs = t(spark, sf, "documents")
    n_total = docs.count()
    return (
        docs.select(
            "source", "lang", "n_chars",
            F.size(F.expr(_SPARK_TOKENS)).alias("n_words"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct("lang").cast("int").alias("n_langs"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            (F.count(F.lit(1)).cast("double") / F.lit(n_total)).alias(
                "corpus_share"
            ),
        )
        .orderBy("source")
    )


@query(
    "corpus_mix_weights",
    oracle="""
WITH l AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS total,
         CAST(count(DISTINCT lang) AS BIGINT) AS k
  FROM documents
)
SELECT lang, n_docs,
       CAST(n_docs AS DOUBLE) / t.total AS current_share,
       1.0 / t.k AS target_share,
       CAST(t.total AS DOUBLE) / (t.k * n_docs) AS sampling_weight
FROM l, t
ORDER BY lang
""",
    tags=("curation", "mixing", "rebalancing"),
)
def corpus_mix_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Language-mix rebalancing weights: for each language, the sampling
    weight that moves the corpus from its current share to a uniform
    target mix (weight = target/current = total/(k·n)) — the reweighting
    step of mixture-tuning pipelines (DoReMi et al. learn the target;
    the plumbing is this query).

    Every ratio is an exact integer/integer IEEE division — bit-stable
    cross-engine. Scale: one hash-agg to |langs| rows, two driver
    scalars."""
    docs = t(spark, sf, "documents")
    row = docs.agg(
        F.count(F.lit(1)).alias("total"), F.count_distinct("lang").alias("k")
    ).collect()[0]
    total, k = int(row["total"]), int(row["k"])
    return (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select(
            "lang",
            "n_docs",
            (F.col("n_docs").cast("double") / F.lit(total)).alias(
                "current_share"
            ),
            (F.lit(1.0) / F.lit(k)).alias("target_share"),
            (F.lit(float(total)) / (F.lit(k) * F.col("n_docs"))).alias(
                "sampling_weight"
            ),
        )
        .orderBy("lang")
    )


_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.com"
_PHONE_RE = "555-[0-9]{4}"


@query(
    "text_pii_redact",
    oracle=f"""
WITH injected AS (
  SELECT doc_id,
         'contact user' || CAST(doc_id AS VARCHAR)
           || '@example.com or 555-'
           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           || ' ' || text AS body
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(body, '{_EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(body, '{_PHONE_RE}')) AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM injected
ORDER BY doc_id
""",
    tags=("curation", "pii", "redaction"),
)
def text_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """PII detection + redaction: deterministic synthetic PII (an email
    and a phone derived from doc_id) is injected into every document on
    BOTH engines, then counted with regexp extraction and scrubbed with
    regexp_replace; the md5 of the redacted body is value-checked, so
    the oracle proves the two regex engines (Java util.regex vs RE2)
    agree byte-for-byte on these patterns — the portability constraint
    a PII pipeline actually has to verify. DuckDB needs the explicit
    'g' flag (Spark's regexp_replace is global by default).

    Scale: pure per-row projection, whole-stage codegen, no shuffle
    (the ORDER BY is presentation-only)."""
    docs = t(spark, sf, "documents")
    body = F.concat(
        F.lit("contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" "), F.col("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(body, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return (
        docs.select("doc_id", body.alias("body"))
        .select(
            "doc_id",
            F.size(F.regexp_extract_all("body", F.lit(_EMAIL_RE), 0))
            .cast("int")
            .alias("n_emails"),
            F.size(F.regexp_extract_all("body", F.lit(_PHONE_RE), 0))
            .cast("int")
            .alias("n_phones"),
            F.md5(
                F.regexp_replace(
                    F.regexp_replace("body", _EMAIL_RE, "<EMAIL>"),
                    _PHONE_RE,
                    "<PHONE>",
                ).cast("binary")
            ).alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


# boundary decision: first md5 byte of the 8-gram at position i < 4
# (p = 1/64) — engine-portable nibble arithmetic, same spirit as the
# HLL register address in scaleops.py
_DUCK_B = (
    "((strpos('0123456789abcdef', substr(md5(substr(tx, i, 8)), 1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(md5(substr(tx, i, 8)), 2, 1)) - 1)) < 4"
)
_SPARK_B = (
    "CAST(conv(substring(md5(CAST(substring(tx, i, 8) AS BINARY)), 1, 2), 16, 10)"
    " AS INT) < 4"
)


@query(
    "chunk_content_defined",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lower(text) AS tx FROM documents WHERE len(text) >= 8
),
b AS (
  SELECT doc_id, len(tx) AS n,
         list_filter(generate_series(1, len(tx) - 7), i -> {_DUCK_B})
           AS bounds
  FROM d
)
SELECT doc_id,
       CAST(len(bounds) + 1 AS INT) AS n_chunks,
       CAST(coalesce(bounds[1], n) AS INT) AS first_chunk_len,
       CAST(coalesce(bounds[len(bounds)], 0) AS INT) AS last_boundary
FROM b
ORDER BY doc_id
""",
    tags=("curation", "chunking", "cdc"),
)
def chunk_content_defined(spark: SparkSession, sf: str) -> DataFrame:
    """Content-defined chunk boundaries (LBFS/restic-style CDC): a chunk
    boundary falls wherever the hash of the local 8-char window lands in
    the bottom 1/64 of its range — boundaries depend only on CONTENT, so
    an insertion shifts at most one chunk instead of re-chunking the
    whole document (the property fixed-width chunking lacks, and the
    reason dedup-friendly storage uses CDC).

    The boundary hash is the first md5 byte, computed with the same
    engine-portable nibble arithmetic as the HLL sketch. Scale note: the
    per-position md5 inside a HOF lambda is expression-interpreted —
    fine for the oracle corpus; the production path would fuse a
    polynomial rolling hash into the Arrow scan (the flat.py gearbox
    pattern), keeping the same boundary rule. Per-row projection, no
    shuffle."""
    d = (
        t(spark, sf, "documents")
        .where(F.length("text") >= 8)
        .select("doc_id", F.lower(F.col("text")).alias("tx"))
    )
    bounds = F.expr(
        f"filter(sequence(1, length(tx) - 7), i -> {_SPARK_B})"
    )
    return (
        d.select("doc_id", F.length("tx").alias("n"), bounds.alias("bounds"))
        .select(
            "doc_id",
            (F.size("bounds") + 1).cast("int").alias("n_chunks"),
            F.coalesce(F.try_element_at("bounds", F.lit(1)), F.col("n"))
            .cast("int")
            .alias("first_chunk_len"),
            F.coalesce(F.try_element_at("bounds", F.lit(-1)), F.lit(0))
            .cast("int")
            .alias("last_boundary"),
        )
        .orderBy("doc_id")
    )
