"""Planted-document semantics for the repetition quality gate and the
eval-set decontamination scorer (both also carry full DuckDB oracles;
these tests pin hand-computed values the oracle comparison can't —
exact ratios on documents constructed to hit the formula's branches)."""

from __future__ import annotations

import pytest

from xml_hive_spark.operators.dedup import decontaminate_eval_ngrams
from xml_hive_spark.operators.text import text_repetition_score


@pytest.fixture(scope="module")
def planted_sf(spark, tmp_path_factory):
    """A tmp dir shaped like the driver testdata (documents.parquet)
    holding documents with hand-computable repetition/overlap values.
    doc_id 0 and 50 are the eval split (doc_id % 50 == 0)."""
    base = " ".join(f"w{i}" for i in range(20))  # 20 distinct words
    rows = [
        # eval doc (id 0): 20 distinct words
        (0, base, "en", "synthetic", len(base)),
        # exact copy of the eval doc -> contamination 1.0
        (1, base, "en", "synthetic", len(base)),
        # repetitive: "a b" * 4 -> dup 0.75, top bigram 4/7
        (2, "a b a b a b a b", "en", "synthetic", 15),
        # clean + unrelated: 20 distinct words, no 8-gram overlap
        (3, " ".join(f"x{i}" for i in range(20)), "en", "synthetic", 0),
        # second eval doc, unrelated to everything
        (50, " ".join(f"y{i}" for i in range(20)), "en", "synthetic", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = tmp_path_factory.mktemp("planted_sf")
    df.coalesce(1).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    return str(out)


def test_repetition_planted_values(spark, planted_sf):
    got = {
        r["doc_id"]: r
        for r in text_repetition_score(spark, planted_sf).collect()
    }
    rep = got[2]
    assert rep["n_words"] == 8
    assert rep["dup_word_ratio"] == pytest.approx(0.75)
    assert rep["top_bigram_ratio"] == pytest.approx(round(4 / 7, 4))
    assert rep["repetitive"] is True
    clean = got[3]
    assert clean["dup_word_ratio"] == 0.0
    # 19 distinct bigrams, max count 1 -> 1/19 < 0.08
    assert clean["top_bigram_ratio"] == pytest.approx(round(1 / 19, 4))
    assert clean["repetitive"] is False


def test_decontamination_planted_overlap(spark, planted_sf):
    got = {
        r["doc_id"]: r
        for r in decontaminate_eval_ngrams(spark, planted_sf).collect()
    }
    # eval docs (0, 50) are not scored
    assert set(got) == {1, 2, 3}
    copy = got[1]
    assert copy["n_grams"] == 13  # 20 words -> 13 distinct 8-grams
    assert copy["n_shared"] == 13
    assert copy["contamination"] == pytest.approx(1.0)
    assert copy["contaminated"] is True
    for clean_id in (2, 3):
        assert got[clean_id]["n_shared"] == 0
        assert got[clean_id]["contaminated"] is False
        assert got[clean_id]["contamination"] == 0.0


def test_split_covers_corpus_and_no_clique_straddles(spark, sf_dir):
    """The three splits must partition the corpus exactly, and no
    duplicate clique (lang, n_chars DIV 50) may straddle splits — the
    invariant the operator exists for. Re-derives the per-doc
    assignment from the same deterministic hash contract."""
    from pyspark.sql import Window, functions as F

    from xml_hive_spark.operators import t
    from xml_hive_spark.operators.dedup import split_leakage_safe

    agg = {r["split"]: r for r in split_leakage_safe(spark, sf_dir).collect()}
    docs = t(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in agg.values()) == n_docs
    n_cliques = (
        docs.select("lang", (F.col("n_chars") / 50).cast("bigint"))
        .distinct()
        .count()
    )
    assert sum(r["n_clusters"] for r in agg.values()) == n_cliques
    # per-doc re-derivation: each clique maps to exactly one split
    wc = Window.partitionBy("lang", (F.col("n_chars") / 50).cast("bigint"))
    u48 = F.conv(
        F.substring(
            F.md5(
                F.min("doc_id").over(wc).cast("string").cast("binary")
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    split = (
        F.when(u48 * 10 < F.lit(2251799813685248), "train")
        .when(u48 * 10 < F.lit(2533274790395904), "val")
        .otherwise("test")
    )
    per_clique = (
        docs.select(
            "lang",
            (F.col("n_chars") / 50).cast("bigint").alias("bucket"),
            split.alias("split"),
        )
        .groupBy("lang", "bucket")
        .agg(F.countDistinct("split").alias("k"))
    )
    assert per_clique.filter(F.col("k") > 1).count() == 0
