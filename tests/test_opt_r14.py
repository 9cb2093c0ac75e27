"""Round-14 optimization pins: each test freezes an equivalence or plan
property a specific r14 change relies on, so a regression that re-breaks
the optimization fails loudly rather than silently losing the win."""
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.test_opt_r13 import plan_of
from xml_hive_spark.operators import t


def test_curation_dedup_is_hash_aggregate_no_sorts(spark, sf_dir):
    """r14 change 1: the packed-decimal dedup encoding keeps every
    aggregation buffer UnsafeRow-mutable, so the whole pipeline plans
    with ZERO SortAggregate nodes (the r13 struct-min buffer forced a
    map-side AND reduce-side sort around the dedup exchange)."""
    plan = plan_of(spark, sf_dir, "corpus_curation_pipeline")
    assert "SortAggregate" not in plan, plan
    assert "Window" not in plan, plan


def test_curation_packed_min_is_rep_row(spark, sf_dir):
    """r14 change 1: dedup_min_id_reps (two packed DECIMAL(38,0) mins,
    doc_id-major ordering) must pick exactly the min-doc_id row's
    (lang, n_chars) — value-for-value equal to the window dedup on the
    real corpus, including the unhex(md5) group-key narrowing."""
    from xml_hive_spark.operators.curation import dedup_min_id_reps

    docs = t(spark, sf_dir, "documents")
    wdd = Window.partitionBy(F.md5(F.col("text").cast("binary")))
    old = (
        docs.select(
            "doc_id", "lang", "n_chars",
            F.min("doc_id").over(wdd).alias("rep"),
        )
        .filter(F.col("doc_id") == F.col("rep"))
        .select("doc_id", "lang", "n_chars")
    )
    new = dedup_min_id_reps(docs)
    assert sorted(map(tuple, old.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_curation_packed_encoding_domain_guards_raise(spark, sf_dir):
    """The packed encoding fails LOUDLY outside its domain (n_chars
    beyond the 10^12 slot; lang whose bytes don't round-trip through
    the no-leading-zero hex path) instead of silently mis-decoding."""
    import pytest
    from xml_hive_spark.operators.curation import dedup_min_id_reps

    bad_chars = spark.createDataFrame(
        [(1, "x", "en", 10**12)], "doc_id long, text string, lang string, n_chars long"
    )
    with pytest.raises(Exception, match="DOMAIN ERROR"):
        dedup_min_id_reps(bad_chars).collect()
    bad_lang = spark.createDataFrame(
        [(1, "x", "\x01x", 5)], "doc_id long, text string, lang string, n_chars long"
    )
    with pytest.raises(Exception, match="DOMAIN ERROR"):
        dedup_min_id_reps(bad_lang).collect()
    # multi-byte UTF-8 and 7-byte codes are INSIDE the domain
    ok = spark.createDataFrame(
        [(1, "x", "zh-日", 5), (2, "y", "pt-BR56", 7)],
        "doc_id long, text string, lang string, n_chars long",
    )
    got = {(r.doc_id, r.lang, r.n_chars) for r in dedup_min_id_reps(ok).collect()}
    assert got == {(1, "zh-日", 5), (2, "pt-BR56", 7)}
