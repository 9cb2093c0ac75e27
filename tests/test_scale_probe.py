"""Corpus-builder invariants for tools/scale_probe.py (r11).

The scale-exponent probe's evidence is only as good as its corpus
construction: the factor-F corpus must scale the WORKLOAD (keys
coordinated, densities preserved) without degenerate duplication.
DuckDB-only — no Spark session — so this runs in seconds.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scale_probe import ALPHA, _perm, build_corpus  # noqa: E402

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scale") / "x3")
    build_corpus(SRC, dst, 3)
    return dst


def test_perm_family_injective_and_collision_free():
    perms = {_perm(i) for i in range(200)}
    assert len(perms) == 200  # a rotation family would collide at 26
    assert all(sorted(p) == sorted(ALPHA) for p in perms)
    assert _perm(0) == ALPHA  # copy 0 is the identity


def test_key_coordination_no_orphans(corpus):
    con = duckdb.connect()
    for fact, dim, fk, pk in [
        ("orders", "customer", "o_custkey", "c_custkey"),
        ("lineitem", "orders", "l_orderkey", "o_orderkey"),
        ("lineitem", "part", "l_partkey", "p_partkey"),
        ("lineitem", "supplier", "l_suppkey", "s_suppkey"),
    ]:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{corpus}/{fact}.parquet') f"
            f" LEFT JOIN read_parquet('{corpus}/{dim}.parquet') d"
            f" ON f.{fk} = d.{pk} WHERE d.{pk} IS NULL"
        ).fetchone()[0]
        assert n == 0, f"orphan {fact}.{fk}"


def test_copy0_identity_and_cross_copy_disjoint(corpus):
    con = duckdb.connect()
    # copy 0 is byte-identical to the source
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{corpus}/documents.parquet') a"
        f" JOIN read_parquet('{SRC}/documents.parquet') b USING (doc_id)"
        f" WHERE a.text <> b.text"
    ).fetchone()[0]
    assert n == 0
    # no text is shared across copies (would multiply duplicate density)
    stride = con.execute(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    shared = con.execute(
        f"SELECT count(*) FROM ("
        f"  SELECT text, count(DISTINCT doc_id // {stride}) AS nc"
        f"  FROM read_parquet('{corpus}/documents.parquet')"
        f"  GROUP BY text HAVING nc > 1)"
    ).fetchone()[0]
    assert shared == 0
    # n_chars stays consistent with the relabeled text
    bad = con.execute(
        f"SELECT count(*) FROM read_parquet('{corpus}/documents.parquet')"
        f" WHERE n_chars <> length(text)"
    ).fetchone()[0]
    assert bad == 0


def test_dperm_family_injective_and_collision_free():
    from tools.scale_probe import DIGITS, _dperm

    perms = {_dperm(i) for i in range(200)}
    assert len(perms) == 200  # 10! family, md5-keyed: no collision in range
    assert all(sorted(p) == sorted(DIGITS) for p in perms)
    assert _dperm(0) == DIGITS  # copy 0 is the identity


def test_cross_copy_shingles_disjoint(corpus):
    """The r12 cipher re-baseline (VERDICT r11 item 2): with the digit
    permutation composed in, char-8 shingle sets must be copy-local.
    Through r11 the letter-only cipher left 97% of distinct shingles
    shared across copies on the digit-dominated synthetic text; the
    residue now is coincidental cipher-collision only (a shingle g is
    shared iff the SOURCE happens to contain both preimages), measured
    at 1/31,661 on this corpus — bar set at 0.5%."""
    con = duckdb.connect()
    stride = con.execute(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    from collections import defaultdict

    copies: dict[str, set[int]] = defaultdict(set)
    for did, text in con.execute(
        f"SELECT doc_id, text FROM read_parquet('{corpus}/documents.parquet')"
    ).fetchall():
        cp = did // stride
        for k in range(len(text) - 7):
            copies[text[k : k + 8]].add(cp)
    shared = sum(1 for cps in copies.values() if len(cps) > 1)
    assert shared / len(copies) < 0.005, f"{shared}/{len(copies)} shared"


def test_composed_build_has_no_twinned_copies(tmp_path):
    """Two-level builds (sf1 → sf10) must not replant duplicates: with
    a shared key namespace, copy (i, 0) of level 2 and copy (0, i) of
    level 1 compose to the IDENTICAL transform (p_0 is the identity),
    twinning 2·(factor−1) copies — measured 18 % duplicate docs at the
    r12 sf10 corpus before the seed fix. The seeded composition keeps
    every text unique (up to the source's own duplicates) and the
    identity copy 0 intact."""
    lvl1 = str(tmp_path / "x3")
    lvl2 = str(tmp_path / "x3x3")
    build_corpus(SRC, lvl1, 3, seed=0)
    build_corpus(lvl1, lvl2, 3, seed=3)  # = lvl1's next_seed
    con = duckdb.connect()
    src_dups = con.execute(
        f"SELECT count(*) FROM (SELECT text FROM"
        f" read_parquet('{SRC}/documents.parquet')"
        f" GROUP BY text HAVING count(*) > 1)"
    ).fetchone()[0]
    dup_texts = con.execute(
        f"SELECT count(*) FROM (SELECT text FROM"
        f" read_parquet('{lvl2}/documents.parquet')"
        f" GROUP BY text HAVING count(*) > 1)"
    ).fetchone()[0]
    # each source dup-text recurs once per composed copy (9), nothing else
    assert dup_texts == src_dups * 9, (dup_texts, src_dups)
    # copy 0 of copy 0 is still byte-identical to the source
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{lvl2}/documents.parquet') a"
        f" JOIN read_parquet('{SRC}/documents.parquet') b USING (doc_id)"
        f" WHERE a.text <> b.text"
    ).fetchone()[0]
    assert n == 0
    # and the embedding twin check: no vector outside copy 0 equals its
    # source (the (i,0)/(0,i) coincidence made them bit-equal)
    stride = con.execute(
        f"SELECT max(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    eq = con.execute(
        f"SELECT count(*) FROM read_parquet('{lvl2}/embeddings.parquet') a"
        f" JOIN read_parquet('{SRC}/embeddings.parquet') b"
        f" ON a.vec_id % {stride} = b.vec_id AND a.vec_id >= {stride}"
        f" WHERE a.embedding = b.embedding"
    ).fetchone()[0]
    assert eq == 0


def test_embedding_transform_is_orthogonal(corpus):
    con = duckdb.connect()
    stride = con.execute(
        f"SELECT max(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    src = dict(con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{SRC}/embeddings.parquet')"
        f" WHERE vec_id IN (3, 7)"
    ).fetchall())
    big = dict(con.execute(
        f"SELECT vec_id, embedding"
        f" FROM read_parquet('{corpus}/embeddings.parquet')"
        f" WHERE vec_id IN ({stride + 3}, {stride + 7},"
        f"                  {2 * stride + 3}, {2 * stride + 7})"
    ).fetchall())
    a = np.asarray(src[3], dtype=np.float64)
    b = np.asarray(src[7], dtype=np.float64)
    for cp in (1, 2):
        ta = np.asarray(big[cp * stride + 3], dtype=np.float64)
        tb = np.asarray(big[cp * stride + 7], dtype=np.float64)
        # within-copy inner products bit-preserved (orthogonal transform)
        assert float(a @ b) == float(ta @ tb)
        assert float(a @ a) == float(ta @ ta)
        # cross-copy cosine collapses to noise (not a near-duplicate)
        cos = float(a @ ta) / math.sqrt(float(a @ a) * float(ta @ ta))
        assert abs(cos) < 0.9


def test_dims_unscaled_facts_scaled(corpus):
    con = duckdb.connect()
    for tbl, factor in [("region", 1), ("nation", 1),
                        ("lineitem", 3), ("documents", 3),
                        ("embeddings", 3), ("events", 3)]:
        n0 = con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/{tbl}.parquet')"
        ).fetchone()[0]
        n1 = con.execute(
            f"SELECT count(*) FROM read_parquet('{corpus}/{tbl}.parquet')"
        ).fetchone()[0]
        assert n1 == n0 * factor, tbl


def test_exponent_clamps_to_timer_resolution():
    """A sub-ms 1x timing (rounds to 0.0) must yield a finite exponent,
    not None → spurious hard gate failure (ADVICE r11); None stays
    reserved for true timeouts."""
    from tools.scale_probe import exponent

    assert exponent(0.0, 0.01, 10) == pytest.approx(1.0)   # 1ms -> 10ms
    assert exponent(0.0, 0.0, 10) == 0.0                   # both sub-ms
    assert exponent(0.5, 5.0, 10) == pytest.approx(1.0)    # normal path


def test_regress_bar_semantics():
    """--regress fail threshold: sublinear drift never fails; a
    dispositioned superlinear query fails only beyond recorded+0.15."""
    from tools.scale_probe import regress_bar

    # previously-flat query drifting inside the sublinear band: bar is 1.15
    assert regress_bar(0.05) == pytest.approx(1.15)
    assert regress_bar(0.98) == pytest.approx(1.15)
    # dispositioned superlinear query (ann_join_topk 1.26): bar tracks it
    assert regress_bar(1.26) == pytest.approx(1.41)
    # unrecorded query defaults to the plain linearity bar
    assert regress_bar(None) == pytest.approx(1.15)


def test_regress_check_red_and_green():
    from tools.scale_probe import regress_check

    baseline = {"flat": 0.05, "dispositioned": 1.26}
    report = {
        "flat": {"exp": 0.90},            # drift inside sublinear band: ok
        "dispositioned": {"exp": 1.35},   # within recorded+0.15: ok
        "newly_quadratic": {"exp": 1.80}, # unrecorded, above 1.15: RED
        "timed_out": {"exp": None},       # unmeasurable: RED, never silent
    }
    assert regress_check(report, baseline) == ["newly_quadratic", "timed_out"]
    report["dispositioned"]["exp"] = 1.55  # worsened beyond its account
    assert "dispositioned" in regress_check(report, baseline)


def test_regress_baseline_parse_matches_artifact_layout():
    """The committed SCALE_EXPONENTS artifact parses into a per-query
    exponent map for both factor sections (the exp key name differs)."""
    import json

    for artname in ("SCALE_EXPONENTS_r11.json", "SCALE_EXPONENTS_r12.json",
                    "SCALE_EXPONENTS_r13.json"):
        art = json.load(open(Path(__file__).resolve().parent.parent / artname))
        for section, expkey in [("factor10", "exp_1_to_10"),
                                ("factor100", "exp_10_to_100")]:
            base = {
                q: next(v for k, v in rec.items() if k.startswith("exp"))
                for q, rec in art[section].items()
            }
            assert base, (artname, section)
            for q, rec in art[section].items():
                assert base[q] == rec[expkey]


def test_exponent_none_propagates_from_timeouts():
    """A capped (None) timing on either side propagates to a None
    exponent — the regress gate's hard-failure branch needs a real
    producer (ADVICE r12)."""
    from tools.scale_probe import exponent

    assert exponent(None, 5.0, 10) is None
    assert exponent(0.5, None, 10) is None
    assert exponent(None, None, 10) is None


def test_capped_count_records_none_on_timeout():
    """_capped_count cancels the Spark jobs at the cap and returns None;
    under the cap it returns the elapsed seconds. Spark is simulated:
    cancelAllJobs makes the in-flight count() raise, exactly like a
    cancelled Spark job does."""
    import time as _time

    from tools.scale_probe import _capped_count

    class FakeSC:
        def __init__(self):
            self.cancelled = False

        def cancelAllJobs(self):
            self.cancelled = True

    class FakeSpark:
        def __init__(self):
            self.sparkContext = FakeSC()

    spark = FakeSpark()

    class SlowDF:
        def count(self):
            for _ in range(200):
                _time.sleep(0.05)
                if spark.sparkContext.cancelled:
                    raise RuntimeError("Job cancelled")

    class FastDF:
        def count(self):
            return 1

    assert _capped_count(spark, lambda s, d: SlowDF(), "x", 0.2) is None
    assert spark.sparkContext.cancelled
    spark.sparkContext.cancelled = False
    t = _capped_count(spark, lambda s, d: FastDF(), "x", 5.0)
    assert t is not None and t < 1.0
    assert not spark.sparkContext.cancelled


def test_stale_pre_r12_corpus_marker_detected(tmp_path):
    """A cached corpus whose _DONE marker lacks next_seed= (pre-r12
    letter-only cipher) must read as stale so main() rebuilds it instead
    of silently reusing it (ADVICE r12); the post-r12 format and a
    missing marker are not stale."""
    from tools.scale_probe import stale_corpus

    marker = tmp_path / "_DONE"
    assert not stale_corpus(marker)  # no cache: build path, not stale
    marker.write_text("factor=10 src=/root/testdata/sf0.1\n")  # pre-r12
    assert stale_corpus(marker)
    marker.write_text("factor=10 src=/root/testdata/sf0.1 seed=0 next_seed=10\n")
    assert not stale_corpus(marker)
