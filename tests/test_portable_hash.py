"""Cross-engine pins for the portable-hash convention (r9).

Three oracles (dedup_minhash_lsh, dedup_simhash,
multimodal_feature_extract) and the sketch family depend on the 48-bit
md5-slice hash agreeing byte-for-byte between Spark, DuckDB, and the
Python reference, and the two lowering oracles depend on the engines'
``lower()`` agreeing on the corpus (they DON'T in general — dotted
capital I and Greek final sigma diverge — so those oracles carry an
ASCII domain guard that must fail LOUDLY, not as a hash mismatch)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


def _py48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=40))
def test_hash48_duckdb_equals_python(s):
    con = duckdb.connect()
    du = con.execute(
        "SELECT CAST('0x' || substr(md5(?), 1, 12) AS BIGINT)", [s]
    ).fetchone()[0]
    assert du == _py48(s)


def test_hash48_spark_equals_python(spark):
    """One Spark round for a tricky batch (per-example Spark rounds are
    too slow for hypothesis; DuckDB carries the fuzz above)."""
    from xml_hive_spark.operators.dedup import _hash48

    samples = ["", "a", "hello world", "ümläut", "漢字", "a b  c",
               "x" * 200, "\t tab", "naïve", "ß", "🙂🙂"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", _hash48("s").alias("h")).collect()}
    for s in samples:
        assert got[s] == _py48(s), s


def test_lower_divergence_is_real_and_guarded():
    """The reason the lowering oracles carry an ASCII guard: these
    inputs lower() differently in DuckDB vs Python (and unguarded
    would surface as an inscrutable driver hash mismatch)."""
    con = duckdb.connect()
    diverging = ["İstanbul", "ΣΙΓΜΑΣ"]
    seen = False
    for s in diverging:
        if con.execute("SELECT lower(?)", [s]).fetchone()[0] != s.lower():
            seen = True
    assert seen, "engines now agree on lower() — the ASCII guards can go"


@pytest.mark.parametrize("qname", ["dedup_minhash_lsh", "dedup_simhash"])
def test_lowering_oracles_fail_loudly_on_non_ascii(qname):
    from xml_hive_spark.operators import all_queries

    oracle = all_queries()[qname].oracle
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'plain ascii words here'), (2, 'İstanbul ΣΙΓΜΑΣ tricky')) "
        "t(doc_id, text)"
    )
    with pytest.raises(duckdb.ConversionException, match="DOMAIN ERROR"):
        con.execute(oracle).fetchall()


@pytest.mark.parametrize("qname", ["dedup_minhash_lsh", "dedup_simhash"])
def test_lowering_oracles_run_clean_on_ascii(qname):
    from xml_hive_spark.operators import all_queries

    oracle = all_queries()[qname].oracle
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'alpha beta gamma delta'), (2, 'alpha beta gamma delta'), "
        "(3, 'something else entirely distinct')) t(doc_id, text)"
    )
    rows = con.execute(oracle).fetchall()
    assert (1, 2) in {(r[0], r[1]) for r in rows}  # exact dups pair up


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_documents_corpus_is_ascii(sf):
    """Preflight for EVERY lowercasing oracle (text family, dedup
    family): the cross-engine case-folding contract is only verified
    for ASCII (see the divergence pin above). If the driver ever
    regenerates documents.parquet with non-ASCII text, this fails with
    a clear name instead of N inscrutable driver hash mismatches."""
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('/root/testdata/{sf}/documents.parquet') "
        "WHERE strlen(text) <> length(text)"
    ).fetchone()[0]
    assert n == 0, (
        f"{n} non-ASCII documents at {sf}: audit every oracle that "
        "lowercases text before trusting driver comparisons"
    )


@settings(max_examples=300, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6, width=32,
                 allow_nan=False, allow_infinity=False))
def test_quantize20_duckdb_equals_numpy(v):
    """floor(v · 2^20) — the quantization every r9 similarity oracle
    rides — must be the same BIGINT in numpy and DuckDB for any float32
    input (power-of-two scaling is an exact exponent shift; floor of an
    exact double is engine-independent)."""
    import numpy as np

    con = duckdb.connect()
    du = con.execute(
        "SELECT CAST(floor(CAST(CAST(? AS REAL) AS DOUBLE) * 1048576.0)"
        " AS BIGINT)", [float(v)]
    ).fetchone()[0]
    nu = int(np.floor(np.float64(np.float32(v)) * 1048576.0))
    assert du == nu, (v, du, nu)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=600),
       st.integers(min_value=1, max_value=600))
def test_float32_cast_rounding_parity(a, b):
    """CAST(x AS REAL): the feature-extract oracle divides two exact
    integers in float64 and rounds to float32 — both engines must round
    half-even identically for any count ratio in the histogram's
    domain."""
    import numpy as np

    con = duckdb.connect()
    du = con.execute(
        "SELECT CAST(CAST(CAST(? AS DOUBLE) / sqrt(CAST(? AS DOUBLE))"
        " AS REAL) AS DOUBLE)", [a, a * a + b]
    ).fetchone()[0]
    nu = float(np.float64(np.float32(np.float64(a) / np.sqrt(np.float64(a * a + b)))))
    assert du == nu, (a, b, du, nu)


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=0, max_value=2**31), st.integers(min_value=17, max_value=48))
def test_pq_training_duckdb_equals_numpy(seed, n):
    """Integer PQ codebook training (r10): the full recurrence — md5-48
    sample ordering, first-K init, _PQ_ITERS rounds of exact
    squared-distance argmin (ties → lowest code) + floor-div means with
    empty-code carry — must produce the IDENTICAL int64 codebooks from
    numpy (:func:`_pq_lloyd`, what Spark ships) and from the oracle's
    training CTEs (:func:`_pq_training_ctes`, what the driver replays)
    on arbitrary float32 corpora, not just the driver tables. Inputs
    deliberately include duplicate rows (n mod 7 == 0 duplicates row 0)
    to force distance ties and empty codes."""
    import numpy as np

    from xml_hive_spark.operators.similarity import (
        _PQ_ITERS,
        _pq_lloyd,
        _pq_training_ctes,
        _quantize20,
    )

    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, 64)).astype(np.float32)
    if n % 7 == 0:
        vecs[n // 2] = vecs[0]  # exact duplicate → guaranteed ties
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id INTEGER, embedding REAL[])")
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)",
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
    )
    sql = (
        """
WITH qv AS (
  SELECT vec_id, t.d,
         CAST(floor(CAST(embedding[t.d + 1] AS DOUBLE) * 1048576.0)
              AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0, 64) t(d)
)"""
        + _pq_training_ctes()
        + f"\nSELECT m, code, j, CAST(c AS BIGINT) AS c FROM pb{_PQ_ITERS}"
        "\nORDER BY m, code, j"
    )
    rows = con.execute(sql).fetchall()
    con.close()

    # numpy side: replicate the sample ordering with hashlib (md5 == md5;
    # hash48 parity is fuzz-pinned above), then run the shared core
    import hashlib

    order = sorted(
        range(n),
        key=lambda i: (int(hashlib.md5(f"pq_{i}".encode()).hexdigest()[:12], 16), i),
    )
    x = _quantize20(vecs[order].astype(np.float64))
    books = _pq_lloyd(x)

    got = {(m, code, j): c for m, code, j, c in rows}
    sub = 64 // books.shape[0]
    for m in range(books.shape[0]):
        for code in range(books.shape[1]):
            for j in range(sub):
                assert got[(m, code, j)] == int(books[m, code, j]), (
                    seed, n, m, code, j, got[(m, code, j)], int(books[m, code, j])
                )


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=0, max_value=2**31),
       st.integers(min_value=5, max_value=40))
def test_logreg_training_duckdb_equals_python(seed, n):
    """The r10 portable logreg trainer (embeddings.logreg_fit): the
    full recurrence — q20 feature quantization, fixed-order
    fast-sigmoid IEEE tree, integer gradient sums, truncating-division
    updates — must produce IDENTICAL int64 weights from the
    single-process Python reference (what the Spark mapInArrow pass
    computes, pinned equal in test_embeddings) and from the oracle's
    training CTEs (what the driver replays), on arbitrary float32
    corpora — including planted duplicate rows, an all-zero vector,
    and single-class labels."""
    import numpy as np

    from tests.test_embeddings import _py_quantized_logreg
    from xml_hive_spark.operators.embeddings import _logreg_training_ctes

    rng = np.random.default_rng(seed)
    vecs = (rng.uniform(-1.0, 1.0, (n, 64))).astype(np.float32)
    y01 = rng.integers(0, 2, n)
    if n % 5 == 0:
        vecs[n // 2] = vecs[0]  # duplicate rows
    if n % 3 == 0:
        vecs[n - 1] = 0.0  # zero vector: dot = bias only
    if n % 11 == 0:
        y01[:] = 1  # single-class corpus
    iters = 6
    w_py, _ = _py_quantized_logreg(vecs.astype(np.float64), y01, iters)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id INTEGER, embedding REAL[],"
        " label INTEGER)"
    )
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?, ?)",
        [(i, [float(x) for x in vecs[i]], int(y01[i])) for i in range(n)],
    )
    w_duck = [
        int(r[1]) for r in con.execute(
            _logreg_training_ctes(iters)
            + f"\nSELECT j, wq FROM w{iters} ORDER BY j"
        ).fetchall()
    ]
    con.close()
    assert w_py == w_duck


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.text(alphabet="ab", min_size=1, max_size=8), min_size=1, max_size=12,
))
def test_bpe_oracle_fuzz_equals_python(words):
    """The unrolled BPE training oracle (lm._bpe_merge_ctes) on random
    two-symbol corpora — maximal pressure on the gaps-and-islands
    greedy-apply closed form (same-symbol runs of every length and
    parity) and on the (count desc, pair asc) argmax tie-break."""
    from tests.test_lm import _python_bpe
    from xml_hive_spark.operators.lm import _bpe_oracle

    texts = [" ".join(words[i::3]) for i in range(3) if words[i::3]]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", [(t,) for t in texts])
    got = [tuple(r) for r in con.execute(_bpe_oracle(4)).fetchall()]
    con.close()
    exp = [tuple(e) for e in _python_bpe(texts, 4)]
    assert got == exp, (texts, got, exp)
