"""Parity tests for the LM/tokenizer-statistics operators (operators/lm.py).

The oracled queries (text_ngram_novelty, tfidf_top_terms,
bpe_pair_counts) are covered by the DuckDB gate; here the iterative BPE
learner — which has no SQL oracle by design — is checked exactly
against a pure-Python BPE reference implementation on the same corpus.
"""

from __future__ import annotations

import collections
import re

import pyarrow.parquet as pq
import pytest

from xml_hive_spark.operators.lm import bpe_learn


def _python_bpe(texts: list[str], n_merges: int):
    """Reference BPE: word-frequency table, adjacent-pair argmax with
    (count desc, pair asc) tie-break, greedy left-to-right
    non-overlapping merge application."""
    wf = collections.Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                wf[w] += 1
    syms = {w: list(w) for w in wf}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = collections.Counter()
        for w, n in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += n
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, cnt))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


@pytest.mark.usefixtures("sf_dir")
def test_bpe_learn_matches_python_reference(spark, sf_dir):
    texts = [
        r["text"]
        for r in pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        .to_pylist()
    ]
    expected = _python_bpe(texts, 6)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["n"])
        for r in bpe_learn(spark, sf_dir, 6).collect()
    ]
    assert got == expected
    # sanity: merges are strictly useful (positive counts) and ranked
    assert all(n > 0 for *_, n in got)
    assert [r for r, *_ in got] == list(range(1, len(got) + 1))


def test_bpe_merge_fold_handles_overlaps(spark):
    """The JVM aggregate() fold must merge left-to-right non-overlapping:
    'aaa' with merge (a,a) → ['aa','a'], never ['a','aa'] or ['aa','aa']."""
    from pyspark.sql import functions as F

    from xml_hive_spark.operators.lm import _MERGE_EXPR

    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["b", "a", "a"],), ([],)],
        "syms ARRAY<STRING>",
    )
    out = df.select(
        F.expr(_MERGE_EXPR.format(a="'a'", b="'a'")).alias("m")
    ).collect()
    assert [r["m"] for r in out] == [
        ["aa", "a"],
        ["aa", "aa"],
        ["b", "aa"],
        [],
    ]


def test_bpe_oracle_matches_python_reference():
    """The unrolled DuckDB twin of bpe_learn (lm.py:_bpe_merge_ctes)
    must reproduce the pure-Python greedy reference exactly — pinned on
    adversarial corpora exercising the gaps-and-islands closed form:
    same-symbol runs of every parity (where naive string replace()
    diverges from greedy LTR), alternating pairs, and overlap chains.
    No Spark needed: this pins the ORACLE side; the Spark side is
    pinned against the same reference above."""
    import duckdb

    from xml_hive_spark.operators.lm import _bpe_oracle

    cases = [
        ["aaa aaaa aaaaa aaaaaa", "ab ab abab", "aaa"],
        ["xyxyxy yxyxyx", "zzzz zzz zz z"],
        ["the cat sat on the mat", "the bat and the cat"],
        ["aa aa aa bb", "aabb aabb", "abab baba ab"],
    ]
    for texts in cases:
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?)", [(t,) for t in texts]
        )
        got = [tuple(r) for r in con.execute(_bpe_oracle(6)).fetchall()]
        exp = _python_bpe(texts, 6)
        assert got == [tuple(e) for e in exp], (texts, got, exp)
