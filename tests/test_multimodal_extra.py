"""Feature-extraction and resize stages: numpy-reference exactness for
the (real) byte-histogram features, determinism + shape for the resize
pipeline, and registry execution for both."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from xml_hive_spark.operators import all_queries, t
from xml_hive_spark.operators.multimodal import (
    extract_byte_features,
    resize_images,
)


def test_byte_features_match_numpy(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").limit(50)
    wp = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    got = {r.doc_id: r.features for r in extract_byte_features(wp).collect()}
    for r in wp.collect():
        a = np.frombuffer(bytes(r.payload), dtype=np.uint8)
        h = np.bincount(a >> 4, minlength=16).astype(np.float64)
        n = np.linalg.norm(h)
        exp = (h / n if n else h).astype(np.float32)
        assert np.allclose(got[r.doc_id], exp, atol=0), r.doc_id
        assert abs(float(np.linalg.norm(got[r.doc_id])) - 1.0) < 1e-5


def test_resize_deterministic_and_shaped(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").limit(20)
    wp = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    a = sorted(map(tuple, resize_images(wp).collect()))
    b = sorted(map(tuple, resize_images(wp).collect()))
    assert a == b  # deterministic stub + pooling
    assert all(r[1] == 8 and r[2] == 8 for r in a)
    assert len(a) == 20


def test_registry_entries_execute(spark, sf_dir):
    reg = all_queries()
    fe = reg["multimodal_feature_extract"].fn(spark, sf_dir).collect()
    assert len(fe) == 1 and fe[0].n > 0
    rs = reg["multimodal_resize_stub"].fn(spark, sf_dir).collect()
    assert len(rs) == 1 and rs[0].n > 0


def test_arrow_chunking_reassembles_exactly(spark, sf_dir):
    """mapInArrow chunking must be lossless: concatenating each doc's
    chunks in chunk_idx order reproduces the original payload bytes."""
    from pyspark.sql import functions as F

    from xml_hive_spark.operators import t
    from xml_hive_spark.operators.multimodal import chunk_payloads_arrow

    docs = t(spark, sf_dir, "documents").limit(50)
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    orig = {r.doc_id: bytes(r.payload) for r in payloads.collect()}
    got: dict[int, list] = {}
    for r in chunk_payloads_arrow(payloads).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, bytes(r.chunk)))
    assert set(got) == set(orig)
    for doc_id, pieces in got.items():
        joined = b"".join(c for _, c in sorted(pieces))
        assert joined == orig[doc_id]
        assert all(len(c) <= 128 for _, c in pieces)
