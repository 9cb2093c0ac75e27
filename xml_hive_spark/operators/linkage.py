"""Record linkage / entity resolution: blocked fuzzy joins with edit
distance.

The deduplication family (operators/dedup.py) handles near-duplicate
TEXT; this module handles near-duplicate ENTITIES — the "same thing,
different spelling" matching step of master-data and catalog pipelines.
The core discipline is identical to set-similarity join: never compare
all pairs — generate candidates with an equi-joinable blocking key,
verify with the expensive measure only inside blocks.

Scale note (100 TB): the blocking key (here the head noun of the part
name) turns the O(n²) comparison into a per-block self-join; block
sizes are bounded by the entity vocabulary, and a skewed block would be
salted or length-bucketed exactly like the ppjoin prefix buckets in
setsim_join_prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xml_hive_spark.operators import query, t


@query(
    "fuzzy_join_levenshtein",
    oracle="""
WITH p AS (SELECT DISTINCT p_name FROM part),
tok AS (
  SELECT p_name, string_split(p_name, ' ')[2] AS blk FROM p
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
FROM tok a JOIN tok b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 4
ORDER BY name_a, name_b
""",
    tags=("linkage", "fuzzy-join", "levenshtein"),
)
def fuzzy_join_levenshtein(spark: SparkSession, sf: str) -> DataFrame:
    """Blocked fuzzy self-join over distinct part names: candidate pairs
    share a blocking key (the noun — second token — of the name), the
    match predicate is Levenshtein distance <= 4, pairs are undirected
    (name_a < name_b).

    Both engines implement the identical unit-cost edit distance, so the
    dist column hashes exactly. Scale shape: DISTINCT on names (hash
    agg), an equi-join keyed on the block (one shuffle; the quadratic
    work is confined to within-block pairs), JVM-side levenshtein in the
    join verify — no UDF. Reference parity note: the reference has no
    fuzzy matching at all; this extends the engine the same way the
    dedup family does (SURVEY.md north_star)."""
    names = t(spark, sf, "part").select("p_name").distinct()
    tok = names.select(
        "p_name", F.split("p_name", " ").getItem(1).alias("blk")
    )
    a = tok.select(F.col("p_name").alias("name_a"), "blk")
    b = tok.select(F.col("p_name").alias("name_b"), "blk")
    return (
        a.join(b, "blk")
        .where(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
        )
        .where(F.col("dist") <= 4)
        .orderBy("name_a", "name_b")
    )
