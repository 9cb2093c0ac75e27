"""Skew mitigation: salted equi-join.

AQE's skew-join handling (on by default in ``session.py``) splits
oversized shuffle partitions at runtime; explicit salting is the static
fallback for the pathological case AQE can't fix — one join key so hot a
single task would own it. The left (large/skewed) side gets a random
salt in ``[0, n_salts)``, the right side is replicated ``n_salts`` times,
and the join key becomes ``(key, salt)``: the hot key's rows spread over
``n_salts`` tasks at the cost of replicating the right side.

Result-equivalence to the plain join is guaranteed (each left row meets
each matching right row exactly once — for its own salt) and asserted in
tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    Use when ``left`` is large with hot keys and ``right`` is small enough
    to replicate ``n_salts``× (typical: fact × mid-size dimension too big
    to broadcast). Only inner/left joins are meaningful (salting a right
    or full outer would duplicate unmatched right rows)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    salted_left = left.withColumn(
        SALT_COL, (F.rand(seed=42) * n_salts).cast("int")
    )
    replicated_right = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_left.join(
        replicated_right,
        (salted_left[left_key] == replicated_right[right_key])
        & (salted_left[SALT_COL] == replicated_right[SALT_COL]),
        how,
    )
    return out.drop(salted_left[SALT_COL]).drop(replicated_right[SALT_COL])
