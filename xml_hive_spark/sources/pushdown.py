"""Filter pushdown for the ``xmlhive`` Python DataSource.

The reference has no predicate interface at all — ``nextRecord`` always
assembles the full record and Hive filters after deserialization
(AvroTransormer.scala:77-170; SURVEY.md §4.1). Spark 4.1's Python
DataSource ``pushFilters`` API lets our scan do better: predicates on
top-level scalar fields are evaluated executor-side on the extracted
row BEFORE it is appended to an Arrow batch, so non-matching records
never cross the Python→JVM boundary. At 100 TB a selective predicate
cuts the dominant cost of the XML path (Arrow materialization + row
transfer) by the filter's selectivity; the byte-scan itself is already
sequential-IO-bound and unavoidable.

Semantics contract (``DataSourceReader.pushFilters``): filters NOT
returned to Spark are fully handled here — Spark does not re-apply
them. We therefore implement exact SQL three-valued logic: every
compiled filter evaluates to True/False/None (None = SQL NULL), a row
survives only if every accepted filter is exactly True, and ``Not``
maps None → None (so ``NOT (null = 1)`` correctly drops the row).
Anything we cannot prove we evaluate identically to Spark is returned
as unsupported and Spark applies it post-scan.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

from pyspark.sql.datasource import (
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
)

# Tri-valued predicate over a row tuple: True / False / None (SQL NULL).
RowPredicate = Callable[[tuple], Optional[bool]]

_COMPARABLE = (
    StringType,
    IntegerType,
    LongType,
    ShortType,
    ByteType,
    FloatType,
    DoubleType,
    DecimalType,
    BooleanType,
    DateType,
)

_STRING_OPS = (StringStartsWith, StringEndsWith, StringContains)


def _field_index(attr: tuple, schema: StructType):
    """Top-level scalar column index for a filter attribute, else None."""
    if len(attr) != 1:
        return None  # nested paths: the exact parse path handles structs,
        # but fast/exact rows differ in representation — stay conservative
    names = [f.name for f in schema.fields]
    try:
        i = names.index(attr[0])
    except ValueError:
        return None
    if not isinstance(schema.fields[i].dataType, _COMPARABLE):
        return None
    return i


def _is_nan(v: Any) -> bool:
    return isinstance(v, float) and math.isnan(v)


def compile_filter(f: Filter, schema: StructType) -> RowPredicate | None:
    """Compile one pushed filter to a tri-valued row predicate.

    Returns None when the filter (or its column/type) is unsupported —
    the caller must hand it back to Spark.
    """
    if isinstance(f, Not):
        child = compile_filter(f.child, schema)
        if child is None:
            return None

        def neg(row, _c=child):
            v = _c(row)
            return None if v is None else (not v)

        return neg

    attr = getattr(f, "attribute", None)
    if attr is None:
        return None
    idx = _field_index(attr, schema)
    if idx is None:
        return None
    dtype = schema.fields[idx].dataType

    if isinstance(f, IsNull):
        return lambda row, _i=idx: row[_i] is None
    if isinstance(f, IsNotNull):
        return lambda row, _i=idx: row[_i] is not None

    if isinstance(f, _STRING_OPS):
        if not isinstance(dtype, StringType):
            return None
        needle = f.value
        if not isinstance(needle, str):
            return None
        if isinstance(f, StringStartsWith):
            op = str.startswith
        elif isinstance(f, StringEndsWith):
            op = str.endswith
        else:
            op = str.__contains__

        def str_pred(row, _i=idx, _n=needle, _op=op):
            v = row[_i]
            return None if v is None else _op(v, _n)

        return str_pred

    if isinstance(f, EqualNullSafe):
        lit = f.value
        if _is_nan(lit):
            # Spark: NaN <=> NaN is TRUE; Python ==: NaN != NaN — defer,
            # mirroring the NaN-literal deferral in the cmp path below
            return None

        def null_safe_eq(row, _i=idx, _l=lit):
            v = row[_i]
            if v is None or _l is None:
                return v is None and _l is None
            return v == _l

        return null_safe_eq

    if isinstance(f, In):
        lits = f.value
        if lits is None or any(_is_nan(x) for x in lits):
            return None  # NaN set-membership: let Spark decide
        has_null = any(x is None for x in lits)
        vals = tuple(x for x in lits if x is not None)

        def in_pred(row, _i=idx, _v=vals, _hn=has_null):
            x = row[_i]
            if x is None:
                return None
            if x in _v:
                return True
            # IN with a NULL element is NULL when no element matches
            return None if _hn else False

        return in_pred

    cmp_ops = {
        EqualTo: lambda a, b: a == b,
        GreaterThan: lambda a, b: a > b,
        GreaterThanOrEqual: lambda a, b: a >= b,
        LessThan: lambda a, b: a < b,
        LessThanOrEqual: lambda a, b: a <= b,
    }
    for cls, op in cmp_ops.items():
        if type(f) is cls:
            lit = f.value
            if lit is None:
                return None  # comparison to NULL literal: always NULL;
                # rare enough to leave with Spark
            if _is_nan(lit):
                return None  # Spark's NaN ordering differs from Python's
            if isinstance(dtype, (FloatType, DoubleType)):
                # row value may be NaN: Spark treats NaN as largest and
                # NaN == NaN true; Python disagrees — defer those rows'
                # semantics by being exact here
                def fcmp(row, _i=idx, _l=lit, _op=op, _cls=cls):
                    v = row[_i]
                    if v is None:
                        return None
                    if _is_nan(v):
                        if _cls is EqualTo:
                            return False  # lit is not NaN (checked above)
                        # NaN is greater than everything in Spark ordering
                        return _cls in (GreaterThan, GreaterThanOrEqual)
                    return _op(v, _l)

                return fcmp

            def cmp_pred(row, _i=idx, _l=lit, _op=op):
                v = row[_i]
                return None if v is None else _op(v, _l)

            return cmp_pred

    return None


def compile_conjunction(preds: list[RowPredicate]) -> RowPredicate | None:
    """AND of compiled predicates; a row survives only on all-True."""
    if not preds:
        return None
    if len(preds) == 1:
        p = preds[0]
        return lambda row, _p=p: _p(row) is True

    def conj(row, _ps=tuple(preds)):
        for p in _ps:
            if p(row) is not True:
                return False
        return True

    return conj
