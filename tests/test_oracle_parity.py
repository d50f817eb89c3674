"""Local replica of the driver's correctness gate: every registered query
with an oracle must match DuckDB on row count, column names, and
order-insensitive values (at sf0.001 here; the driver runs sf0.01)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import types as T

from tests.conftest import SF_SMALL
from uav_streamprocessor_spark import registry

SPECS = [s for s in registry.all_specs() if s.oracle is not None]
ROWS_ONLY = [s for s in registry.all_specs() if s.oracle is None]


def _assert_canon_hashable_schema(sdf, name: str) -> None:
    """The driver's value-hash canonicalization routes results through a
    pandas hash table; Python lists/dicts/Rows (ArrayType/MapType/
    StructType columns) are unhashable there and crash the driver's
    CORRECTNESS recording (r6: media_image_features). Every registered
    query output must therefore use only atomic/binary/string columns —
    serialize vectors as JSON strings (see extract_image_features)."""
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, f"{name}: non-canon-hashable output columns {bad}"


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_oracle_match(spec, spark, duck):
    sdf = spec.build(spark, SF_SMALL)
    _assert_canon_hashable_schema(sdf, spec.name)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(spec.oracle)
    d_cols = [c for c in rel.columns]
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{spec.name}: column mismatch spark={s_cols} duck={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{spec.name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    sc = _canon(s_rows, s_cols)
    dc = _canon(d_rows, d_cols)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, (
        f"{spec.name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )


@pytest.mark.parametrize("spec", ROWS_ONLY, ids=lambda s: s.name)
def test_rows_only_queries_run(spec, spark):
    sdf = spec.build(spark, SF_SMALL)
    _assert_canon_hashable_schema(sdf, spec.name)
    n = sdf.count()
    assert n >= 0
    # re-run determinism: same count and same sample on second evaluation
    assert sdf.count() == n
    # replicate the driver's pandas canonicalization on a bounded sample:
    # unhashable cell values (lists/dicts) crash its hash table even when
    # the declared schema looks benign, so exercise the same code path
    pdf = sdf.limit(200).toPandas()
    if len(pdf):
        pd.util.hash_pandas_object(pdf, index=False)
