"""Local mirror of the driver's correctness gate: run every ``queries()``
entry on Spark at sf0.01 and compare against its ``oracle_sql()`` twin on
DuckDB — same columns (sorted by name), same row count, same values
(order-insensitive).

This is the highest-value test in the repo: if it's green here, the driver's
CORRECTNESS_r{N}.json should be green too.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_ORACLE


def _normalize(df) -> list[tuple]:
    """pandas DataFrame -> sorted list of value tuples with columns sorted by
    name, floats rounded to 9 significant-ish decimals, NaN -> None."""
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        norm = []
        for v in tup:
            if v is None:
                norm.append(None)
            elif isinstance(v, float):
                norm.append(None if math.isnan(v) else round(v, 9))
            else:
                norm.append(v)
        rows.append(tuple(norm))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def _pairs():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in sorted(qs.items())]


@pytest.mark.parametrize("name,fn,oracle", _pairs(),
                         ids=[n for n, _, _ in _pairs()])
def test_query_matches_oracle(spark, duck, name, fn, oracle):
    sdf = fn(spark, SF_ORACLE).toPandas()
    if oracle is None:
        assert len(sdf) >= 0  # rows-only check, mirrors the driver's weak path
        return
    ddf = duck.execute(oracle).fetchdf()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} vs {len(ddf)}"
    srows, drows = _normalize(sdf), _normalize(ddf)
    mismatches = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatching rows; first: {mismatches[:3]}"
