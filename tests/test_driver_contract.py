"""Replicates the driver's verify: every queries() entry vs its DuckDB
oracle at sf0.01 — row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return round(val, 9)
    if isinstance(val, (int, str, bool)):
        return val
    try:  # Decimal and friends
        return round(float(val), 9)
    except (TypeError, ValueError):
        return str(val)


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon(r[i]) for i in order) for r in rows
    )


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if name not in oracles:
        assert len(srows) >= 0  # rows-only check
        return
    ddf = duck.execute(oracles[name])
    dcols = [d[0] for d in ddf.description]
    drows = ddf.fetchall()
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)} rows"
    sset = _rows_to_set(scols, [[r[c] for c in scols] for r in srows])
    dset = _rows_to_set(dcols, drows)
    mismatches = [
        (a, b) for a, b in zip(sset, dset) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert set(df.columns) == {"component", "n_vertices", "total_value"}
