"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables, compare row count / columns / values.

Usage: python tools/sim_driver.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from imtag_spark.session import get_spark  # noqa: E402
from imtag_spark.sources.tables import TABLES  # noqa: E402


STRICT = os.environ.get("SIM_DRIVER_STRICT", "1") != "0"


def _canon(v):
    """Canonical numeric form, mirroring the driver's type-coercing value
    hash EXACTLY: Decimal coerces to float (so an oracle emitting
    DECIMAL(38,0) where Spark emits BIGINT stringifies as "7000000.0" vs
    "7000000" and FAILS — the r2 ``ccl_grid_stats`` gate failure the old
    Decimal→int folding masked); ints stay int; floats compare at full
    precision (repr), so a last-ulp divergence — the r1 failure mode —
    is caught too. Never collapse integral floats/Decimals to int: the
    driver does not."""
    if isinstance(v, bool) or not isinstance(v, (int, float, decimal.Decimal)):
        return v
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v) if STRICT else round(v, 6)
    return v


def norm(rows, cols):
    out = []
    for r in rows:
        out.append(tuple(_canon(r[c]) for c in cols))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="sim_driver", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sorted(sdf.columns)
        srows = norm(sdf.collect(), scols)
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows {t_spark:.1f}s")
            continue
        t0 = time.time()
        ddf = con.execute(oracles[name]).fetch_arrow_table().to_pylist()
        t_duck = time.time() - t0
        dcols = sorted(ddf[0].keys()) if ddf else scols
        drows = norm(ddf, dcols)
        ok_schema = scols == dcols
        ok_count = len(srows) == len(drows)
        ok_vals = srows == drows
        status = "OK" if (ok_schema and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            n_fail += 1
        print(
            f"[{status}] {name}: spark={len(srows)} duck={len(drows)} "
            f"schema={'=' if ok_schema else f'{scols} vs {dcols}'} "
            f"({t_spark:.1f}s / {t_duck:.1f}s)"
        )
        if not ok_vals and ok_schema and ok_count:
            for a, b in zip(srows, drows):
                if a != b:
                    print(f"    first diff:\n     spark={a}\n     duck ={b}")
                    break
    print("FAILURES:", n_fail)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
