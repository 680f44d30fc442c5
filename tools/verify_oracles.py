"""Local stand-in for the driver's correctness gate: run every queries()
entry via Spark and its oracle_sql() via DuckDB on the same sf dir, compare
row count, column names, and order-insensitive values.

Usage: python tools/verify_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ahrd_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bool):
        return bool(v)
    return v


def run(sf_dir: str, only: list[str]):
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"{name:28s} SPARK ERROR: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"{name:28s} rows={len(srows)} (no oracle; rows-only)")
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = [c.lower() for c in ddf.columns]
            drows = ddf.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"{name:28s} DUCKDB ERROR: {str(e)[:300]}")
            continue
        ok = True
        msgs = []
        if sorted(c.lower() for c in scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols spark={scols} duck={ddf.columns}")
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if ok:
            order = sorted(range(len(scols)), key=lambda i: scols[i].lower())
            # sort by repr so NULLs mixed with values stay orderable;
            # equality below still compares the exact tuples
            sset = sorted(
                (tuple(norm(r[scols[i]]) for i in order) for r in srows),
                key=repr,
            )
            dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
            dset = sorted(
                (tuple(norm(r[i]) for i in dorder) for r in drows), key=repr
            )
            if sset != dset:
                ok = False
                diff_s = [x for x in sset if x not in set(dset)][:3]
                diff_d = [x for x in dset if x not in set(sset)][:3]
                msgs.append(f"values spark_only={diff_s} duck_only={diff_d}")
        status = "OK" if ok else "MISMATCH"
        print(f"{name:28s} rows={len(srows)} {status} {'; '.join(msgs)}")
        if not ok:
            failures.append((name, "; ".join(msgs)))
    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, m in failures:
            print(f"  {n}: {m[:500]}")
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    run(sf, sys.argv[2:])
