"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB
at a given sf, compare row count + column set + ORDER-SENSITIVE values
(the driver's hash is row-order-sensitive — r1's only red row was an
unpinned ordering — so rows are compared in returned order; columns are
sorted by name as the driver does; floats rounded).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return "<NA>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NA>"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.4f}"
    try:
        import datetime

        if isinstance(v, (datetime.date, datetime.datetime)):
            return str(v)[:19]
    except Exception:
        pass
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sig_rows = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sig_rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    passed, failed = [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: SPARK ERROR: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only check ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failed.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL {name}: ORACLE ERROR: {str(e)[:300]}")
            continue
        sc, ss = frame_signature(scols, srows)
        oc, os_ = frame_signature(ocols, orows)
        if sc != oc:
            failed.append((name, f"columns {sc} vs {oc}"))
            print(f"FAIL {name}: columns {sc} vs {oc}")
            continue
        if len(ss) != len(os_):
            failed.append((name, f"rowcount {len(ss)} vs {len(os_)}"))
            print(f"FAIL {name}: rowcount {len(ss)} vs {len(os_)}")
            continue
        bad = [(a, b) for a, b in zip(ss, os_) if a != b]
        if bad:
            failed.append((name, f"{len(bad)} mismatched rows"))
            print(f"FAIL {name}: {len(bad)}/{len(ss)} rows differ; first: {bad[0]}")
            continue
        passed.append(name)
        print(f"PASS {name} ({len(ss)} rows)")

    print(f"\n{len(passed)} passed, {len(failed)} failed")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
