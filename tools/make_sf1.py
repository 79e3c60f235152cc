"""Synthesize an sf1-scale bench dataset (10x sf0.1) by key-shifted
replication, preserving referential integrity across tables.

Each replica i shifts every key by i * (max_key + 1) within its key
domain (custkey, orderkey, partkey, suppkey, doc_id, vec_id, event_id,
user_id), so joins match exactly the rows they matched at sf0.1 and
group cardinalities scale 10x. The fixed dims region/nation keep their
TPC-H cardinality (5/25 — they do not scale in TPC-H either).

Usage: python tools/make_sf1.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 -> /root/repo/benchdata/sf1, factor 10.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

# table -> {column: key_domain}; un-listed key columns copy verbatim
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
FIXED = ["region", "nation"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/benchdata/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    # one offset per key domain = max over every column in that domain
    domain_max: dict[str, int] = {}
    for t, keycols in KEYED.items():
        for col, dom in keycols.items():
            m = con.sql(
                f"SELECT MAX({col}) FROM read_parquet('{src}/{t}.parquet')"
            ).fetchone()[0]
            domain_max[dom] = max(domain_max.get(dom, 0), int(m or 0))

    for t in FIXED:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    for t, keycols in KEYED.items():
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        sel = []
        for c in cols:
            if c in keycols:
                off = domain_max[keycols[c]] + 1
                sel.append(f"{c} + r.i * {off} AS {c}")
            else:
                sel.append(c)
        con.sql(
            f"""
            COPY (
              SELECT {', '.join(sel)}
              FROM read_parquet('{src}/{t}.parquet'), range({factor}) r(i)
            ) TO '{dst}/{t}.parquet' (FORMAT PARQUET)
            """
        )
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
