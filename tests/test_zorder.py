"""Z-order clustered writes: Morton key correctness, multi-dimensional
footer disjointness (the data-skipping property range clustering can't
give on a second dimension), and degenerate inputs."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from datar_polars_spark import read_parquet
from datar_polars_spark.sources import write_zordered, zorder_key

SF = "/root/testdata/sf0.001"


def _morton(xs: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for j, x in enumerate(xs):
            z |= ((x >> i) & 1) << (i * len(xs) + j)
    return z


def test_zorder_key_matches_reference_morton(spark):
    # ints 0..15 with min=0 max=15, bits=4 -> buckets == value, so the
    # key must equal the textbook Morton interleave
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = df.select(
        "x", "y", zorder_key(df, ["x", "y"], bits=4).alias("z")
    ).collect()
    for r in got:
        # width_bucket on a uniform 0..15 domain: bucket(v) = floor(v/ (15/16))
        bx = min(int(r["x"] / (15 / 16)), 15)
        by = min(int(r["y"] / (15 / 16)), 15)
        assert r["z"] == _morton([bx, by], 4)


def test_zorder_key_locality(spark):
    # points close in BOTH dims get closer z-keys than points far in
    # either dim (the clustering property, spot-checked)
    df = spark.createDataFrame(
        [(0, 0), (1, 1), (255, 255)], "x int, y int"
    )
    z = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key(df, ["x", "y"], bits=8).alias("z")
        ).collect()
    }
    assert abs(z[(0, 0)] - z[(1, 1)]) < abs(z[(0, 0)] - z[(255, 255)])


def _file_coverage(dest: str, col: str):
    """Per-file (min, max) of col from parquet footers."""
    out = []
    for fp in glob.glob(f"{dest}/*.parquet"):
        md = pq.ParquetFile(fp).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or st.min is None:
                continue
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out


def test_write_zordered_skips_on_both_dimensions(spark, tmp_path):
    li = read_parquet(spark, f"{SF}/lineitem.parquet")
    dest = str(tmp_path / "zorder")
    write_zordered(
        li, dest, by=["l_orderkey", "l_partkey"], bits=12, n_files=8
    )

    # round-trip integrity
    back = spark.read.parquet(dest)
    assert back.count() == li.df.count()
    a = li.df.agg(F.sum("l_extendedprice")).collect()[0][0]
    b = back.agg(F.sum("l_extendedprice")).collect()[0][0]
    assert a == pytest.approx(b)
    assert "__datar_z" not in back.columns

    # every file covers a narrow range on BOTH z-ordered dimensions
    for col in ("l_orderkey", "l_partkey"):
        lo = li.df.agg(F.min(col)).collect()[0][0]
        hi = li.df.agg(F.max(col)).collect()[0][0]
        domain = max(hi - lo, 1)
        covs = _file_coverage(dest, col)
        assert len(covs) >= 4
        fracs = [(mx - mn) / domain for mn, mx in covs]
        mean_frac = sum(fracs) / len(fracs)
        # random/row-order layout gives ~1.0 per file on both dims;
        # z-order with 8 files should be well under 0.6 on each
        assert mean_frac < 0.6, f"{col}: mean file coverage {mean_frac:.2f}"


def test_write_zordered_string_dimension(spark, tmp_path):
    doc = read_parquet(spark, f"{SF}/documents.parquet")
    dest = str(tmp_path / "zdoc")
    write_zordered(doc, dest, by=["lang", "n_chars"], bits=8, n_files=4)
    back = spark.read.parquet(dest)
    assert back.count() == doc.df.count()
    # hashed string dim still clusters: most files hold few langs
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.countDistinct("lang").alias("n"))
        .collect()
    )
    total_langs = doc.df.select("lang").distinct().count()
    assert min(r["n"] for r in per_file) < total_langs


def test_zorder_key_constant_and_null_column(spark):
    df = spark.createDataFrame(
        [(1, 7, None), (2, 7, None)], "a int, c int, s string"
    )
    z = df.select(zorder_key(df, ["a", "c"], bits=4).alias("z")).collect()
    assert len(z) == 2  # constant dim degrades to 0, no crash
    z2 = df.select(zorder_key(df, ["a", "s"], bits=4).alias("z")).collect()
    assert len(z2) == 2  # null string dim: hash(null) path, no crash


def test_zorder_explicit_stats_same_result(spark):
    df = spark.createDataFrame([(i, 2 * i) for i in range(64)], "x int, y int")
    auto = df.select(zorder_key(df, ["x", "y"], bits=6).alias("z")).collect()
    given = df.select(
        zorder_key(
            df, ["x", "y"], bits=6, stats={"x": (0, 63), "y": (0, 126)}
        ).alias("z")
    ).collect()
    assert [r["z"] for r in auto] == [r["z"] for r in given]


def test_zorder_validation(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError):
        zorder_key(df, ["a"], bits=4)
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b"], bits=33)
