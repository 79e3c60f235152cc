"""Driver contract for the spark-graft builder (PySpark target).

Every ``queries()`` entry runs a datar_polars_spark DSL pipeline (this
is the point — the gate exercises the engine, not raw Spark), and the
matching ``oracle_sql()`` entry is the ANSI-SQL equivalent DuckDB runs
on the same parquet views. Conventions for hash-stability:

* every computed/aggregate column is aliased identically on both sides;
* float results are rounded to 4 decimals on both sides (ROUND is the
  only float op whose exact result both engines agree on);
* timestamps are cast to DATE (or strings) on both sides;
* DuckDB integer SUMs are cast to BIGINT (DuckDB widens to HUGEINT);
* EVERY query ends in a total deterministic ordering (sort keys
  uniquely identify rows) mirrored by an ORDER BY in its oracle — the
  driver's value hash is row-order-sensitive. Spark ``arrange`` sorts
  NULLS LAST; DuckDB's default null order is also NULLS LAST.

Exactly 50 queries — every capability in the gate has a driver-visible
correctness row (the round-3 gate had 56 entries and the driver checks
only the first 50; round 4 merged six query pairs so nothing rides
outside the cap). Round-1 merges: q09/q18/q24/q36/q52/q54/q55/q56/q57/
q58 folded into surviving queries (anti_join->q08, setdiff->q17,
consecutive_id->q51, quality_score->q35, sketches->q20,
rowwise/c_across->q47, table_->q42, fill-up->q30, factor codes->q41,
IVF->q37). Round-4 merges (q08's multi-block 'op'-tag pattern):
pivot_longer->q26, fingerprint dedup->q33, multimodal codecs->q35,
LSH ANN->q37, SimHash consistency proof->q38, stateful streaming->q48.
Round-14 merge: fct_collapse->q41 ('coll' block), freeing the 50th
driver-checked slot for the audio perceptual-dedup family (q70).
Zero rows-only entries: every query hash-checks against its oracle.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datar_polars_spark import (
    f,
    read_parquet,
    select,
    rename,
    mutate,
    transmute,
    filter_,
    group_by,
    ungroup,
    rowwise,
    summarise,
    arrange,
    distinct,
    count,
    add_count,
    slice_min,
    slice_max,
    inner_join,
    left_join,
    semi_join,
    anti_join,
    bind_rows,
    intersect_,
    setdiff_,
    union_,
    union_all,
    rows_upsert,
    desc,
    col_sums,
    col_means,
    col_sds,
    col_medians,
)
from datar_polars_spark.functions import (
    sum_,
    mean,
    median,
    quantile,
    sd,
    n,
    n_distinct,
    min_,
    max_,
    lag,
    cumsum,
    min_rank,
    if_else,
    case_when,
    na_if,
    coalesce,
    between,
    grepl,
    toupper,
    substr,
    nchar,
    paste0,
    round_,
    floor,
    as_date,
    as_double,
    as_integer,
    consecutive_id,
    abs_,
    rbinom,
    rpois,
    row_sums,
    row_means,
    row_sds,
    row_medians,
    c_across,
)


def _t(spark: SparkSession, sf_dir: str, name: str):
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# queries — each returns the materialized Spark DataFrame (hidden columns
# dropped; the Tibble wrapper's .df after select of visible columns)
# ---------------------------------------------------------------------------

def _finish(td) -> DataFrame:
    return td.df.select(*td.columns)


def q01_pricing_summary(spark, sf):
    """TPC-H Q1 style: filter + group_by + summarise + arrange.
    Covers: filter_, group_by, summarise(sum/mean/n), arrange."""
    li = _t(spark, sf, "lineitem")
    out = (
        li
        >> filter_(f.l_shipdate <= as_date("1998-09-02"))
        >> group_by(f.l_returnflag, f.l_linestatus)
        >> summarise(
            # money sums in exact integer cents: floor(x*100) is an exact
            # IEEE754 op on identical inputs, so Spark and the oracle agree
            # bit-for-bit (float SUM + ROUND is tie-unstable across engines)
            sum_qty=sum_(as_integer(f.l_quantity), na_rm=True),
            sum_base_price_c=sum_(as_integer(floor(f.l_extendedprice * 100)), na_rm=True),
            sum_disc_price_c=sum_(
                as_integer(floor(f.l_extendedprice * (1 - f.l_discount) * 100)), na_rm=True
            ),
            avg_qty=round_(mean(f.l_quantity, na_rm=True), 4),
            avg_price=round_(mean(f.l_extendedprice, na_rm=True), 4),
            avg_disc=round_(mean(f.l_discount, na_rm=True), 4),
            count_order=n(),
        )
        >> arrange(f.l_returnflag, f.l_linestatus)
    )
    return _finish(out)


def q02_select_mutate(spark, sf):
    """Covers: select, mutate (arithmetic, sequential refs)."""
    li = _t(spark, sf, "lineitem")
    out = (
        li
        >> filter_(f.l_quantity >= 45)
        >> select(f.l_orderkey, f.l_linenumber, f.l_extendedprice, f.l_discount, f.l_tax)
        >> mutate(
            disc_price_c=as_integer(floor(f.l_extendedprice * (1 - f.l_discount) * 100)),
            charge_c=as_integer(
                floor(f.l_extendedprice * (1 - f.l_discount) * (1 + f.l_tax) * 100)
            ),
        )
        >> select(f.l_orderkey, f.l_linenumber, f.disc_price_c, f.charge_c)
        >> arrange(f.l_orderkey, f.l_linenumber)
    )
    return _finish(out)


def q03_filter_between_regex(spark, sf):
    """Covers: between, grepl (regex filter), string predicates."""
    p = _t(spark, sf, "part")
    out = (
        p
        >> filter_(between(f.p_size, 10, 20), grepl("^PROMO", f.p_type))
        >> select(f.p_partkey, f.p_name, f.p_type, f.p_size)
        >> arrange(f.p_partkey)
    )
    return _finish(out)


def q04_count_weighted(spark, sf):
    """Covers: count (weighted + plain)."""
    li = _t(spark, sf, "lineitem")
    out = (
        li
        >> count(f.l_returnflag, wt=f.l_quantity, name="total_qty")
        >> mutate(total_qty=round_(as_double(f.total_qty), 4))
        >> arrange(f.l_returnflag)
    )
    return _finish(out)


def q05_distinct(spark, sf):
    """Covers: distinct on a column subset."""
    o = _t(spark, sf, "orders")
    out = (
        o
        >> distinct(f.o_orderstatus, f.o_orderpriority)
        >> arrange(f.o_orderstatus, f.o_orderpriority)
    )
    return _finish(out)


def q06_join_revenue_per_nation(spark, sf):
    """Covers: inner_join chain (dims auto-broadcast by AQE), grouped agg."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    nat = _t(spark, sf, "nation")
    out = (
        o
        >> inner_join(c, by={"o_custkey": "c_custkey"})
        >> inner_join(nat, by={"c_nationkey": "n_nationkey"})
        >> group_by(f.n_name)
        >> summarise(
            revenue_c=sum_(as_integer(floor(f.o_totalprice * 100)), na_rm=True),
            n_orders=n(),
        )
        >> arrange(f.n_name)
    )
    return _finish(out)


def q07_left_join_zero_counts(spark, sf):
    """Covers: left_join with unmatched rows, count of non-null."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    big = o >> filter_(f.o_totalprice > 150000)
    out = (
        c
        >> left_join(big, by={"c_custkey": "o_custkey"})
        >> group_by(f.c_custkey, f.c_mktsegment)
        >> summarise(n_big=sum_(if_else(f.o_orderkey.is_null(), 0, 1), na_rm=True))
        >> arrange(f.c_custkey)
    )
    return _finish(out)


def q08_semi_anti_join(spark, sf):
    """Covers: semi_join + anti_join (merged r1 q08+q09), tagged and
    stacked with bind_rows so both verbs are hash-checked. r5: the semi
    leg first passes through bloom_semi_reduce (scale/bloom.py) — the
    Bloom pre-filter has zero false negatives and the exact semi_join
    eliminates its false positives, so the oracle is UNCHANGED; a bloom
    regression (a lost true match) flips the hash. Driver-proves the
    reduction's correctness-preservation contract."""
    from datar_polars_spark.scale import bloom_semi_reduce

    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    big = o >> filter_(f.o_totalprice > 200000)
    s = (
        bloom_semi_reduce(c, big.df, on=("c_custkey", "o_custkey"), fpp=0.05)
        >> semi_join(big, by={"c_custkey": "o_custkey"})
        >> mutate(op="semi")
    )
    a = (
        c
        >> anti_join(o >> filter_(f.o_totalprice > 300000), by={"c_custkey": "o_custkey"})
        >> mutate(op="anti")
    )
    out = (
        bind_rows(s, a)
        >> select(f.op, f.c_custkey, f.c_name)
        >> arrange(f.op, f.c_custkey)
    )
    return _finish(out)


def q10_topk_per_group(spark, sf):
    """Covers: slice_max (rank <= k with ties, grouped)."""
    o = _t(spark, sf, "orders")
    out = (
        o
        >> group_by(f.o_orderpriority)
        >> slice_max(f.o_totalprice, n=3)
        >> select(f.o_orderpriority, f.o_orderkey, f.o_totalprice)
        >> arrange(f.o_orderpriority, f.o_orderkey)
    )
    return _finish(out)


def q12_lag_cumsum(spark, sf):
    """Covers: lag with explicit ordering AND cumsum running total over
    the same grouped spine (merged r5 q11+q12 — identical partition and
    order keys, so one query proves both window capabilities on the
    same rows and frees a driver slot for q67_relevance)."""
    o = _t(spark, sf, "orders")
    out = (
        o
        >> group_by(f.o_custkey)
        >> mutate(
            prev_price=lag(f.o_totalprice, order_by=f.o_orderkey),
            delta=round_(f.o_totalprice - f.prev_price, 4),
            running=round_(cumsum(f.o_totalprice, order_by=f.o_orderkey), 4),
        )
        >> select(f.o_orderkey, f.o_custkey, f.delta, f.running)
        >> arrange(f.o_orderkey)
    )
    return _finish(out)


def q13_conditionals(spark, sf):
    """Covers: case_when, if_else, na_if, coalesce, derived group_by
    (merged former q13 + q14 to free a slot in the 50-query budget)."""
    li = _t(spark, sf, "lineitem")
    out = (
        li
        >> mutate(
            bucket=case_when(
                f.l_extendedprice < 20000, "small",
                f.l_extendedprice < 60000, "medium",
                _default="large",
            ),
            disc0=na_if(f.l_discount, 0.0),
            disc_filled=coalesce(f.disc0, -1.0),
            is_cheap=if_else(f.l_extendedprice < 20000, 1, 0),
        )
        >> group_by(f.bucket)
        >> summarise(
            n=n(),
            n_cheap=sum_(f.is_cheap, na_rm=True),
            n_no_disc=sum_(if_else(f.disc_filled == -1.0, 1, 0), na_rm=True),
        )
        >> arrange(f.bucket)
    )
    return _finish(out)


def q14_decontaminate(spark, sf):
    """Covers: contamination_report (GPT-3/PaLM-style word-n-gram
    decontamination; scale/filters.py) AND minhash_join fuzzy
    cross-corpus matching (scale/dedup.py; merged r5 for the 50-row
    driver cap). 'exact' block: benchmark = every 17th doc; corpus
    3-gram instances joined against broadcast distinct benchmark grams,
    counted per doc — corpus side never shuffles. 'fuzzy' block:
    train (non-benchmark docs) vs benchmark via MinHash-LSH banding
    (32 bands x 2 rows; candidate recall ~1-6e-15 at the corpus's
    j>=0.8 dup structure) with verify='exact', so per-train-doc
    matched-benchmark counts equal DuckDB's brute-force cross join."""
    from datar_polars_spark.scale import contamination_report
    from datar_polars_spark.scale.dedup import minhash_join

    d = _t(spark, sf, "documents")
    bench = d >> filter_(f.doc_id % 17 == 0)
    rep = (
        contamination_report(d, bench, text="text", id="doc_id", n=3)
        >> filter_(f.contaminated_ngrams > 0)
    )
    exact_block = _finish(rep).select(
        F.lit("exact").alias("op"),
        "doc_id",
        F.col("contaminated_ngrams").cast("bigint").alias("val"),
    )
    train = d >> filter_(f.doc_id % 17 != 0)
    hits = minhash_join(
        train, bench, f.text, f.doc_id,
        num_perm=64, bands=32, threshold=0.5, verify="exact",
    )
    fuzzy_block = (
        hits.df.groupBy("id_a")
        .agg(F.count_distinct("id_b").cast("bigint").alias("val"))
        .select(F.lit("fuzzy").alias("op"), F.col("id_a").alias("doc_id"), "val")
    )
    return exact_block.unionByName(fuzzy_block).orderBy("op", "doc_id")


def q15_string_functions(spark, sf):
    """Covers: toupper, substr, nchar, paste0."""
    c = _t(spark, sf, "customer")
    out = (
        c
        >> filter_(f.c_acctbal > 9000)
        >> transmute(
            c_custkey=f.c_custkey,
            seg_upper=toupper(f.c_mktsegment),
            name_pfx=substr(f.c_name, 1, 8),
            name_len=nchar(f.c_name),
            tag=paste0(f.c_mktsegment, "-", f.c_custkey),
        )
        >> arrange(f.c_custkey)
    )
    return _finish(out)


def q16_bind_rows(spark, sf):
    """Covers: bind_rows / UNION ALL (disjoint slices -> o_orderkey is a
    unique sort key)."""
    o = _t(spark, sf, "orders")
    hi = o >> filter_(f.o_totalprice > 250000) >> select(f.o_orderkey, f.o_totalprice)
    lo = o >> filter_(f.o_totalprice < 10000) >> select(f.o_orderkey, f.o_totalprice)
    out = (
        bind_rows(hi, lo)
        >> mutate(o_totalprice=round_(f.o_totalprice, 4))
        >> arrange(f.o_orderkey)
    )
    return _finish(out)


def q17_set_ops(spark, sf):
    """Covers: intersect_/setdiff_/union_ (merged r1 q17+q18), tagged
    and stacked so all three table set ops are hash-checked."""
    o = _t(spark, sf, "orders")
    a = o >> filter_(f.o_totalprice > 100000) >> distinct(f.o_custkey)
    b = o >> filter_(f.o_orderstatus == "F") >> distinct(f.o_custkey)
    i = intersect_(a, b) >> mutate(op="intersect")
    s = setdiff_(
        o >> distinct(f.o_custkey),
        o >> filter_(f.o_orderstatus == "O") >> distinct(f.o_custkey),
    ) >> mutate(op="setdiff")
    u = union_(a, b) >> mutate(op="union")
    out = (
        bind_rows(i, s, u)
        >> select(f.op, f.o_custkey)
        >> arrange(f.op, f.o_custkey)
    )
    return _finish(out)


def q19_quantiles(spark, sf):
    """Covers: median, quantile (linear interpolation), sd."""
    li = _t(spark, sf, "lineitem")
    out = (
        li
        >> group_by(f.l_returnflag)
        >> summarise(
            med_price=round_(median(f.l_extendedprice, na_rm=True), 4),
            p90_price=round_(quantile(f.l_extendedprice, 0.9, na_rm=True), 4),
            sd_price=round_(sd(f.l_extendedprice, na_rm=True), 4),
        )
        >> arrange(f.l_returnflag)
    )
    return _finish(out)


def q20_n_distinct(spark, sf):
    """Covers: n_distinct + HyperLogLog++ sketch (merged r1 q52): the
    approx distinct estimate is checked against the exact count within
    the sketch's rsd bound; the oracle sees exact counts + TRUE."""
    from datar_polars_spark.functions.registry import builder

    approx_n_distinct = builder("approx_n_distinct")
    li = _t(spark, sf, "lineitem")
    out = (
        li
        >> group_by(f.l_returnflag)
        >> summarise(
            n_parts=n_distinct(f.l_partkey),
            n_supps=n_distinct(f.l_suppkey),
            n_rows=n(),
            _est=approx_n_distinct(f.l_partkey, rsd=0.02),
            within_bounds=abs_((f._est - f.n_parts) / f.n_parts) < 0.06,
        )
        >> arrange(f.l_returnflag)
    )
    return _finish(out)


def q21_slice_min(spark, sf):
    """Covers: slice_min (grouped, with ties)."""
    p = _t(spark, sf, "part")
    out = (
        p
        >> group_by(f.p_brand)
        >> slice_min(f.p_retailprice, n=1)
        >> select(f.p_brand, f.p_partkey, f.p_retailprice)
        >> arrange(f.p_brand, f.p_partkey)
    )
    return _finish(out)


def q22_group_deviation(spark, sf):
    """Covers: grouped mutate window aggregate + filter on it."""
    li = _t(spark, sf, "lineitem")
    out = (
        li
        >> group_by(f.l_suppkey)
        >> mutate(supp_avg=mean(f.l_extendedprice, na_rm=True))
        >> filter_(f.l_extendedprice > 2 * f.supp_avg)
        >> transmute(
            l_orderkey=f.l_orderkey,
            l_linenumber=f.l_linenumber,
            l_suppkey=f.l_suppkey,
            ratio=round_(f.l_extendedprice / f.supp_avg, 4),
        )
        >> arrange(f.l_orderkey, f.l_linenumber, f.l_suppkey, f.ratio)
    )
    return _finish(out)


def q23_events_daily(spark, sf):
    """Covers: timestamp handling, multi-key group, mean (carried as an
    exact fixed-point SUM + count: ROUND(AVG(x), 4) is tie-unstable
    across engines when a group mean lands on a .00005 boundary — it
    DID at sf0.001 — while per-row floor(x*10000) is identical IEEE
    math in both engines and the integer sum is exact; the q01/q45
    playbook convention)."""
    e = _t(spark, sf, "events")
    out = (
        e
        >> mutate(day=f.ts.cast("date").cast("string"))
        >> group_by(f.day, f.event_type)
        >> summarise(
            n_events=n(),
            value_sum_e4=sum_(
                as_integer(floor(f.value * 10000)), na_rm=True
            ),
        )
        >> arrange(f.day, f.event_type)
    )
    return _finish(out)


def q25_rows_upsert(spark, sf):
    """Covers: rows_upsert keyed DML AND (r6, merged under the 50-row
    cap) the write_zordered sink, driver-proven end to end: orders is
    written z-ordered on (o_custkey, o_orderdate) to a temp dir, read
    back through a two-dimensional box predicate, and the block emits
    (a) 'zorder_agg' — row count + money sum of the box, which the
    oracle recomputes from the ORIGINAL orders table (a clustered
    LAYOUT must never change ANSWERS), and (b) 'zorder_pruned' —
    key=1 iff the parquet footers prove at least one file is skippable
    for the box on BOTH dimensions (min/max overlap test, the same
    metadata Spark's scan pruning consumes), val = the overlap
    fraction rounded down to prove it's < 1. Output unified as
    (op, key, val) with a total order; money summed as integer cents
    (playbook fixed-point convention)."""
    import tempfile

    c = _t(spark, sf, "customer")
    x = c >> select(f.c_custkey, f.c_acctbal) >> filter_(f.c_custkey <= 1000)
    y = (
        c
        >> filter_(f.c_acctbal > 5000)
        >> transmute(c_custkey=f.c_custkey, c_acctbal=round_(f.c_acctbal * 2, 4))
    )
    ups = (
        rows_upsert(x, y, by=f.c_custkey)
        >> mutate(c_acctbal=round_(f.c_acctbal, 4))
    )
    up_block = _finish(ups).select(
        F.lit("upsert").alias("op"),
        F.col("c_custkey").cast("bigint").alias("key"),
        F.col("c_acctbal").cast("double").alias("val"),
    )

    from datar_polars_spark.sources import write_zordered

    o = _t(spark, sf, "orders")
    dest = tempfile.mkdtemp(prefix="q25_zorder_")
    write_zordered(o, dest, by=["o_custkey", "o_orderdate"], n_files=8)
    zo = read_parquet(spark, dest)
    lo_k, hi_k = 100, 400
    lo_d, hi_d = "1995-01-01", "1995-12-31"
    box = zo >> filter_(
        (f.o_custkey >= lo_k) & (f.o_custkey <= hi_k),
        (f.o_orderdate >= lo_d) & (f.o_orderdate <= hi_d),
    )
    agg = _finish(box).agg(
        F.count(F.lit(1)).cast("bigint").alias("key"),
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        ).cast("double").alias("val"),
    ).select(F.lit("zorder_agg").alias("op"), "key", F.coalesce("val", F.lit(0.0)).alias("val"))

    # footer-level pruning proof: a file is skippable when its min/max
    # box on EITHER dim misses the predicate box
    import datetime as _dt
    import glob as _glob

    import pyarrow.parquet as _pq

    files = sorted(_glob.glob(f"{dest}/*.parquet"))
    overlapping = 0
    for fp in files:
        md = _pq.ParquetFile(fp).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        k_lo = min(md.row_group(r).column(idx["o_custkey"]).statistics.min for r in range(md.num_row_groups))
        k_hi = max(md.row_group(r).column(idx["o_custkey"]).statistics.max for r in range(md.num_row_groups))
        d_lo = min(md.row_group(r).column(idx["o_orderdate"]).statistics.min for r in range(md.num_row_groups))
        d_hi = max(md.row_group(r).column(idx["o_orderdate"]).statistics.max for r in range(md.num_row_groups))
        if isinstance(d_lo, _dt.datetime):
            d_lo, d_hi = d_lo.date(), d_hi.date()
        if isinstance(d_lo, _dt.date):
            lo_dd = _dt.date.fromisoformat(lo_d)
            hi_dd = _dt.date.fromisoformat(hi_d)
        else:
            lo_dd, hi_dd = lo_d, hi_d
        if k_hi >= lo_k and k_lo <= hi_k and d_hi >= lo_dd and d_lo <= hi_dd:
            overlapping += 1
    pruned_ok = 1 if (files and overlapping < len(files)) else 0
    frac = overlapping / max(len(files), 1)
    proof = spark.createDataFrame(
        [("zorder_pruned", pruned_ok, float(int(frac < 1.0)))],
        "op string, key bigint, val double",
    )
    return (
        up_block.unionByName(agg)
        .unionByName(proof)
        .orderBy("op", "key", "val")
    )


def q26_pivot(spark, sf):
    """Covers: pivot_wider AND pivot_longer (merged r4 q26+q27 for the
    50-row driver cap). Block 'li' round-trips lineitem counts through
    pivot_wider(values_fill=0) then pivot_longer over the data-dependent
    status columns — the round-trip must reproduce the COMPLETE
    returnflag x status grid with zero-filled holes, which the oracle
    states as a cross join + COALESCE. Block 'part' keeps r1's original
    pivot_longer path (numeric wide frame, double harmonization).
    Both blocks project to one (op, key, metric, val) schema."""
    from datar_polars_spark import pivot_longer, pivot_wider

    li = _t(spark, sf, "lineitem")
    wide = (
        li
        >> count(f.l_returnflag, f.l_linestatus)
        >> pivot_wider(names_from=f.l_linestatus, values_from=f.n, values_fill=0)
    )
    status_cols = [c for c in wide.columns if c != "l_returnflag"]
    long_li = (
        wide
        >> pivot_longer(status_cols, names_to="metric", values_to="val")
        >> mutate(val=as_double(f.val))
    )
    li_block = _finish(long_li).select(
        F.lit("li").alias("op"),
        F.col("l_returnflag").alias("key"),
        "metric",
        "val",
    )

    p = _t(spark, sf, "part")
    long_p = (
        p
        >> select(f.p_partkey, f.p_retailprice, f.p_size)
        >> mutate(p_size=as_double(f.p_size))
        >> pivot_longer([f.p_retailprice, f.p_size], names_to="metric", values_to="val")
        >> mutate(val=round_(f.val, 4))
    )
    p_block = _finish(long_p).select(
        F.lit("part").alias("op"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key"),
        "metric",
        "val",
    )
    return li_block.unionByName(p_block).orderBy("op", "key", "metric")


def q28_separate_unite(spark, sf):
    """Covers: separate (regex split to columns), unite (concat)."""
    p = _t(spark, sf, "part")
    from datar_polars_spark import separate, unite

    out = (
        p
        >> select(f.p_partkey, f.p_type, f.p_brand)
        >> separate(f.p_type, [f.t1, f.t2], sep=" ", extra="merge", remove=False)
        >> unite("brand_type", f.p_brand, f.t1, sep=":")
        >> select(f.p_partkey, f.brand_type, f.t2)
        >> arrange(f.p_partkey)
    )
    return _finish(out)


def q29_separate_rows_uncount(spark, sf):
    """Covers: separate_rows (explode split) AND uncount (row
    replication): tags = 'lang,source' split to rows, then each row
    replicated w times."""
    d = _t(spark, sf, "documents")
    from datar_polars_spark import separate_rows, uncount

    out = (
        d
        >> filter_(f.doc_id < 50)
        >> transmute(
            doc_id=f.doc_id,
            lang=f.lang,
            tags=paste0(f.lang, ",", f.source),
            w=as_integer(f.n_chars % 3),
        )
        >> separate_rows(f.tags, sep=",")
        >> uncount(f.w)
        >> arrange(f.doc_id, f.tags)
    )
    return _finish(out)


def q30_fill_gaps(spark, sf):
    """Covers: fill down AND up per group over explicit order (merged
    r1 q30+q56)."""
    o = _t(spark, sf, "orders")
    from datar_polars_spark import fill

    out = (
        o
        >> transmute(
            o_custkey=f.o_custkey,
            o_orderkey=f.o_orderkey,
            bp=if_else(f.o_totalprice > 150000, round_(f.o_totalprice, 4), None),
        )
        >> mutate(bp_dn=f.bp, bp_up=f.bp)
        >> arrange(f.o_orderkey)
        >> group_by(f.o_custkey)
        >> fill(f.bp_dn, _direction="down")
        >> fill(f.bp_up, _direction="up")
        >> select(f.o_orderkey, f.o_custkey, f.bp_dn, f.bp_up)
        >> arrange(f.o_orderkey)
    )
    return _finish(out)


def q31_nest_unnest_roundtrip(spark, sf):
    """Covers: nest (collect_list struct) + unnest (explode) roundtrip."""
    o = _t(spark, sf, "orders")
    from datar_polars_spark import nest, unnest

    out = (
        o
        >> select(f.o_custkey, f.o_orderkey, f.o_totalprice)
        >> nest(data=[f.o_orderkey, f.o_totalprice])
        >> unnest(f.data)
        >> mutate(o_totalprice=round_(f.o_totalprice, 4))
        >> arrange(f.o_orderkey)
    )
    return _finish(out)


def q32_complete_grid(spark, sf):
    """Covers: expand/complete (grid + left join + fill)."""
    li = _t(spark, sf, "lineitem")
    from datar_polars_spark import complete

    out = (
        li
        >> count(f.l_returnflag, f.l_linestatus)
        >> complete(f.l_returnflag, f.l_linestatus, fill={"n": 0})
        >> arrange(f.l_returnflag, f.l_linestatus)
    )
    return _finish(out)


def q33_dedup(spark, sf):
    """Covers: exact deduplication (hash-groupBy keep-min-id) AND
    document fingerprinting (md5 of normalized text) + fingerprint-keyed
    dedup (merged r4 q33+q34 for the 50-row driver cap), exact-substring
    duplicate spans (r5), and (r7) destructive span MASKING in both
    keep='all' and keep='first' variants. All blocks project to one
    (op, key, n_copies, keep_id) schema; the 'exact' block's n_copies is
    NULL (dedup_exact emits survivors, not group sizes — the fp block
    covers the counted path)."""
    from datar_polars_spark.functions.registry import builder
    from datar_polars_spark.scale import dedup_exact
    from datar_polars_spark.tibble import Tibble

    d = _t(spark, sf, "documents")
    ex = (
        dedup_exact(d, f.lang, f.source, id_col=f.doc_id)
        >> select(f.doc_id, f.lang, f.source)
    )
    # Null-symmetric key: concat_ws SKIPS nulls while SQL `||` yields
    # NULL, so both sides coalesce each field to a sentinel first — a
    # NULL lang/source then hashes identically in Spark and the oracle.
    ex_block = _finish(ex).select(
        F.lit("exact").alias("op"),
        F.concat_ws(
            "|",
            F.coalesce(F.col("lang"), F.lit("<NA>")),
            F.coalesce(F.col("source"), F.lit("<NA>")),
        ).alias("key"),
        F.lit(None).cast("long").alias("n_copies"),
        F.col("doc_id").alias("keep_id"),
    )

    # r14 'best' block: quality-based winner selection — keep_by picks
    # the LONGEST text per (lang, source) cluster (keep='max', ties to
    # the smallest doc_id), stated in the oracle as an arg-max window.
    # Any defect in the quality ordering, NULL-quality-loses, or the
    # id tiebreak breaks this value hash.
    best = dedup_exact(
        Tibble(
            d.df.select(*d.columns).withColumn(
                "tlen", F.length("text").cast("long")
            )
        ),
        "lang", "source", id_col="doc_id", keep_by="tlen", keep="max",
    )
    best_block = best.df.select(
        F.lit("best").alias("op"),
        F.concat_ws(
            "|",
            F.coalesce(F.col("lang"), F.lit("<NA>")),
            F.coalesce(F.col("source"), F.lit("<NA>")),
        ).alias("key"),
        F.col("tlen").alias("n_copies"),
        F.col("doc_id").alias("keep_id"),
    )

    doc_fingerprint = builder("doc_fingerprint")
    fp = (
        d
        >> mutate(fp=doc_fingerprint(f.text))
        >> group_by(f.fp)
        >> summarise(n_copies=n(), keep_id=min_(f.doc_id, na_rm=True))
    )
    fp_block = _finish(fp).select(
        F.lit("fp").alias("op"),
        F.col("fp").alias("key"),
        "n_copies",
        "keep_id",
    )

    # r5 third block: exact-substring duplicate spans (Lee et al. style
    # repeated 8-gram runs; scale/substr.py). key = the merged span
    # list rendered "start-end,...", n_copies = duplicated word count.
    # Span keys repeat across near-identical docs, so the total order
    # adds keep_id.
    from datar_polars_spark.scale import duplicate_spans

    sp = duplicate_spans(d, text=f.text, id=f.doc_id, k=8, min_count=2)
    sp_block = sp.df.select(
        F.lit("spans").alias("op"),
        F.concat_ws(
            ",",
            F.transform(
                F.col("dup_spans"),
                lambda s: F.concat_ws("-", s["start"], s["end"]),
            ),
        ).alias("key"),
        F.col("dup_words").cast("long").alias("n_copies"),
        F.col("doc_id").alias("keep_id"),
    )

    # r7 fourth block: destructive span masking, BOTH variants — 'all'
    # (the paper's self-join behavior, every occurrence cut) and
    # 'first' (the globally-first occurrence of each duplicated gram
    # survives). One row per variant: n_copies = corpus-wide surviving
    # word count after the rewrite, keep_id = number of documents whose
    # text changed; the oracle recomputes both from flagged gram
    # positions (keep='first' excludes each gram's min (doc_id, pos)
    # occurrence before the coverage union).
    from datar_polars_spark.scale import mask_duplicate_spans

    def _wc(c):
        return F.size(
            F.filter(
                F.split(F.trim(F.coalesce(c, F.lit(""))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        )

    ow = d.df.select(F.col("doc_id"), _wc(F.col("text")).alias("__ow"))
    mask_blocks = []
    for keep in ("all", "first"):
        m = mask_duplicate_spans(
            d, text=f.text, id=f.doc_id, k=8, min_count=2, keep=keep
        ).df
        agg = (
            m.select("doc_id", _wc(F.col("text")).alias("__mw"))
            .join(ow, "doc_id")
            .agg(
                F.sum("__mw").cast("long").alias("n_copies"),
                F.sum((F.col("__mw") < F.col("__ow")).cast("int"))
                .cast("long")
                .alias("keep_id"),
            )
            .select(
                F.lit("mask").alias("op"),
                F.lit(keep).alias("key"),
                "n_copies",
                "keep_id",
            )
        )
        mask_blocks.append(agg)
    return (
        ex_block.unionByName(best_block)
        .unionByName(fp_block)
        .unionByName(sp_block)
        .unionByName(mask_blocks[0])
        .unionByName(mask_blocks[1])
        .orderBy("op", "key", "keep_id")
    )


def q35_text_stats(spark, sf):
    """Covers: token counting, text-quality metrics, composite quality
    scoring (merged r1 q35+q36) AND the multimodal binary-column
    plumbing + REAL header codecs (merged r4 q35+q59 for the 50-row
    driver cap). Per doc we synthesize a genuine image header — PNG for
    even doc_id, little-endian TIFF (IFD walk, NEW r4 codec) for odd —
    with width = doc_id % 1000 + 1, height = n_chars % 1000 + 1, and a
    genuine audio container — WAV (16 kHz, n_chars*10 samples) for even
    doc_id, CBR MP3 (44.1 kHz, (n_chars % 20 + 1) frames x 1152
    samples, NEW r4 codec) for odd, and (NEW r7) a genuine MP4 movie —
    v0 32-bit boxes for even doc_id, v1 64-bit + largesize moov for odd
    — with dims (doc_id % 1280 + 16) x (n_chars % 720 + 16) and
    duration (n_chars % 300 + 1) s, so BOTH ISO-BMFF layouts are
    driver-proven. The Arrow-batched STRICT decode passes parse the
    bytes with the pure-Python codecs (scale/codecs.py), then
    everything rolls up per lang; the oracle recomputes every decoded
    field arithmetically from doc_id/n_chars, so a parser regression
    flips the hash."""
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from datar_polars_spark.functions.registry import builder
    from datar_polars_spark.scale import attach_binary_metadata, image_features
    from datar_polars_spark.scale.codecs import make_mp3, make_png, make_tiff, make_wav
    from datar_polars_spark.scale.multimodal import decode_audio, decode_images
    from datar_polars_spark.tibble import Tibble

    token_count = builder("token_count")
    punct_ratio = builder("punct_ratio")
    mean_word_length = builder("mean_word_length")
    quality_score = builder("quality_score")
    flesch_reading_ease = builder("flesch_reading_ease")
    type_token_ratio = builder("type_token_ratio")

    @F.pandas_udf(BinaryType())
    def img_bytes(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
        out = []
        for d_, n_ in zip(doc_id, n_chars):
            w, h = int(d_) % 1000 + 1, int(n_) % 1000 + 1
            out.append(make_png(w, h) if int(d_) % 2 == 0 else make_tiff(w, h))
        return pd.Series(out)

    @F.pandas_udf(BinaryType())
    def aud_bytes(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
        out = []
        for d_, n_ in zip(doc_id, n_chars):
            if int(d_) % 2 == 0:
                out.append(make_wav(16_000, int(n_) * 10))
            else:
                out.append(make_mp3(44_100, int(n_) % 20 + 1))
        return pd.Series(out)

    # r7: synthesized MP4 movies — v0 32-bit and v1 64-bit + largesize
    # box layouts both driver-proven; r10 adds WebM (doc_id % 4 == 2)
    # and Matroska (% 4 == 3) via the EBML element walk, so all four
    # real video-probe paths run in the gate. Dims/duration derive from
    # (doc_id, n_chars) so the SQL oracle recomputes them exactly.
    @F.pandas_udf(BinaryType())
    def vid_bytes(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
        from datar_polars_spark.scale.codecs import make_mp4, make_webm

        out = []
        for d_, n_ in zip(doc_id, n_chars):
            d_, n_ = int(d_), int(n_)
            w, h = d_ % 1280 + 16, n_ % 720 + 16
            dur = (n_ % 300 + 1) * 1000
            leg = d_ % 4
            if leg == 0:
                out.append(make_mp4(w, h, dur, version=0))
            elif leg == 1:
                out.append(make_mp4(w, h, dur, version=1, large_moov=True))
            elif leg == 2:
                out.append(make_webm(w, h, dur))
            else:
                out.append(
                    make_webm(w, h, dur, doctype="matroska",
                              duration_double=True)
                )
        return pd.Series(out)

    # r13 dhash leg: PIXEL-bearing images (not just headers) —
    # template raster keyed by doc_id % 4, a uniform brightness shift
    # by (doc_id//4) % 3, container PNG/BMP by (doc_id//8) % 2. dHash
    # is invariant to a uniform shift (adjacent-cell comparisons) and
    # to the container (same raster through either pixel decoder), so
    # the distinct fingerprints per lang must equal the distinct
    # templates present — the oracle states that relationally; a
    # raster-decode or hash regression splits a template group and
    # flips the hash.
    @F.pandas_udf(BinaryType())
    def pix_bytes(doc_id: pd.Series) -> pd.Series:
        import numpy as np

        from datar_polars_spark.scale.codecs import (
            make_bmp_pixels,
            make_png_pixels,
        )

        out = []
        for d_ in doc_id:
            d_ = int(d_)
            rng = np.random.default_rng(d_ % 4)
            img = (
                rng.integers(0, 247, (16, 24, 3), dtype=np.uint8)
                + 3 * ((d_ // 4) % 3)
            ).astype(np.uint8)
            out.append(
                make_png_pixels(img)
                if (d_ // 8) % 2 == 0
                else make_bmp_pixels(img)
            )
        return pd.Series(out)

    d = _t(spark, sf, "documents")
    staged = d >> mutate(
        tokens=token_count(f.text),
        punct=round_(punct_ratio(f.text), 4),
        mwl=round_(mean_word_length(f.text), 4),
        q=quality_score(f.text, min_chars=100, max_chars=10000),
        # r12 readability leg: Flesch reading ease + type-token ratio
        fre=round_(flesch_reading_ease(f.text), 4),
        ttr=round_(type_token_ratio(f.text), 4),
    )
    binary = staged.with_df(
        staged.df.withColumn("content", F.encode(F.col("text"), "utf-8"))
        .withColumn("img", img_bytes(F.col("doc_id"), F.col("n_chars")))
        .withColumn("aud", aud_bytes(F.col("doc_id"), F.col("n_chars")))
        .withColumn("vid", vid_bytes(F.col("doc_id"), F.col("n_chars")))
        .withColumn("pix", pix_bytes(F.col("doc_id")))
        .withColumn("tmpl", F.col("doc_id") % 4)
    )
    feats = image_features(
        attach_binary_metadata(binary, "content"), content="content", dim=16
    )
    imgs = decode_images(feats, content="img", strict=True)
    imgs = imgs.with_df(
        imgs.df.withColumnsRenamed(
            {"format": "img_format", "width": "img_w", "height": "img_h"}
        )
    )
    decoded = decode_audio(imgs, content="aud", strict=True)
    decoded = decoded.with_df(
        decoded.df.withColumnRenamed("format", "aud_format")
    )
    from datar_polars_spark.scale import decode_video, image_dhash

    decoded = decode_video(decoded, content="vid", strict=True)
    decoded = image_dhash(decoded, content="pix", out_col="dhash",
                          strict=True)
    per_doc = decoded.df.select(
        "lang",
        "dhash",
        "tmpl",
        "tokens",
        "mwl",
        "q",
        "fre",
        "ttr",
        F.col("media.n_bytes").alias("n_bytes"),
        F.size("features").alias("feat_dim"),
        "img_format",
        "img_w",
        "img_h",
        "aud_format",
        "sample_rate",
        "n_samples",
        F.col("format").alias("vid_format"),
        "vid_w",
        "vid_h",
        "duration_ms",
    )
    out = (
        Tibble(per_doc)
        >> group_by(f.lang)
        >> summarise(
            n_docs=n(),
            total_tokens=sum_(f.tokens, na_rm=True),
            avg_mwl=round_(mean(f.mwl, na_rm=True), 4),
            avg_fre=round_(mean(f.fre, na_rm=True), 4),
            avg_ttr=round_(mean(f.ttr, na_rm=True), 4),
            n_hq=sum_(if_else(f.q >= 0.8, 1, 0), na_rm=True),
            bytes_sum=sum_(f.n_bytes, na_rm=True),
            feat_dim_max=max_(f.feat_dim, na_rm=True),
            n_png=sum_(if_else(f.img_format == "png", 1, 0), na_rm=True),
            n_tiff=sum_(if_else(f.img_format == "tiff", 1, 0), na_rm=True),
            img_w_sum=sum_(f.img_w, na_rm=True),
            img_h_sum=sum_(f.img_h, na_rm=True),
            n_wav=sum_(if_else(f.aud_format == "wav", 1, 0), na_rm=True),
            n_mp3=sum_(if_else(f.aud_format == "mp3", 1, 0), na_rm=True),
            rate_sum=sum_(f.sample_rate, na_rm=True),
            samples_sum=sum_(f.n_samples, na_rm=True),
            n_mp4=sum_(if_else(f.vid_format == "mp4", 1, 0), na_rm=True),
            n_webm=sum_(if_else(f.vid_format == "webm", 1, 0), na_rm=True),
            n_mkv=sum_(if_else(f.vid_format == "mkv", 1, 0), na_rm=True),
            vid_w_sum=sum_(f.vid_w, na_rm=True),
            vid_h_sum=sum_(f.vid_h, na_rm=True),
            duration_sum=sum_(f.duration_ms, na_rm=True),
            # distinct perceptual fingerprints == distinct templates:
            # brightness-shift AND container invariance in one number
            n_dhash=n_distinct(f.dhash),
            n_tmpl=n_distinct(f.tmpl),
        )
        >> arrange(f.lang)
    )
    return _finish(out)


def q37_ann_topk(spark, sf):
    """Covers: brute-force cosine top-k, IVF ANN (merged r1 q37+q58)
    AND LSH-bucketed ANN (merged r4 q37+q40 for the 50-row driver cap),
    all method-tagged in one output. IVF probes every cluster here, so
    brute and ivf are exact and hash-match the same oracle rows. The
    lsh block keeps q40's planted-neighbor construction: random
    embeddings give LSH nothing to find (all cosines ~0), so 10 TRUE
    near-neighbors of the query are planted (q_v + 0.25*v_i, ids
    10001..10010) — the exact top-10 is the planted set, LSH must
    retrieve it from its probed buckets, and the oracle recomputes the
    same construction + exact top-10 in SQL. NEW r5: a 'knn{q}' block
    runs the batch k-NN JOIN (every query row gets its top-k corpus
    rows — broadcast queries x corpus scan + map-side WindowGroupLimit)
    for queries 1..3, k=5; the oracle recomputes it with a ROW_NUMBER
    window over all pairs. NEW r7: an 'ivfpq_check' block proves the
    IVF-PQ composition (coarse cells + residual PQ codes) exact at
    nprobe = nlist against an in-Spark centroid+residual reconstruction
    brute force — symmetric difference pinned at 0."""
    from datar_polars_spark.scale import (
        cosine_topk,
        ivf_assign,
        ivf_topk,
        ivf_train,
        knn_join,
        lsh_topk,
    )
    from datar_polars_spark.tibble import Tibble

    e = _t(spark, sf, "embeddings")
    qv = [float(v) for v in e.df.filter("vec_id = 0").select("embedding").first()[0]]
    brute = cosine_topk(e, qv, f.embedding, f.vec_id, k=10).df.select(
        F.lit("brute").alias("method"), "vec_id", F.round("cosine", 4).alias("cosine")
    )
    cents = ivf_train(e, f.embedding, n_clusters=16, iters=3, seed=11)
    a = ivf_assign(e, cents, f.embedding)
    ivf = ivf_topk(a, qv, cents, f.embedding, f.vec_id, k=10, nprobe=16).df.select(
        F.lit("ivf").alias("method"), "vec_id", F.round("cosine", 4).alias("cosine")
    )

    base = e.df.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    planted = (
        base.filter(F.col("vec_id").between(1, 10))
        .crossJoin(base.filter("vec_id = 0").select(F.col("embedding").alias("qe")))
        .select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            F.zip_with("qe", "embedding", lambda x, y: x + 0.25 * y).alias("embedding"),
        )
    )
    corpus = Tibble(base.unionByName(planted))
    qv2 = [float(v) for v in base.filter("vec_id = 0").select("embedding").first()[0]]
    lsh = lsh_topk(corpus, qv2, f.embedding, f.vec_id, k=10, probe_hamming=4).df.select(
        F.lit("lsh").alias("method"), "vec_id", F.round("cosine", 4).alias("cosine")
    )
    queries = Tibble(e.df.filter(F.col("vec_id").between(1, 3)))
    knn = knn_join(queries, e, k=5).df.select(
        F.concat(F.lit("knn"), F.col("query_id").cast("string")).alias("method"),
        F.col("match_id").alias("vec_id"),
        F.round("cosine", 4).alias("cosine"),
    )

    # r6 'pq_check' block: BATCH product-quantization retrieval
    # (pq_knn_join, stacked per-query LUTs, one Arrow pass) proven
    # against a full-resolution brute force computed IN SPARK: every
    # corpus code is decoded to its centroid reconstruction (codebook
    # rides a broadcast single-row frame, JVM element_at lookups) and
    # exact L2^2 to each query is ranked by a per-query window. The
    # k-means codebook is seed-defined, so no SQL oracle can recompute
    # it; instead the block emits the SYMMETRIC DIFFERENCE COUNT of
    # (query, match, rank) between the two paths, which the oracle pins
    # at 0 — the same loss-proof pattern as q38's simhash_check.
    from datar_polars_spark.scale import pq_encode, pq_knn_join, pq_train

    book = pq_train(e, f.embedding, m=4, nbits=6, sample_size=2000, seed=7)
    coded = pq_encode(e, book)
    batch = pq_knn_join(
        queries, coded, book, k=5,
        query_id="vec_id", query_embedding="embedding",
        id_col="vec_id", code_col="pq_code",
    ).df.select("query_id", "match_id", "rank")

    m_sub = len(book)
    book_df = spark.createDataFrame(
        [(book,)], "bk array<array<array<double>>>"
    )
    rec = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(m_sub)),
            lambda j: F.element_at(
                F.element_at(F.col("bk"), j),
                F.element_at(F.col("pq_code"), j) + F.lit(1),
            ),
        )
    )
    qside = e.df.filter(F.col("vec_id").between(1, 3)).select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("__qe"),
    )
    exact = (
        coded.df.select(F.col("vec_id").alias("match_id"), "pq_code")
        .crossJoin(F.broadcast(book_df))
        .withColumn("__rec", rec)
        .crossJoin(F.broadcast(qside))
        .withColumn(
            "__d",
            F.aggregate(
                F.zip_with("__qe", "__rec", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("__d").asc(), F.col("match_id").asc()
                )
            ),
        )
        .filter(F.col("rank") <= 5)
        .select("query_id", "match_id", "rank")
    )
    keys = ["query_id", "match_id", "rank"]
    d1 = batch.join(exact, keys, "left_anti").agg(
        F.count(F.lit(1)).alias("c1")
    )
    d2 = exact.join(batch, keys, "left_anti").agg(
        F.count(F.lit(1)).alias("c2")
    )
    pq_check = d1.crossJoin(d2).select(
        F.lit("pq_check").alias("method"),
        (F.col("c1") + F.col("c2")).cast("bigint").alias("vec_id"),
        F.lit(0.0).alias("cosine"),
    )

    # r7 'ivfpq_check' block: IVF-PQ retrieval (coarse cells + RESIDUAL
    # PQ codes, the billion-vector composition) at nprobe = nlist is
    # the exact ADC ranking over residual codes — proven against an
    # in-Spark full-resolution brute force that reconstructs every code
    # as centroid[cell] + residual-codebook decode (both tables ride
    # broadcast single-row frames, JVM element_at lookups) and ranks
    # exact L2^2 per query. Emits the symmetric-difference count of
    # (query, match, rank), pinned at 0 by the oracle — the same
    # loss-proof pattern as pq_check.
    from datar_polars_spark.scale import ivfpq_encode, ivfpq_knn_join, ivfpq_train

    index = ivfpq_train(
        e, n_clusters=8, m=4, nbits=5, iters=4, sample_size=2000, seed=13
    )
    icoded = ivfpq_encode(e, index)
    ibatch = ivfpq_knn_join(
        queries, icoded, index, k=5, nprobe=8,
        query_id="vec_id", query_embedding="embedding", id_col="vec_id",
    ).df.select("query_id", "match_id", "rank")

    idx_df = spark.createDataFrame(
        [(index["centroids"], index["codebook"])],
        "cents array<array<double>>, bk array<array<array<double>>>",
    )
    irec = F.zip_with(
        F.element_at(F.col("cents"), F.col("ivf_cell") + F.lit(1)),
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.lit(len(index["codebook"]))),
                lambda j: F.element_at(
                    F.element_at(F.col("bk"), j),
                    F.element_at(F.col("pq_code"), j) + F.lit(1),
                ),
            )
        ),
        lambda a, b: a + b,
    )
    iexact = (
        icoded.df.select(
            F.col("vec_id").alias("match_id"), "ivf_cell", "pq_code"
        )
        .crossJoin(F.broadcast(idx_df))
        .withColumn("__rec", irec)
        .crossJoin(F.broadcast(qside))
        .withColumn(
            "__d",
            F.aggregate(
                F.zip_with("__qe", "__rec", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("__d").asc(), F.col("match_id").asc()
                )
            ),
        )
        .filter(F.col("rank") <= 5)
        .select("query_id", "match_id", "rank")
    )
    i1 = ibatch.join(iexact, keys, "left_anti").agg(F.count(F.lit(1)).alias("c1"))
    i2 = iexact.join(ibatch, keys, "left_anti").agg(F.count(F.lit(1)).alias("c2"))
    ivfpq_check = i1.crossJoin(i2).select(
        F.lit("ivfpq_check").alias("method"),
        (F.col("c1") + F.col("c2")).cast("bigint").alias("vec_id"),
        F.lit(0.0).alias("cosine"),
    )
    return (
        brute.unionByName(ivf)
        .unionByName(lsh)
        .unionByName(knn)
        .unionByName(pq_check)
        .unionByName(ivfpq_check)
        .orderBy("method", F.col("cosine").desc(), "vec_id")
    )


def q38_minhash_dedup(spark, sf):
    """Covers: MinHash+LSH near-duplicate removal AND SimHash near-dup
    consistency (merged r4 q38+q39 for the 50-row driver cap) AND the
    n-gram Jaccard pair miner itself (merged r11 q49 -> q38 to free a
    gate slot). The 'minhash' block: candidates from high-recall
    banding (32 bands x 2 rows: recall ~1-3e-15 for the corpus's
    j>=0.8 near-dup pairs), verified with EXACT n-gram Jaccard — so
    survivors equal the DuckDB brute-force all-pairs answer and are
    fully value-hash-checked. The 'jpair' block: every mined pair at
    j>=0.3 with its EXACT Jaccard value (doc_id=id_a, lang=id_b as
    string, v=jaccard), hash-matched against a DuckDB brute-force
    all-pairs scan. The 'simhash_check' row: the SimHash signature is
    hash-defined (xxhash64) so no SQL oracle can recompute it; instead
    the query PROVES the pigeonhole-blocked plan lossless by comparing
    its survivors against a brute-force all-pairs hamming scan of the
    same signatures, emitting (n_diff=0, n_docs) which the oracle
    pins. The 'idx' block (r12): the PERSISTENT dedup index lifecycle
    (build to disk -> dedup a fresh batch against the store,
    verify='exact') hash-matched against a brute-force cross-corpus
    NOT EXISTS oracle. The 'prank' block (r12): distributed PageRank
    (3 power iterations, d=0.85, symmetric supplier<->part graph)
    hash-matched against the same 3 iterations unrolled as SQL CTEs."""
    from datar_polars_spark.scale.dedup import (
        _fingerprint_survivors,
        ngram_jaccard_pairs,
        simhash_dedup,
        simhash_signatures,
    )

    d = _t(spark, sf, "documents")
    # one mining pass serves both legs: the LSH candidate set is
    # threshold-independent (same banding), so the j>=0.5 dedup set is
    # a pure filter of the j>=0.3 pair table
    jp = ngram_jaccard_pairs(
        d, f.text, f.doc_id, n=3, threshold=0.3, num_perm=64, bands=32
    )
    pairs = jp >> filter_(f.jaccard >= 0.5)
    surv = (
        d
        >> anti_join(pairs >> select(f.id_b), by={"doc_id": "id_b"})
        >> select(f.doc_id, f.lang)
    )
    nullv = F.lit(None).cast("double").alias("v")
    mh_block = _finish(surv).select(
        F.lit("minhash").alias("op"), "doc_id", "lang", nullv
    )

    jp_block = jp.df.select(
        F.lit("jpair").alias("op"),
        F.col("id_a").alias("doc_id"),
        F.col("id_b").cast("string").alias("lang"),
        F.round("jaccard", 4).alias("v"),
    )

    surv_blocked = simhash_dedup(d, f.text, f.doc_id, max_hamming=3).df.select("doc_id")
    pre = _fingerprint_survivors(d.df.select(*d.columns), "text", "doc_id")
    sigs = simhash_signatures(pre, "text", "doc_id")
    a = sigs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sigs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    dupes = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))) <= 3)
        .select(F.col("id_b").alias("doc_id"))
        .dropDuplicates()
    )
    surv_brute = pre.select("doc_id").join(dupes, "doc_id", "left_anti")
    n_diff = (
        surv_blocked.exceptAll(surv_brute).count()
        + surv_brute.exceptAll(surv_blocked).count()
    )
    n_docs = d.df.count()
    sim_block = spark.createDataFrame(
        [("simhash_check", n_diff, str(n_docs), None)],
        "op string, doc_id long, lang string, v double",
    )

    # r12 'idx' block: the PERSISTENT dedup index (scale/dedup_index.py)
    # driven end-to-end — r14 extends the leg with the RETENTION
    # lifecycle: the corpus indexes as two stamped increments
    # (doc_id % 3 == 1 at stamp 10, doc_id % 3 == 2 appended at stamp
    # 20), the expire watermark rises to 15 (increment 1 expires), the
    # index COMPACTS (expiry must fold physically AND compaction must
    # stay match-invisible for the live rows), then the batch
    # (doc_id % 3 == 0) dedups AGAINST THE STORE with verify='exact'
    # (high-recall 32x2 banding, exact n-gram Jaccard decisions). The
    # oracle therefore states survivors against the LIVE corpus only
    # (doc_id % 3 == 2): no identical normalized text AND no live
    # corpus doc at 3-gram Jaccard >= 0.5 — any defect in stamping,
    # the watermark, or the expired-row fold breaks this value hash.
    import tempfile

    from datar_polars_spark.scale import (
        dedup_against_index,
        dedup_index_append,
        dedup_index_build,
        dedup_index_expire,
    )
    from datar_polars_spark.tibble import Tibble

    idx_path = tempfile.mkdtemp(prefix="q38_didx_") + "/idx"
    batch = Tibble(d.df.filter(F.col("doc_id") % 3 == 0))
    dedup_index_build(
        Tibble(d.df.filter(F.col("doc_id") % 3 == 1)), f.text, f.doc_id,
        idx_path, num_perm=64, bands=32, store_grams=True, stamp=10,
    )
    dedup_index_append(
        Tibble(d.df.filter(F.col("doc_id") % 3 == 2)), idx_path, stamp=20,
    )
    dedup_index_expire(spark, idx_path, 15)
    from datar_polars_spark.scale import dedup_index_compact

    dedup_index_compact(spark, idx_path)
    idx_surv = dedup_against_index(
        batch, idx_path, threshold=0.5, verify="exact"
    )
    idx_block = idx_surv.df.select(
        F.lit("idx").alias("op"), "doc_id", "lang", nullv
    )

    # r12 'prank' block: distributed PageRank (scale/graph.py) on the
    # symmetric supplier<->part graph from lineitem (part nodes offset
    # by 1e6), 3 power iterations at d=0.85 — the oracle unrolls the
    # same 3 iterations as CTEs. Symmetric edges mean no dangling
    # nodes, so both formulations are pure contribution sums. v =
    # rank * N rounded to 4 (relative scale ~1.0; raw ranks are ~1/N
    # and would round to zero).
    from datar_polars_spark.scale import pagerank

    li = _t(spark, sf, "lineitem")
    e0 = li.df.select(
        F.col("l_suppkey").cast("long").alias("s"),
        (F.col("l_partkey").cast("long") + 1_000_000).alias("p"),
    ).distinct()
    pedges = e0.select(F.col("s").alias("src"), F.col("p").alias("dst")).unionAll(
        e0.select(F.col("p").alias("src"), F.col("s").alias("dst"))
    )
    pr = pagerank(pedges, iterations=3).df
    n_nodes = pr.count()
    prank_block = pr.select(
        F.lit("prank").alias("op"),
        F.col("node").alias("doc_id"),
        F.when(F.col("node") >= 1_000_000, F.lit("p"))
        .otherwise(F.lit("s"))
        .alias("lang"),
        F.round(F.col("rank") * F.lit(float(n_nodes)), 4).alias("v"),
    )

    # r13 'iidx' block: the PERSISTENT image-fingerprint index driven
    # end to end. Per-doc pixel images synthesize from doc_id: raster
    # template = doc_id % 16 (distinct templates sit tens of dHash
    # bits apart — seeded, deterministic), variant = (doc_id//16) % 2.
    # Container is keyed by TEMPLATE % 3: PNG / BMP (variant = a
    # uniform +3 brightness shift, dHash-invariant) / baseline JPEG
    # (r14: variant = a quality-40 4:2:0 re-encode of the quality-90
    # 4:4:4 original — the DC-thumbnail dHashes sit <= 1 Hamming bit
    # apart, verified against >= 21 bits across templates, so the
    # JPEG near-dups exercise the banded FUZZY path, not the exact
    # leg). Corpus (templates 0..11) indexes to disk, the index
    # COMPACTS, then the batch (templates 8..15) dedups against the
    # store — survivors are exactly the docs whose template the corpus
    # never saw (12..15), which the oracle states relationally.
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from datar_polars_spark.scale import (
        dedup_against_image_index,
        image_index_build,
        image_index_compact,
    )

    @F.pandas_udf(BinaryType())
    def doc_img(doc_id: pd.Series) -> pd.Series:
        import numpy as np

        from datar_polars_spark.scale.codecs import (
            make_bmp_pixels,
            make_jpeg_pixels,
            make_png_pixels,
        )

        out = []
        for d_ in doc_id:
            d_ = int(d_)
            t, v = d_ % 16, (d_ // 16) % 2
            rng = np.random.default_rng(1000 + t)
            img = (
                rng.integers(0, 247, (16, 24, 3), dtype=np.uint8) + 3 * v
            ).astype(np.uint8)
            c = t % 3
            if c == 0:
                out.append(make_png_pixels(img))
            elif c == 1:
                out.append(make_bmp_pixels(img))
            else:
                # x8 blocky upsample: the JPEG DC thumbnail decodes
                # back to (about) the 16x24 template raster itself
                big = np.repeat(np.repeat(img, 8, axis=0), 8, axis=1)
                out.append(make_jpeg_pixels(
                    big, quality=90 if v == 0 else 40, subsample=v == 1,
                ))
        return pd.Series(out)

    imgs = d.df.select(
        "doc_id", "lang", doc_img(F.col("doc_id")).alias("content")
    )
    # r14 retention on the shared fp-index engine: corpus rows carry a
    # per-row stamp column (templates 0..9 at 10, templates 10..11 at
    # 20); the expire watermark rises to 15 BEFORE the compact, so the
    # live corpus is templates 10..11 only — survivors gain templates
    # 8..9 (their corpus copies expired) on top of the never-indexed
    # 12..15. Any defect in per-row stamping, the watermark, or the
    # expired-row fold at compact breaks this value hash.
    from datar_polars_spark.scale import image_index_expire

    iidx_path = tempfile.mkdtemp(prefix="q38_iidx_") + "/idx"
    image_index_build(
        Tibble(
            imgs.filter(F.col("doc_id") % 16 < 12).withColumn(
                "crawl_day",
                F.when(F.col("doc_id") % 16 < 10, F.lit(10))
                .otherwise(F.lit(20)),
            )
        ),
        "content", "doc_id", iidx_path, strict=True, stamp="crawl_day",
    )
    image_index_expire(spark, iidx_path, 15)
    image_index_compact(spark, iidx_path)
    iidx_block = dedup_against_image_index(
        Tibble(imgs.filter(F.col("doc_id") % 16 >= 8)),
        iidx_path, strict=True,
    ).df.select(F.lit("iidx").alias("op"), "doc_id", "lang", nullv)

    return (
        mh_block.unionByName(sim_block)
        .unionByName(jp_block)
        .unionByName(idx_block)
        .unionByName(iidx_block)
        .unionByName(prank_block)
        .orderBy("op", "doc_id", "lang")
    )


def q41_fct_lump(spark, sf):
    """Covers: factor subsystem — fct_infreq level ordering, fct_lump_n,
    factor->code casts (merged r1 q41+q57): top-3 levels by frequency
    keep their infreq codes 1..3, the lump gets code 4. 'coll' block
    (merged r14 q41+q46, freeing the 50th driver-checked slot for the
    audio family q70): fct_collapse many-to-few level recoding, with
    the NULL level preserved."""
    from datar_polars_spark import factor_, fct_collapse, fct_infreq, fct_lump_n

    e = _t(spark, sf, "events")
    lump = (
        e
        >> factor_(f.event_type)
        >> fct_infreq(f.event_type)
        >> fct_lump_n(f.event_type, 3)
        >> mutate(code=as_integer(f.event_type))
        >> count(f.event_type, f.code)
        >> arrange(f.code)
    )
    coll = (
        e
        >> factor_(f.event_type)
        >> fct_collapse(
            f.event_type,
            engagement=["click", "view"],
            conversion=["signup", "purchase"],
            other_level="misc",
        )
        >> count(f.event_type)
    )
    ldf = _finish(lump).select(
        F.lit("lump").alias("op"),
        F.col("event_type").cast("string").alias("event_type"),
        F.col("code").cast("bigint").alias("code"),
        F.col("n").cast("bigint").alias("n"),
    )
    cdf = _finish(coll).select(
        F.lit("coll").alias("op"),
        F.col("event_type").cast("string").alias("event_type"),
        F.lit(None).cast("bigint").alias("code"),
        F.col("n").cast("bigint").alias("n"),
    )
    return ldf.unionByName(cdf).orderBy(
        "op", F.asc_nulls_last("code"), F.asc_nulls_last("event_type")
    )


def q42_cut_buckets(spark, sf):
    """Covers: cut (fixed-break binning) + table_ contingency with zero
    combos (merged r1 q42+q55)."""
    from datar_polars_spark import cut_, table_

    li = _t(spark, sf, "lineitem")
    binned = li >> cut_(f.l_quantity, "bucket", [0, 10, 25, 50], labels=["low", "mid", "high"])
    out = (
        table_(binned, f.bucket, f.l_returnflag)
        >> arrange(f.bucket, f.l_returnflag)
    )
    return _finish(out)


def q43_group_modify(spark, sf):
    """Covers: group_modify via applyInPandas (distributed per-group
    pandas transform): top-2 orders by totalprice per priority."""
    from datar_polars_spark import group_modify

    o = _t(spark, sf, "orders")

    def top2(pdf):
        return pdf.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(2)[["o_orderkey", "o_totalprice"]]

    out = (
        o
        >> select(f.o_orderpriority, f.o_orderkey, f.o_totalprice)
        >> group_by(f.o_orderpriority)
        >> group_modify(top2, "o_orderkey long, o_totalprice double")
        >> mutate(o_totalprice=round_(f.o_totalprice, 4))
        >> arrange(f.o_orderpriority, f.o_orderkey)
    )
    return _finish(out)


def q44_add_count(spark, sf):
    """Covers: add_count (window count joined onto original rows)."""
    o = _t(spark, sf, "orders")
    out = (
        o
        >> add_count(f.o_custkey)
        >> filter_(f.n >= 18)
        >> select(f.o_orderkey, f.o_custkey, f.n)
        >> arrange(f.o_orderkey)
    )
    return _finish(out)


def q45_gopher_packing(spark, sf):
    """Covers: Gopher repetition metrics (top/dup word-bigram char
    fractions, alpha-word ratio — scale/filters.py) + token counting +
    pack_documents(mode="chunk") sequence packing, aggregated per pack.
    duplicated() (former q45) retains pytest coverage. NEW r7: a
    pack_id = -1 row proves chunk_documents (context-length chunking,
    max_tokens=120, overlap=10) — chunk count, per-chunk token sums,
    rewritten-text lengths (pinning the overlap regions char-exactly),
    and full-chunk count, all recomputed arithmetically by the oracle
    from each document's whitespace tokens."""
    from datar_polars_spark.functions import builder
    from datar_polars_spark.scale import chunk_documents, pack_documents

    top_ngram_char_fraction = builder("top_ngram_char_fraction")
    dup_ngram_char_fraction = builder("dup_ngram_char_fraction")
    alpha_word_ratio = builder("alpha_word_ratio")
    token_count = builder("token_count")

    d = _t(spark, sf, "documents")
    out = (
        d
        >> arrange(f.doc_id)
        >> mutate(
            toks=token_count(f.text),
            top2=round_(top_ngram_char_fraction(f.text, 2), 4),
            dup2=round_(dup_ngram_char_fraction(f.text, 2), 4),
            awr=round_(alpha_word_ratio(f.text), 4),
        )
        >> pack_documents(tokens="toks", budget=500, mode="chunk")
        >> group_by(f.pack_id)
        >> summarise(
            n_docs=n(),
            tok_total=sum_(f.toks),
            # exact integer ten-thousandths: ROUND of a MEAN of rounded
            # doubles is tie-unstable across engines at sf>=0.1 (the
            # per-doc values are 1e-4 multiples, so pack means land on
            # .00005 boundaries); summing the fixed-point ints is exact
            sum_top2_e4=sum_(as_integer(round_(f.top2 * 10000, 0))),
            sum_dup2_e4=sum_(as_integer(round_(f.dup2 * 10000, 0))),
            sum_awr_e4=sum_(as_integer(round_(f.awr * 10000, 0))),
        )
        >> arrange(f.pack_id)
    )
    def _chunk_stat_row(ch_df, tag):
        return ch_df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("chunk_tokens").cast("bigint").alias("tok_total"),
            F.sum("chunk_id").cast("bigint").alias("sum_top2_e4"),
            F.sum(F.length("text")).cast("bigint").alias("sum_dup2_e4"),
            F.sum((F.col("chunk_tokens") == 120).cast("int"))
            .cast("bigint")
            .alias("sum_awr_e4"),
        ).select(
            F.lit(tag).cast("bigint").alias("pack_id"),
            "n_docs",
            "tok_total",
            "sum_top2_e4",
            "sum_dup2_e4",
            "sum_awr_e4",
        )

    ch = chunk_documents(d, max_tokens=120, overlap=10)
    chunk_row = _chunk_stat_row(ch.df, -1)
    # r10: pack_id = -2 proves the EXACT token_counts bin-packing path
    # — uniform all-ones per-word costs must reproduce the whitespace
    # budgeting bit-for-bit, so the -1 row's oracle arithmetic applies
    # unchanged (the oracle emits the same figures under both tags)
    words = F.filter(
        F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    d2 = d.with_df(
        d.df.withColumn(
            "tc", F.transform(words, lambda _: F.lit(1).cast("int"))
        )
    )
    ch2 = chunk_documents(
        d2, max_tokens=120, overlap=10, token_counts="tc"
    )
    chunk_row2 = _chunk_stat_row(ch2.df, -2)
    return (
        _finish(out)
        .unionByName(chunk_row)
        .unionByName(chunk_row2)
        .orderBy("pack_id")
    )


def q46_fct_collapse(spark, sf):
    """Covers: fct_collapse (many-to-few level recoding). The sort key
    is pushed through paste0 so it is NOT factor-level-ordered (matches
    the oracle's plain alphabetical ORDER BY). Restored as a declared
    key in r15 (it was folded into q41's 'coll' block in r14 to fit the
    driver's 50-slot window); q41 keeps its merged shape untouched, and
    this standalone key is registered LAST so the first 50 entries are
    exactly the r14 set."""
    from datar_polars_spark import factor_, fct_collapse

    e = _t(spark, sf, "events")
    out = (
        e
        >> factor_(f.event_type)
        >> fct_collapse(
            f.event_type,
            engagement=["click", "view"],
            conversion=["signup", "purchase"],
            other_level="misc",
        )
        >> count(f.event_type)
        >> arrange(paste0(f.event_type, ""))
    )
    return _finish(out)


def q47_row_stats(spark, sf):
    """Covers: horizontal aggregation helpers (row_sums/means/sds/
    medians) AND rowwise()+c_across (merged r1 q47+q54)."""
    p = _t(spark, sf, "part")
    out = (
        p
        >> mutate(
            rs=round_(row_sums(f.p_retailprice, as_double(f.p_size)), 4),
            rm=round_(row_means(f.p_retailprice, as_double(f.p_size)), 4),
            rsd=round_(row_sds(f.p_retailprice, as_double(f.p_size)), 4),
            rmed=round_(row_medians(f.p_retailprice, as_double(f.p_size)), 4),
        )
        >> filter_(f.rs > 990)
        >> rowwise()
        >> mutate(ca=round_(sum_(c_across([f.p_retailprice, f.p_size])), 4))
        >> ungroup()
        >> select(f.p_partkey, f.rs, f.rm, f.rsd, f.rmed, f.ca)
        >> arrange(f.p_partkey)
    )
    return _finish(out)


def q48_streaming(spark, sf):
    """Covers: Structured Streaming — BOTH the watermarked 1-day
    tumbling-window aggregation (file stream drained with availableNow)
    AND the custom stateful operator (``stateful_running_agg`` via
    ``applyInPandasWithState``) — merged r4 q48+q63 for the 50-row
    driver cap. Block 'win': the windowed result hash-compares to the
    batch SQL oracle, proving the streaming plan computes the same
    answer as batch. Block 'state': micro-batch boundaries vary, but
    the FINAL emitted row per key (largest n_events) is the exact
    per-key (count, sum, max), which the oracle recomputes — proving
    the state-store accumulation matches batch semantics end to end.
    Both blocks project to one (op, k, n_events, total, max_value)
    schema; user_id keys are zero-padded so the string sort equals the
    numeric sort on both engines."""
    from datar_polars_spark.functions import n as n_
    from datar_polars_spark.streaming import (
        run_to_memory,
        stateful_running_agg,
        stream_read_parquet,
        windowed_agg,
    )

    s = stream_read_parquet(spark, f"{sf}/events.parquet")
    out = windowed_agg(
        s, f.ts, f.event_type, window="1 day", watermark="1 day",
        n_events=n_(), total=sum_(f.value, na_rm=True),
    )
    wpdf = run_to_memory(out, mode="complete")
    wpdf["day"] = wpdf["window_start"].astype(str).str.slice(0, 10)
    wpdf["op"] = "win"
    wpdf["k"] = wpdf["day"] + "|" + wpdf["event_type"]
    wpdf["total"] = wpdf["total"].round(4)
    wpdf["max_value"] = None

    s2 = stream_read_parquet(spark, f"{sf}/events.parquet")
    out2 = stateful_running_agg(s2, f.user_id, value=f.value)
    spdf = run_to_memory(out2, mode="update")
    # final state per key = the update with the largest n_events
    spdf = (
        spdf.sort_values("n_events")
        .groupby("user_id", as_index=False)
        .last()
    )
    spdf["op"] = "state"
    spdf["k"] = spdf["user_id"].astype("int64").astype(str).str.zfill(10)
    spdf["total"] = spdf["total"].round(4)
    spdf["max_value"] = spdf["max_value"].round(4)
    # a key with only NULL values has no sum either (SQL SUM -> NULL;
    # the accumulator's 0.0 is its additive identity)
    spdf.loc[spdf["max_value"].isna(), "total"] = None

    # block 'neardup' (r9): streaming MinHash/LSH vs a static history
    # (stream_near_dedup) — the stream is the documents table itself
    # and the history the same docs, so (a) the in-stream flagged pair
    # set must EQUAL the batch minhash_join pair set on identical
    # data/params (both hash-defined by the same xxhash64 permutation
    # family; symmetric difference pinned 0) and (b) every signable
    # doc must match ITSELF at jaccard_est 1.0 — self-recall, which
    # the oracle recounts as COUNT(*) of non-NULL-text documents.
    from datar_polars_spark.scale.dedup import minhash_join
    from datar_polars_spark.streaming import stream_near_dedup

    docs = _t(spark, sf, "documents")
    s3 = stream_read_parquet(spark, f"{sf}/documents.parquet")
    out3 = stream_near_dedup(
        s3, docs, text="text", id_col="doc_id",
        num_perm=64, bands=16, shingle_words=3, threshold=0.5,
        mode="matches",
    )
    npdf = run_to_memory(out3.select("doc_id", "match_id"), mode="append")
    stream_pairs = set(
        zip(npdf["doc_id"].astype("int64"), npdf["match_id"].astype("int64"))
    )
    batch_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_join(
            docs, docs, text="text", id_col="doc_id",
            num_perm=64, bands=16, shingle_words=3, threshold=0.5,
        ).df.select("id_a", "id_b").collect()
    }
    ndf = pd.DataFrame(
        {
            "op": ["neardup", "neardup"],
            "k": ["diff", "self"],
            "n_events": [
                len(stream_pairs ^ batch_pairs),
                sum(1 for a, b in stream_pairs if a == b),
            ],
            "total": [None, None],
            "max_value": [None, None],
        }
    )

    cols = ["op", "k", "n_events", "total", "max_value"]
    # astype(object) so the all-NA max_value block concatenates without
    # pandas' future dtype-inference change warning
    both = pd.concat(
        [
            wpdf[cols].astype({"max_value": object}),
            spdf[cols],
            ndf[cols].astype({"total": object, "max_value": object}),
        ],
        ignore_index=True,
    )
    return spark.createDataFrame(
        both, "op string, k string, n_events long, total double, max_value double"
    ).orderBy("op", "k")


def q62_semantic_dedup(spark, sf):
    """Covers: SemDeDup-style semantic dedup AND hyperplane-LSH
    embedding dedup (merged r11 q50 -> q62 to free a gate slot). The
    corpus has no organic pairs at cosine >= 0.95, so each leg PLANTS
    50 near-duplicates whose survivors must be exactly the original
    vec_ids — the oracle states that directly; a planted id surviving
    (missed pair) fails the hash. 'semantic' leg: semantic_dedup
    (k-means cluster the embedding space, exact within-cluster cosine
    prune; copies = v_i + 0.05*v_{i+1}, cosine ~0.9988, ids 20000+i).
    'lshdedup' leg: embedding_dedup (banded hyperplane LSH + exact
    verify; copies = v_i + 0.25*v_{i+1}, cosine ~0.96-0.99, ids
    10000+i — the recall>=~1 gate VERDICT asked for)."""
    from datar_polars_spark.scale.dedup import embedding_dedup, semantic_dedup
    from datar_polars_spark.tibble import Tibble

    e = _t(spark, sf, "embeddings")
    base = e.df.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    nxt = base.select(
        (F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("e2")
    )

    def _planted(offset, w):
        return (
            base.filter(F.col("vec_id") < 50)
            .join(nxt, "vec_id")
            .select(
                (F.col("vec_id") + offset).alias("vec_id"),
                F.zip_with(
                    "embedding", "e2", lambda x, y: x + w * y
                ).alias("embedding"),
            )
        )

    sem = semantic_dedup(
        Tibble(base.unionByName(_planted(20000, 0.05))),
        f.embedding, f.vec_id, eps=0.05,
    )
    lsh = embedding_dedup(
        Tibble(base.unionByName(_planted(10000, 0.25))),
        f.embedding, f.vec_id, threshold=0.95,
    )
    return (
        sem.df.select(F.lit("semantic").alias("op"), "vec_id")
        .unionByName(
            lsh.df.select(F.lit("lshdedup").alias("op"), "vec_id")
        )
        .orderBy("op", "vec_id")
    )


def q65_rolling_windows(spark, sf):
    """Covers: rolling window functions (NEW r3 — roll_sum/roll_mean,
    the zoo/slider family). UNGROUPED 30-row trailing aggregates after
    arrange(o_orderkey): the ungrouped form exercises the two-pass
    distributed rewrite (per-bucket rowsBetween windows + carried
    previous-bucket tails — no single-partition window, plan-guarded
    in tests/test_rolling.py); the oracle recomputes with SQL ROWS
    BETWEEN frames. Rows before the window fills are NULL (rollsumr
    fill=NA convention), stated as CASE WHEN rn >= 30 in the oracle."""
    from datar_polars_spark import arrange
    from datar_polars_spark.functions import roll_mean, roll_sum

    o = _t(spark, sf, "orders")
    out = (
        o
        >> arrange(f.o_orderkey)
        >> mutate(
            roll_rev=round_(roll_sum(f.o_totalprice, 30), 4),
            roll_avg=round_(roll_mean(f.o_totalprice, 30), 4),
        )
        >> select(f.o_orderkey, f.roll_rev, f.roll_avg)
    )
    # the two-pass rolling rewrite hash-partitions by key bucket, so the
    # physical order no longer follows the arrange — pin the driver's
    # total order explicitly like every gate query
    return _finish(out).orderBy("o_orderkey")


def q66_trailing_time_window(spark, sf):
    """Covers: time-based trailing window aggregates (NEW r3 —
    scale/sessions.py trailing_agg, SQL RANGE BETWEEN INTERVAL
    semantics at microsecond precision). Per-user trailing 1-hour
    event sum/count; one rangeBetween window partitioned on the user
    key — the per-entity feature-pipeline shape."""
    from datar_polars_spark.scale import trailing_agg

    e = _t(spark, sf, "events") >> group_by(f.user_id)
    out = trailing_agg(e, f.ts, f.value, window="1 hour", fns=("sum", "count"))
    d = out.df.select(
        "user_id",
        F.col("ts").cast("string").alias("ts"),
        F.round("value_sum", 4).alias("value_sum"),
        F.col("value_count").alias("value_count"),
    ).orderBy("user_id", "ts")
    return d


def q51_sessionize(spark, sf):
    """Covers: batch sessionization (gap-based ids via lag + running
    sum) AND consecutive_id run-length ids (merged r1 q51+q24), joined
    per user."""
    from datar_polars_spark.scale import session_stats

    e = _t(spark, sf, "events")
    sess = (
        session_stats(e, f.ts, f.user_id, gap_seconds=1800)
        >> group_by(f.user_id)
        >> summarise(
            n_sessions=max_(f.session_id, na_rm=True),
            total_events=sum_(f.n_events, na_rm=True),
        )
    )
    runs = (
        e
        >> arrange(f.event_id)
        >> group_by(f.user_id)
        >> mutate(run_id=consecutive_id(f.event_type))
        >> summarise(n_runs=max_(f.run_id, na_rm=True))
    )
    out = (
        sess
        >> inner_join(runs, by={"user_id": "user_id"})
        >> arrange(f.user_id)
    )
    return _finish(out)


def q53_nest_join(spark, sf):
    """Covers: nest_join (matching right rows as array<struct>, no
    driver loop) — order counts derived from the nested arrays."""
    from datar_polars_spark import nest_join
    from datar_polars_spark.functions import lengths

    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    out = (
        c
        >> nest_join(o, by={"c_custkey": "o_custkey"}, name="ods")
        >> mutate(n_orders=lengths(f.ods))
        >> select(f.c_custkey, f.c_mktsegment, f.n_orders)
        >> arrange(f.c_custkey)
    )
    return _finish(out)


def q60_col_random(spark, sf):
    """Covers: col_sums/col_means/col_sds/col_medians (one-pass vertical
    aggregates) + seeded rbinom/rpois moment checks (NEW in r2, per
    VERDICT item 6). The random draws are seed-threaded JVM expressions;
    the oracle verifies the exact column stats and the TRUE moment
    bounds."""
    li = _t(spark, sf, "lineitem")
    cs = col_sums(li, f.l_quantity)["l_quantity"]
    cm = col_means(li, f.l_quantity)["l_quantity"]
    csd = col_sds(li, f.l_quantity)["l_quantity"]
    cmed = col_medians(li, f.l_quantity)["l_quantity"]
    out = (
        li
        >> mutate(
            b=rbinom(size=10, prob=0.3, seed=11),
            p=rpois(lambda_=4.0, seed=7),
        )
        >> summarise(
            _mb=mean(f.b, na_rm=True),
            _mp=mean(f.p, na_rm=True),
            rbinom_ok=between(f._mb, 2.85, 3.15),
            rpois_ok=between(f._mp, 3.8, 4.2),
        )
        >> mutate(
            sum_qty=round_(cs, 4),
            # floor-truncate: ROUND ties at the 4th decimal resolve
            # half-even in Python but half-away in DuckDB
            mean_qty=floor(cm * 10000) / 10000,
            sd_qty=round_(csd, 4),
            med_qty=round_(cmed, 4),
        )
    )
    return _finish(out)


# ---------------------------------------------------------------------------
# q61: seeded differential fuzz (r2 VERDICT item 8). One deterministic
# draw from a small query grammar; the Spark pipeline AND the DuckDB SQL
# are both generated from the same spec, so the driver exercises a
# randomized-but-reproducible plan each round. Change _FUZZ_SEED to
# exercise a different draw.
# ---------------------------------------------------------------------------

_FUZZ_SEED = 20260814

_FUZZ_RANGES = {
    "l_quantity": (10.0, 40.0),
    "l_extendedprice": (20000.0, 60000.0),
    "l_discount": (0.02, 0.08),
    "l_tax": (0.01, 0.07),
}


def _fuzz_spec(seed: int | None = None) -> dict:
    import random

    # late-bound default: the module constant is read at CALL time so a
    # seed override (or a future constant bump) actually takes effect
    rng = random.Random(_FUZZ_SEED if seed is None else seed)
    num_cols = list(_FUZZ_RANGES)
    gcols = rng.sample(["l_returnflag", "l_linestatus", "l_linenumber"], rng.choice([1, 2]))
    fcol = rng.choice(num_cols)
    lo, hi = _FUZZ_RANGES[fcol]
    return {
        "gcols": gcols,
        "fcol": fcol,
        "fop": rng.choice(["<=", ">"]),
        "thresh": round(rng.uniform(lo, hi), 4),
        # three distinct (fn, col) aggregates; sums go through exact
        # integer cents (the q01 convention — float SUM + ROUND is
        # tie-unstable across engines)
        "aggs": rng.sample(
            [(fn, c) for fn in ("sum", "avg", "min", "max") for c in num_cols], 3
        ),
    }


def q61_seeded_fuzz(spark, sf):
    """Covers: the DuckDB differential fuzzers promoted into the gate —
    filter + group_by + summarise(mixed aggregates) + ungrouped
    min_rank + arrange, with every choice drawn from _fuzz_spec(seed).
    The oracle is generated from the SAME spec (see oracle_sql), so any
    compile-path regression on this plan shape flips the hash."""
    spec = _fuzz_spec()
    li = _t(spark, sf, "lineitem")
    fref = getattr(f, spec["fcol"])
    cond = (fref <= spec["thresh"]) if spec["fop"] == "<=" else (fref > spec["thresh"])
    agg_kwargs = {}
    for i, (fn, c) in enumerate(spec["aggs"]):
        cref = getattr(f, c)
        if fn == "sum":
            agg_kwargs[f"a{i}"] = sum_(as_integer(floor(cref * 100)), na_rm=True)
        elif fn == "avg":
            agg_kwargs[f"a{i}"] = round_(mean(cref, na_rm=True), 4)
        elif fn == "min":
            agg_kwargs[f"a{i}"] = round_(min_(cref, na_rm=True), 4)
        else:
            agg_kwargs[f"a{i}"] = round_(max_(cref, na_rm=True), 4)
    out = (
        li
        >> filter_(cond)
        >> group_by(*[getattr(f, g) for g in spec["gcols"]])
        >> summarise(**agg_kwargs, n_rows=n())
        >> ungroup()
        >> mutate(rk=min_rank(desc(f.n_rows)))
        >> arrange(*[getattr(f, g) for g in spec["gcols"]])
    )
    return _finish(out)


_FUZZ2_SEED = 20260815


def _fuzz2_spec(seed: int | None = None) -> dict:
    """Second grammar: dim-join + grouped aggregate (exercises the
    join compile path with a randomized-but-reproducible draw)."""
    import random

    rng = random.Random(_FUZZ2_SEED if seed is None else seed)
    return {
        # orders joins customer on custkey; group by a customer dim
        "gcol": rng.choice(["c_mktsegment", "c_nationkey"]),
        "jtype": rng.choice(["inner", "left"]),
        "fcol": "o_totalprice",
        "thresh": round(rng.uniform(50_000, 250_000), 2),
        "agg": rng.choice(["sum", "avg", "max"]),
    }


def q64_seeded_join_fuzz(spark, sf):
    """Covers: second seeded differential fuzz — a fact-to-dim join +
    grouped aggregate whose every choice comes from _fuzz2_spec(seed);
    the oracle is generated from the same spec. Complements q61 (scan +
    agg + rank grammar) with the join path."""
    spec = _fuzz2_spec()
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    join_fn = inner_join if spec["jtype"] == "inner" else left_join
    joined = join_fn(
        o >> filter_(getattr(f, spec["fcol"]) > spec["thresh"]),
        c,
        by={"o_custkey": "c_custkey"},
    )
    g = getattr(f, spec["gcol"])
    if spec["agg"] == "sum":
        aggc = sum_(as_integer(floor(f.o_totalprice * 100)), na_rm=True)
    elif spec["agg"] == "avg":
        aggc = round_(mean(f.o_totalprice, na_rm=True), 4)
    else:
        aggc = round_(max_(f.o_totalprice, na_rm=True), 4)
    out = (
        joined
        >> group_by(g)
        >> summarise(a0=aggc, n_rows=n())
        >> arrange(g)
    )
    return _finish(out)


def _fuzz2_sql(spec: dict | None = None) -> str:
    spec = spec or _fuzz2_spec()
    if spec["agg"] == "sum":
        a0 = "CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS a0"
    elif spec["agg"] == "avg":
        a0 = "ROUND(AVG(o_totalprice), 4) AS a0"
    else:
        a0 = "ROUND(MAX(o_totalprice), 4) AS a0"
    jt = "JOIN" if spec["jtype"] == "inner" else "LEFT JOIN"
    return f"""
        SELECT {spec['gcol']}, {a0}, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM (SELECT * FROM orders WHERE {spec['fcol']} > {spec['thresh']}) o
        {jt} customer c ON o.o_custkey = c.c_custkey
        GROUP BY {spec['gcol']}
        ORDER BY {spec['gcol']}
    """


def _fuzz_sql(spec: dict | None = None) -> str:
    spec = spec or _fuzz_spec()
    agg_sql = []
    for i, (fn, c) in enumerate(spec["aggs"]):
        if fn == "sum":
            agg_sql.append(
                f"CAST(SUM(CAST(FLOOR({c} * 100) AS BIGINT)) AS BIGINT) AS a{i}"
            )
        elif fn == "avg":
            agg_sql.append(f"ROUND(AVG({c}), 4) AS a{i}")
        else:
            agg_sql.append(f"ROUND({fn.upper()}({c}), 4) AS a{i}")
    gl = ", ".join(spec["gcols"])
    return f"""
        SELECT {gl}, {', '.join(agg_sql)},
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(RANK() OVER (ORDER BY COUNT(*) DESC) AS INTEGER) AS rk
        FROM lineitem
        WHERE {spec['fcol']} {spec['fop']} {spec['thresh']}
        GROUP BY {gl}
        ORDER BY {gl}
    """


def q67_relevance(spark, sf):
    """Covers: tfidf_top_terms (smoothed TF-IDF, deterministic per-doc
    top-k via WindowGroupLimit) and bm25_score (Okapi BM25 against a
    fixed query vocabulary) — the r5 corpus-relevance ops, driver-
    proven. Per document: its top-3 TF-IDF terms joined with its BM25
    score for query {spark, vector, stream}; docs missing every query
    term score 0. r5b: also ngram_lm_train/ngram_lm_score (Stupid
    Backoff LM, scale/lm.py) — model trained on the lang='en' slice,
    every document scored against it, per-doc lm_logprob/lm_oov joined
    on; the oracle rebuilds the full count tables and backoff CASE in
    SQL. r6: the LM leg is TRIGRAM (order=3) — the oracle carries both
    context lengths (LAG-built, BOS-padded) and the three-way backoff
    CASE with alpha^2 on the unigram/OOV floor. r7: a SECOND LM column
    (lm_lang) scores every doc against its OWN language's trigram model
    (ngram_lm_train/score by=lang — the CCNet per-language pattern);
    the oracle rebuilds the lang-keyed count tables with every join key
    widened by lang. Total order (doc_id, rank); scores rounded once to
    4 decimals (comparator precision)."""
    from datar_polars_spark.scale import (
        bm25_score,
        ngram_lm_score,
        ngram_lm_train,
        tfidf_top_terms,
    )

    d = _t(spark, sf, "documents")
    top = tfidf_top_terms(d, f.text, f.doc_id, k=3)
    bm = bm25_score(d, f.text, f.doc_id, query=["spark", "vector", "stream"])
    ref = d.with_df(d.df.where(F.col("lang") == "en"))
    lm = ngram_lm_score(d, ngram_lm_train(ref, order=3), order=3).df.select(
        "doc_id",
        F.round("lm_logprob", 4).alias("lm_logprob"),
        F.round("lm_oov_rate", 4).alias("lm_oov"),
    )
    # r7: PER-GROUP models (ngram_lm_train/score by=lang, the CCNet
    # one-LM-per-language pattern) — every doc scored against its OWN
    # language's trigram model; the oracle rebuilds the lang-keyed
    # count tables and backoff CASE in SQL
    lmg = ngram_lm_score(
        d, ngram_lm_train(d, order=3, by="lang"), order=3, by="lang"
    ).df.select("doc_id", F.round("lm_logprob", 4).alias("lm_lang"))
    out = (
        top.df.join(
            bm.df.withColumnRenamed("score", "bm25"), on="id", how="left"
        )
        .select(
            F.col("id").alias("doc_id"),
            F.col("rank").cast("bigint").alias("rank"),
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.round("score", 4).alias("tfidf"),
            F.round(F.coalesce(F.col("bm25"), F.lit(0.0)), 4).alias("bm25"),
        )
        .join(lm, "doc_id", "left")
        .join(lmg, "doc_id", "left")
        .orderBy("doc_id", "rank")
    )
    return out


def q68_semantic_decon(spark, sf):
    """Covers: embedding_join (cross-table cosine match, r10) in its
    broadcast mode — EXACT by construction (tiled matmuls against the
    broadcast benchmark, no LSH), so DuckDB's brute-force cross join
    is a value-level oracle — and decontaminate_semantic (anti-join
    survivors), the embedding-space complement of q14's exact-n-gram
    decontamination. Benchmark = rescaled copies of corpus vectors
    0..9 under shifted ids (cosine 1 with their sources; the widest
    natural non-planted cosine at sf0.01 is ~0.40, so threshold 0.9
    sits in a wide gap and no FP boundary can flip the comparator).
    Output: 'match' rows (id_a, id_b, cos rounded 4) plus one 'clean'
    row carrying the survivor count."""
    from datar_polars_spark.scale import (
        decontaminate_semantic,
        embedding_join,
    )
    from datar_polars_spark.tibble import ensure_tibble

    emb = _t(spark, sf, "embeddings")
    bench = ensure_tibble(
        emb.df.where("vec_id < 10").select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform(
                "embedding", lambda v: v * F.lit(0.5)
            ).alias("embedding"),
        )
    )
    hits = embedding_join(emb, bench, threshold=0.9, mode="broadcast")
    matches = hits.df.select(
        F.lit("match").alias("op"),
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.round("cos", 4).alias("cos"),
    )
    clean = decontaminate_semantic(
        emb, bench, threshold=0.9, mode="broadcast"
    )
    summary = clean.df.agg(F.count("*").alias("n")).select(
        F.lit("clean").alias("op"),
        F.col("n").cast("bigint").alias("id_a"),
        F.lit(-1).cast("bigint").alias("id_b"),
        F.lit(-1.0).alias("cos"),
    )
    # r10: the audit variant — per contaminated doc, match count and
    # strongest cosine (the oracle recomputes both from the same
    # brute-force pair set)
    from datar_polars_spark.scale import contamination_report_semantic

    report = (
        contamination_report_semantic(
            emb, bench, threshold=0.9, mode="broadcast"
        )
        .df.where(F.col("contaminated_matches") > 0)
        .select(
            F.lit("report").alias("op"),
            F.col("vec_id").cast("bigint").alias("id_a"),
            F.col("contaminated_matches").cast("bigint").alias("id_b"),
            F.round("max_cosine", 4).alias("cos"),
        )
    )
    # r11: the LSH mode against the same pair set — the benchmark
    # vectors are exactly-scaled copies, so their hyperplane signs
    # match their sources in EVERY band (positive scaling preserves
    # sign), candidacy is guaranteed, and the exact-cosine verify
    # makes lsh hits == broadcast hits == the brute-force oracle
    lsh = embedding_join(emb, bench, threshold=0.9, mode="lsh")
    lsh_rows = lsh.df.select(
        F.lit("lsh").alias("op"),
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.round("cos", 4).alias("cos"),
    )
    # r12 'sidx' leg: the PERSISTENT semantic index
    # (scale/semantic_index.py) — the corpus's hyperplane postings are
    # built to disk once, then the benchmark matches AGAINST THE STORE
    # (batch signs itself, candidates equi-join the postings, exact
    # cosine verifies). Scaled copies share every band sign, so
    # candidacy is guaranteed and the hit set equals the brute-force
    # pair set with sides swapped (id_a = benchmark, id_b = corpus).
    # r14 retention: the corpus indexes as two stamped increments
    # (vec_id % 2 == 0 at stamp 10, % 2 == 1 appended at stamp 20);
    # the expire watermark rises to 15 and the index compacts, so only
    # ODD corpus vectors stay matchable — the oracle filters the
    # brute-force pair set to the live (odd) corpus side, and any
    # defect in semantic stamping/expiry/fold breaks this value hash.
    import tempfile

    from datar_polars_spark.scale import (
        match_against_semantic_index,
        semantic_index_append,
        semantic_index_build,
        semantic_index_expire,
    )
    from datar_polars_spark.tibble import Tibble as _Tb

    sidx_path = tempfile.mkdtemp(prefix="q68_sidx_") + "/idx"
    semantic_index_build(
        _Tb(emb.df.filter(F.col("vec_id") % 2 == 0)),
        f.embedding, f.vec_id, sidx_path, stamp=10,
    )
    semantic_index_append(
        _Tb(emb.df.filter(F.col("vec_id") % 2 == 1)), sidx_path, stamp=20,
    )
    semantic_index_expire(spark, sidx_path, 15)
    # r13: compaction must be match-invisible — defects break the hash
    from datar_polars_spark.scale import semantic_index_compact

    semantic_index_compact(spark, sidx_path)
    sidx_rows = match_against_semantic_index(
        bench, sidx_path, threshold=0.9
    ).df.select(
        F.lit("sidx").alias("op"),
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.round("cos", 4).alias("cos"),
    )
    # r13 'embed'/'edet' legs: text_embed (scale/embed.py) oracle-
    # gated end to end. 60 synthesized docs (4 disjoint-vocabulary
    # templates x 3 filler variants, keyed by doc_id) embed with the
    # deterministic hashing-trick + JL construction; embedding_join
    # (broadcast, exact) then recovers the template structure: every
    # doc's cos>=0.6 neighbor set is EXACTLY its template peers
    # (within-template pairs share ~90% of their word 1-2-grams;
    # cross-template vocab is disjoint, so those cosines sit near 0),
    # vectors are unit-norm, and identical texts embed identically
    # (edet: distinct vectors per template == distinct variants). The
    # oracle states all three relationally — any drift in
    # tokenization, gram hashing, projection seeding, or
    # normalization moves a pinned number.
    from datar_polars_spark.scale import text_embed

    tmpl = [
        "solar panels convert sunlight into renewable electricity "
        "powering regional grids efficiently",
        "violinists rehearse difficult concertos before orchestral "
        "premieres under bright stage lights",
        "migrating salmon navigate upstream rapids reaching ancestral "
        "spawning gravel beds",
        "quarterly ledgers reconcile vendor invoices against accrued "
        "liabilities plus outstanding balances",
    ]
    fill = ["today", "carefully", "remarkably"]
    docs60 = _t(spark, sf, "documents").df.where("doc_id < 60").select(
        "doc_id",
        F.concat(
            F.element_at(
                F.array(*[F.lit(t) for t in tmpl]),
                (F.col("doc_id") % 4 + 1).cast("int"),
            ),
            F.lit(" "),
            F.element_at(
                F.array(*[F.lit(w) for w in fill]),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ),
        ).alias("text"),
    )
    emb60 = text_embed(
        ensure_tibble(docs60), f.text, dim=64, seed=0
    ).df.select(F.col("doc_id").alias("vec_id"), "embedding")
    epairs = embedding_join(
        ensure_tibble(emb60), ensure_tibble(emb60),
        threshold=0.6, mode="broadcast",
    ).df.where("id_a <> id_b")
    npeers = epairs.groupBy("id_a").agg(F.count("*").alias("np"))
    embed_rows = (
        emb60.join(npeers, emb60["vec_id"] == npeers["id_a"], "left")
        .select(
            F.lit("embed").alias("op"),
            F.col("vec_id").cast("bigint").alias("id_a"),
            F.coalesce(F.col("np"), F.lit(0)).cast("bigint").alias("id_b"),
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.col("embedding"), F.lit(0.0),
                        lambda a, x: a + x * x,
                    )
                ),
                6,
            ).alias("cos"),
        )
    )
    edet_rows = (
        emb60.groupBy((F.col("vec_id") % 4).alias("t"))
        .agg(F.countDistinct("embedding").alias("nd"))
        .select(
            F.lit("edet").alias("op"),
            (F.col("t") + 1000).cast("bigint").alias("id_a"),
            F.col("nd").cast("bigint").alias("id_b"),
            F.lit(-1.0).alias("cos"),
        )
    )
    return (
        matches.unionByName(summary)
        .unionByName(report)
        .unionByName(lsh_rows)
        .unionByName(sidx_rows)
        .unionByName(embed_rows)
        .unionByName(edet_rows)
        .orderBy("op", "id_a")
    )


def q69_curation(spark, sf):
    """Covers: dedup_paragraphs AND url_normalize /
    url_registrable_domain (merged r11 q69+q70 to fit the 50-query
    driver cap). 'para' leg — corpus-level keep-first paragraph dedup,
    the Dolma/FineWeb boilerplate-removal step: the synthetic docs
    carry no paragraph structure, so the query synthesizes it
    deterministically (head slice + a SHARED boilerplate paragraph +
    tail slice per doc); keep-first then leaves the boilerplate only
    in the lowest doc_id (plus any naturally repeated head/tail
    slices, which the oracle recomputes identically); the per-lang
    rollup pins doc counts, total removals, and the rebuilt text's
    exact char mass (reassembly order + separators). 'url' leg — the
    FineWeb-style crawl canonicalization step: URLs are synthesized
    deterministically from doc_id in three shapes (mixed-case host +
    default port + trailing slash + utm + fragment; non-default port +
    gclid + unsorted params; bare), so the oracle constructs the
    EXPECTED canonical strings directly and every normalized byte is
    pinned via min() + distinct counts per registrable domain
    (including the co.uk PSL rule). 'dreport' leg — domain_report
    (r11, the per-domain crawl audit) over the same URLs with lang as
    the text column: distinct-text, distinct-canonical-URL, and
    char-mass aggregates per domain, oracle-recomputed. 'warc' leg
    (NEW r12) — read_warc over a synthesized two-file archive (one
    plain .warc with a warcinfo record, one member-per-record .warc.gz
    with a request record; 24 HTTP response records split across them)
    proves ingestion end to end: type filtering drops the non-response
    records, the HTTP envelope is stripped, and the oracle
    reconstructs every payload byte arithmetically (md5 over the
    sorted body concatenation), so gzip-member walking, header
    parsing, and envelope stripping are all hash-pinned. 'langid' leg
    (NEW r12) — the trainable hashed char-n-gram language-ID model
    (lang_id_train_seed + lang_id_predict): four fixed out-of-corpus
    sentences (en/fr/de/es, none in the seed corpus) are assigned by
    doc_id % 4 and the oracle asserts every row is routed to the
    correct language — training + prediction are deterministic (crc32
    buckets, no sampling), so a model regression flips counts. 'qclf'
    leg (NEW r12) — the trainable quality classifier
    (quality_classifier_train + _predict): trained on a deterministic
    separable word-salad fixture, it must route held-out high/low
    quality texts (assigned by doc_id % 2) to the right side of 0.5;
    margins on this fixture are extreme (p ~ 1 / ~0), so the float
    last-bit nondeterminism of distributed gradient sums cannot flip
    the routing the oracle asserts. 'funnel' leg (NEW r12) —
    filter_funnel's one-aggregation sequential accounting over three
    deterministic predicates; the oracle recomputes each stage's
    survivor chain as nested conditional sums. 'hrank' leg (NEW r14)
    — the host_graph -> pagerank -> join_host_rank authority loop
    composed end to end on a ring host graph whose exact PageRank is
    the uniform vector (fixed point from the uniform start), with an
    edge-absent host taking the 0.0 fill. 'idedup' leg (NEW r14) —
    an image_dhash keep-min-survivor stage composed INTO
    filter_funnel over per-doc synthesized PNG rasters (template
    doc_id % 8, dHash-invariant brightness variant); the oracle
    restates the survivor set as min-doc-id-per-template and the
    funnel chain as nested conditional sums."""
    import gzip
    import os as _os
    import tempfile

    from datar_polars_spark.scale import (
        dedup_paragraphs,
        lang_id_predict,
        lang_id_train_seed,
        quality_classifier_predict,
        quality_classifier_train,
        read_warc,
        url_normalize,
        url_registrable_domain,
    )
    from datar_polars_spark.tibble import ensure_tibble

    d = _t(spark, sf, "documents")
    base = ensure_tibble(
        d.df.select(
            "doc_id",
            "lang",
            F.concat(
                F.substring("text", 1, 100),
                F.lit("\n\nSHARED BOILERPLATE PARAGRAPH.\n\n"),
                F.substring("text", 101, 100),
            ).alias("text"),
        )
    )
    para = (
        dedup_paragraphs(base)
        .df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.sum("paras_removed").cast("bigint").alias("n2"),
            F.sum(F.length("text")).cast("bigint").alias("chars"),
        )
        .select(
            F.lit("para").alias("op"),
            F.col("lang").alias("k"),
            "n1", "n2",
            F.col("chars").cast("string").alias("s"),
        )
    )

    k = (F.col("doc_id") % 7).cast("string")
    i = F.col("doc_id").cast("string")
    url = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("HTTPS://WWW.Site"), k, F.lit(".COM:443/Page/"), i,
                F.lit("/?utm_source=x&b=2&a=1#frag"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("http://news.site"), k, F.lit(".co.uk:8080/a/"), i,
                F.lit("?z=9&gclid=t&y=8"),
            ),
        )
        .otherwise(F.concat(F.lit("https://site"), k, F.lit(".com/p"), i))
    )
    urls = (
        d.df.select("doc_id")
        .withColumn("url", url)
        .select(
            url_registrable_domain(F.col("url")).alias("domain"),
            url_normalize(F.col("url")).alias("norm"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.countDistinct("norm").alias("n2"),
            F.min("norm").alias("s"),
        )
        .select(
            F.lit("url").alias("op"), F.col("domain").alias("k"),
            "n1", "n2", "s",
        )
    )
    # r11 'dreport' leg: domain_report (the per-domain crawl audit)
    # over the same synthesized URLs with lang as the text — pins the
    # distinct-text / distinct-canonical-URL / char-mass aggregation
    # path end to end (rates are pure derivations of these counts)
    from datar_polars_spark.scale import domain_report

    rep = domain_report(
        ensure_tibble(d.df.select("doc_id", "lang").withColumn("url", url)),
        url="url",
        text="lang",
    )
    rep_block = rep.df.select(
        F.lit("dreport").alias("op"),
        F.col("domain").alias("k"),
        F.col("n_unique_texts").cast("bigint").alias("n1"),
        F.col("n_unique_urls").cast("bigint").alias("n2"),
        F.col("chars").cast("string").alias("s"),
    )

    # r12 'warc' leg: synthesize the two standard WARC layouts and
    # read them back through the real binaryFile + mapInPandas path.
    def _rec(warc_type: str, uri, ctype: str, body: bytes) -> bytes:
        lines = [b"WARC/1.0", b"WARC-Type: " + warc_type.encode()]
        if uri is not None:
            lines.append(b"WARC-Target-URI: " + uri.encode())
        lines += [
            b"WARC-Date: 2026-01-01T00:00:00Z",
            b"Content-Type: " + ctype.encode(),
            b"Content-Length: " + str(len(body)).encode(),
        ]
        return b"\r\n".join(lines) + b"\r\n\r\n" + body + b"\r\n\r\n"

    def _resp(i: int) -> bytes:
        body = (f"payload {i} " * (i % 5 + 1)).encode("ascii")
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n\r\n" + body
        )
        return _rec(
            "response",
            f"https://warc.example/{i}",
            "application/http; msgtype=response",
            http,
        )

    wdir = tempfile.mkdtemp(prefix="q69_warc_")
    info = _rec("warcinfo", None, "application/warc-fields", b"software: datar\r\n")
    req = _rec(
        "request",
        "https://warc.example/0",
        "application/http; msgtype=request",
        b"GET /0 HTTP/1.1\r\nHost: warc.example\r\n\r\n",
    )
    with open(_os.path.join(wdir, "part-0.warc"), "wb") as fh:
        fh.write(info + b"".join(_resp(i) for i in range(12)))
    with open(_os.path.join(wdir, "part-1.warc.gz"), "wb") as fh:
        fh.write(
            b"".join(
                gzip.compress(m)
                for m in ([req] + [_resp(i) for i in range(12, 24)])
            )
        )
    warc_leg = (
        read_warc(spark, wdir)
        .df.select(
            F.regexp_extract("target_uri", r"/(\d+)$", 1)
            .cast("long")
            .alias("i"),
            F.col("payload").cast("string").alias("body"),
            "payload_len",
        )
        .groupBy((F.col("i") % 3).cast("string").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.sum("payload_len").alias("n2"),
            F.md5(
                F.array_join(F.array_sort(F.collect_list("body")), "|")
            ).alias("s"),
        )
        .select(F.lit("warc").alias("op"), "k", "n1", "n2", "s")
    )

    # r12 'langid' leg: four fixed sentences (none in the seed corpus),
    # routed by doc_id % 4; the oracle asserts perfect routing.
    s_en = (
        "the engineers reviewed the plans carefully before the bridge "
        "could open to morning traffic"
    )
    s_fr = (
        "les ingénieurs ont examiné attentivement les plans avant que "
        "le pont ne soit ouvert à la circulation du matin"
    )
    s_de = (
        "die ingenieure prüften die pläne sorgfältig bevor die brücke "
        "für den morgendlichen verkehr geöffnet werden konnte"
    )
    s_es = (
        "los ingenieros revisaron los planos con cuidado antes de que "
        "el puente se abriera al tráfico de la mañana"
    )
    model = lang_id_train_seed(spark)
    sents = F.array(F.lit(s_en), F.lit(s_fr), F.lit(s_de), F.lit(s_es))
    probe = ensure_tibble(
        d.df.select("doc_id").withColumn(
            "text", F.element_at(sents, (F.col("doc_id") % 4 + 1).cast("int"))
        )
    )
    lang_leg = (
        lang_id_predict(probe, model, text="text")
        .df.groupBy(F.col("lang_pred").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.countDistinct(F.col("doc_id") % 4).alias("n2"),
            F.min("text").alias("s"),
        )
        .select(F.lit("langid").alias("op"), "k", "n1", "n2", "s")
    )

    # r12 'qclf' leg: train the quality classifier on a deterministic
    # separable fixture, then assert held-out routing by doc_id % 2.
    good_pool = (
        "research careful analysis method evidence result clear "
        "structure citation measured detailed thorough"
    ).split()
    bad_pool = (
        "click buy cheap winner prize free casino pills "
        "subscribe spam lottery jackpot"
    ).split()
    fixture = [
        (
            " ".join(pool[(i + j) % len(pool)] for j in range(8)),
            1 if pool is good_pool else 0,
        )
        for pool in (good_pool, bad_pool)
        for i in range(24)
    ]
    clf = quality_classifier_train(
        ensure_tibble(
            spark.createDataFrame(fixture, "text string, label int")
        ),
        "text",
        "label",
        buckets=1 << 13,
        iters=8,
    )
    hq = "careful measured analysis with detailed evidence and a clear method"
    # r12 'funnel' leg: filter_funnel sequential accounting over three
    # deterministic documents-table predicates — the oracle recomputes
    # every stage's survivor count as nested conditional sums.
    from datar_polars_spark.scale import filter_funnel

    _, funnel = filter_funnel(
        d,
        {
            "n200": F.col("n_chars") > 200,
            "noz": F.col("lang") != "zh",
            "even": F.col("doc_id") % 2 == 0,
        },
    )
    funnel_leg = funnel.df.select(
        F.lit("funnel").alias("op"),
        F.col("stage").alias("k"),
        F.col("n_in").alias("n1"),
        F.col("n_kept").alias("n2"),
        F.col("n_dropped").cast("string").alias("s"),
    )

    lq = "click the free prize and buy cheap casino pills from the spam lottery"
    clf_probe = ensure_tibble(
        d.df.select("doc_id").withColumn(
            "text",
            F.element_at(
                F.array(F.lit(hq), F.lit(lq)),
                (F.col("doc_id") % 2 + 1).cast("int"),
            ),
        )
    )
    qclf_leg = (
        quality_classifier_predict(clf_probe, clf, text="text")
        .df.groupBy(
            F.when(F.col("quality_prob") >= 0.5, "hq")
            .otherwise("lq")
            .alias("k")
        )
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.countDistinct(F.col("doc_id") % 2).alias("n2"),
            F.min("text").alias("s"),
        )
        .select(F.lit("qclf").alias("op"), "k", "n1", "n2", "s")
    )

    # r14 'hrank' leg: the crawl-authority loop COMPOSED — a 7-node
    # ring host graph runs through pagerank (the uniform vector 1/7 is
    # the exact fixed point of the power iteration from the uniform
    # start, so every ranked host must carry rank*7 == 1 to fp
    # precision at ANY iteration count) and join_host_rank attaches
    # the prior to documents whose synthesized URLs point at the ring
    # hosts — except doc_id % 5 == 0, whose host appears in no edge
    # and must take the 0.0 fill. The oracle states the whole
    # composition arithmetically: n2 (rows with rank*7 == 1 within
    # 1e-9) equals the group size for ranked hosts and 0 for the
    # unranked one; s pins the fill/ranked routing.
    from datar_polars_spark.scale import join_host_rank, pagerank

    ring = spark.createDataFrame(
        [(f"h{i}.example", f"h{(i + 1) % 7}.example") for i in range(7)],
        "src string, dst string",
    )
    ranks = pagerank(ring, iterations=8)
    host = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("unranked.example"))
        .otherwise(
            F.concat(
                F.lit("h"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(".example"),
            )
        )
    )
    hdocs = ensure_tibble(
        d.df.select("doc_id").withColumn(
            "url",
            F.concat(
                F.lit("https://"), host, F.lit("/p"),
                F.col("doc_id").cast("string"),
            ),
        )
    )
    hr = join_host_rank(hdocs, ranks, url="url", fill=0.0)
    hrank_leg = (
        hr.df.groupBy(
            F.regexp_extract("url", r"^https://([^/]+)/", 1).alias("k")
        )
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.sum(
                F.when(
                    F.abs(F.col("host_rank") * 7 - 1) < 1e-9, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n2"),
            F.when(F.max("host_rank") == 0.0, F.lit("fill"))
            .otherwise(F.lit("ranked"))
            .alias("s"),
        )
        .select(F.lit("hrank").alias("op"), "k", "n1", "n2", "s")
    )

    # r14 'idedup' leg: an IMAGE-dedup stage composed INTO the funnel
    # — per doc (bounded to doc_id < 96) a PNG raster synthesizes from
    # template doc_id % 8 with a +3-brightness variant (dHash-exact
    # invariant: dHash compares adjacent pixels, so a uniform shift
    # changes no bit), image_dhash fingerprints them, the keep-min-id
    # survivor per fingerprint becomes the funnel's first stage, and
    # filter_funnel chains it with the n_chars / parity predicates.
    # The oracle recomputes the survivor set relationally (min doc_id
    # per template among doc_id < 96) and every stage's survivor
    # chain as nested conditional sums — a wrong dHash bit anywhere
    # (collapse failure OR cross-template collision) flips the counts.
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from datar_polars_spark.scale import image_dhash
    from datar_polars_spark.tibble import Tibble

    @F.pandas_udf(BinaryType())
    def _q69_img(doc_id: pd.Series) -> pd.Series:
        import numpy as np

        from datar_polars_spark.scale.codecs import make_png_pixels

        out = []
        for d_ in doc_id:
            d_ = int(d_)
            t, v = d_ % 8, (d_ // 8) % 2
            rng = np.random.default_rng(2000 + t)
            img = (
                rng.integers(0, 247, (16, 24, 3), dtype=np.uint8) + 3 * v
            ).astype(np.uint8)
            out.append(make_png_pixels(img))
        return pd.Series(out)

    sub = d.df.filter(F.col("doc_id") < 96).select(
        "doc_id", "n_chars", _q69_img(F.col("doc_id")).alias("content")
    )
    dh = image_dhash(Tibble(sub), content="content", out_col="dh", strict=True)
    ikeep = dh.df.groupBy("dh").agg(F.min("doc_id").alias("__keep_id__"))
    flagged = (
        dh.df.drop("content")
        .join(ikeep, on="dh")
        .withColumn("is_keeper", F.col("doc_id") == F.col("__keep_id__"))
    )
    _, iacct = filter_funnel(
        Tibble(flagged),
        {
            "imgkeep": F.col("is_keeper"),
            "n200": F.col("n_chars") > 200,
            "even": F.col("doc_id") % 2 == 0,
        },
    )
    idedup_leg = iacct.df.select(
        F.lit("idedup").alias("op"),
        F.col("stage").alias("k"),
        F.col("n_in").alias("n1"),
        F.col("n_kept").alias("n2"),
        F.col("n_dropped").cast("string").alias("s"),
    )

    return (
        para.unionByName(urls)
        .unionByName(rep_block)
        .unionByName(warc_leg)
        .unionByName(lang_leg)
        .unionByName(qclf_leg)
        .unionByName(funnel_leg)
        .unionByName(hrank_leg)
        .unionByName(idedup_leg)
        .orderBy("op", "k")
    )




def q70_av_dedup(spark, sf):
    """The AUDIO and VIDEO perceptual-dedup families end to end,
    oracle-locked — spectral fingerprint
    (scale/multimodal.audio_fingerprint over codecs.decode_pcm: real
    WAV int8/int16 + AIFF PCM decode), audio_near_dup_pairs (banded,
    pigeonhole-exact), and the PERSISTENT audio index lifecycle
    including TOMBSTONE DELETE: build -> delete -> dedup (mask path)
    -> compact -> dedup (folded path); then the same four-leg contract
    for the VIDEO family (r14: temporal-median fingerprint over real
    MJPEG AVI frame decode — 'vfp'/'vpair'/'vmask'/'vfold' blocks).

    Per-doc clips synthesize from doc_id: tonal template = doc_id % 16
    (8 slices x 3 band-center tones, seeded — distinct templates sit
    >= 20 fingerprint bits apart), variant = (doc_id // 16) % 2 (a
    0.35x re-gain + light noise re-master, <= 4 bits from its
    original; both measured, budget 6). Container keys off
    TEMPLATE % 3: 16-bit WAV / AIFF ('NONE' big-endian) / 8-bit WAV —
    all three real PCM decode paths, and since variant distances hold
    ACROSS the re-quantized container, the fingerprints are
    container-invariant by construction.

    'afp' leg: every doc with the same (template, variant) shares ONE
    fingerprint (byte-identical synthesis -> identical fingerprint,
    stated as countDistinct == 1). 'apair' leg: near-dup pairs over
    one representative per (template, variant) are EXACTLY the
    same-template pairs. 'amask'/'afold' legs: corpus (templates
    0..11) indexes to disk; template 11's ids are DELETED (tombstoned);
    the batch (templates 8..15) dedups against the store before the
    compact (tombstones masking) and after it (tombstones physically
    folded) — survivors both times are exactly the docs whose template
    is gone or was never indexed (>= 11), which the oracle states
    relationally."""
    import tempfile

    import pandas as pd
    from pyspark.sql.types import BinaryType

    from datar_polars_spark.tibble import Tibble
    from datar_polars_spark.scale import (
        audio_fingerprint,
        audio_index_build,
        audio_index_compact,
        audio_index_delete,
        audio_near_dup_pairs,
        dedup_against_audio_index,
    )

    d = _t(spark, sf, "documents")

    @F.pandas_udf(BinaryType())
    def doc_clip(doc_id: pd.Series) -> pd.Series:
        import numpy as np

        from datar_polars_spark.scale.codecs import (
            make_aiff_pcm,
            make_wav_pcm,
        )

        cache = {}  # 32 distinct (template, variant) clips
        out = []
        for d_ in doc_id:
            d_ = int(d_)
            t, v = d_ % 16, (d_ // 16) % 2
            if (t, v) in cache:
                out.append(cache[(t, v)])
                continue
            sr = 8000
            edges = np.geomspace(100.0, 3600.0, 9)
            centers = np.sqrt(edges[:-1] * edges[1:])
            rng = np.random.default_rng(700 + t)
            n = sr // 2
            x = np.zeros(n)
            te = [(i * n) // 8 for i in range(9)]
            for s in range(8):
                for b in rng.choice(8, size=3, replace=False):
                    tt = np.arange(te[s], te[s + 1]) / sr
                    x[te[s]: te[s + 1]] += np.sin(
                        2 * np.pi * centers[b] * tt
                    )
            x = x / np.abs(x).max() * 0.6
            if v:
                x = 0.35 * x + 0.008 * np.random.default_rng(
                    4000 + t
                ).standard_normal(n)
            x = np.clip(x, -1, 1)
            c = t % 3
            if c == 0:
                b = make_wav_pcm(x, sr)
            elif c == 1:
                b = make_aiff_pcm(x, sr)
            else:
                b = make_wav_pcm(x, sr, bits=8)
            cache[(t, v)] = b
            out.append(b)
        return pd.Series(out)

    clips = d.df.select(
        "doc_id", "lang", doc_clip(F.col("doc_id")).alias("content")
    )
    nullv = F.lit(None).cast("double").alias("v")

    # 'afp': one fingerprint per (template, variant) — strict=True
    # locks every clip onto the REAL PCM decode path (any stub
    # fallback would raise, failing the gate loudly)
    hashed = audio_fingerprint(
        Tibble(clips), "content", out_col="afp", strict=True
    ).df
    afp_block = (
        hashed.groupBy(
            (F.col("doc_id") % 16).alias("t"),
            ((F.col("doc_id") / 16).cast("long") % 2).alias("vv"),
        )
        .agg(F.countDistinct("afp").cast("double").alias("v"))
        .select(
            F.lit("afp").alias("op"), F.col("t").alias("doc_id"),
            F.col("vv").cast("string").alias("lang"), "v",
        )
    )

    # 'apair': near-dup pairs over one representative per (t, v)
    reps = (
        d.df.groupBy(
            (F.col("doc_id") % 16).alias("t"),
            ((F.col("doc_id") / 16).cast("long") % 2).alias("vv"),
        )
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", doc_clip(F.col("doc_id")).alias("content"))
    )
    apair_block = audio_near_dup_pairs(
        Tibble(reps), "content", id_col="doc_id", max_hamming=6,
        strict=True,
    ).df.select(
        F.lit("apair").alias("op"),
        F.col("id_a").alias("doc_id"),
        F.col("id_b").cast("string").alias("lang"),
        nullv,
    )

    # 'amask'/'afold': the persistent index lifecycle with deletion
    aidx_path = tempfile.mkdtemp(prefix="q70_aidx_") + "/idx"
    audio_index_build(
        Tibble(clips.filter(F.col("doc_id") % 16 < 12)),
        "content", "doc_id", aidx_path, strict=True,
    )
    audio_index_delete(
        spark, aidx_path,
        d.df.filter(F.col("doc_id") % 16 == 11).select("doc_id"),
    )
    batch = Tibble(clips.filter(F.col("doc_id") % 16 >= 8))
    amask_block = dedup_against_audio_index(
        batch, aidx_path, strict=True,
    ).df.select(F.lit("amask").alias("op"), "doc_id", "lang", nullv)
    # force the mask-path evaluation BEFORE the compact mutates the
    # store (both legs share one lazy source otherwise)
    amask_block = amask_block.localCheckpoint(eager=True)
    audio_index_compact(spark, aidx_path)
    afold_block = dedup_against_audio_index(
        batch, aidx_path, strict=True,
    ).df.select(F.lit("afold").alias("op"), "doc_id", "lang", nullv)

    # ---- VIDEO legs (r14): the same contract under the temporal-
    # median fingerprint. Clips synthesize per (template, variant):
    # template = doc_id % 8 seeds a random-walk frame stack (4 frames,
    # 16x24 base, x4 blocky upsample so the JPEG DC thumbnail recovers
    # a smoothed base raster), variant = (doc_id // 8) % 2 selects a
    # quality-90 4:4:4 vs quality-40 4:2:0 MJPEG re-encode (<= 2
    # fingerprint bits measured within template vs >= 25 across, all
    # 16 combos — budget 6). Index legs: templates 0..5 index to disk,
    # template 5's ids are tombstoned, the batch (templates >= 4)
    # dedups before the compact (mask path) and after it (folded path)
    # — survivors both times have template >= 5. The video legs bound
    # to doc_id < 240 (30 replicas per template — replica fan-out
    # still exercised) so the per-row JPEG frame decode keeps q70's
    # cost flat across scale factors; the audio legs stay corpus-wide.
    from datar_polars_spark.scale import (
        dedup_against_video_index,
        video_fingerprint,
        video_index_build,
        video_index_compact,
        video_index_delete,
        video_near_dup_pairs,
    )

    @F.pandas_udf(BinaryType())
    def doc_vid(doc_id: pd.Series) -> pd.Series:
        import numpy as np

        from datar_polars_spark.scale.codecs import (
            make_avi_mjpeg,
            make_jpeg_pixels,
        )

        cache = {}  # 16 distinct (template, variant) clips
        out = []
        for d_ in doc_id:
            d_ = int(d_)
            t, v = d_ % 8, (d_ // 8) % 2
            if (t, v) not in cache:
                rng = np.random.default_rng(5000 + t)
                base = rng.integers(32, 224, (16, 24, 3)).astype(np.int16)
                frames = []
                for _ in range(4):
                    base = np.clip(
                        base + rng.integers(-8, 9, (16, 24, 3)), 0, 255
                    )
                    frames.append(
                        np.repeat(
                            np.repeat(base.astype(np.uint8), 4, axis=0),
                            4, axis=1,
                        )
                    )
                cache[(t, v)] = make_avi_mjpeg(
                    [
                        make_jpeg_pixels(
                            fr,
                            quality=90 if v == 0 else 40,
                            subsample=v == 1,
                        )
                        for fr in frames
                    ],
                    fps=10,
                )
            out.append(cache[(t, v)])
        return pd.Series(out)

    vids = (
        d.df.filter(F.col("doc_id") < 240)
        .select("doc_id", "lang", doc_vid(F.col("doc_id")).alias("content"))
    )

    # 'vfp': one fingerprint per (template, variant) — strict=True
    # locks every clip onto the REAL MJPEG frame-decode path
    vhashed = video_fingerprint(
        Tibble(vids), "content", out_col="vfp", strict=True
    ).df
    vfp_block = (
        vhashed.groupBy(
            (F.col("doc_id") % 8).alias("t"),
            ((F.col("doc_id") / 8).cast("long") % 2).alias("vv"),
        )
        .agg(F.countDistinct("vfp").cast("double").alias("v"))
        .select(
            F.lit("vfp").alias("op"), F.col("t").alias("doc_id"),
            F.col("vv").cast("string").alias("lang"), "v",
        )
    )

    # 'vpair': near-dup pairs over one representative per (t, v)
    vreps = (
        d.df.filter(F.col("doc_id") < 240)
        .groupBy(
            (F.col("doc_id") % 8).alias("t"),
            ((F.col("doc_id") / 8).cast("long") % 2).alias("vv"),
        )
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", doc_vid(F.col("doc_id")).alias("content"))
    )
    vpair_block = video_near_dup_pairs(
        Tibble(vreps), "content", id_col="doc_id", max_hamming=6,
        strict=True,
    ).df.select(
        F.lit("vpair").alias("op"),
        F.col("id_a").alias("doc_id"),
        F.col("id_b").cast("string").alias("lang"),
        nullv,
    )

    # 'vdd' (r14): the ONE-CALL perceptual dedup composition
    # (video_dedup = fingerprint -> exact pre-pass -> banded pairs ->
    # component winner) gate-locked with the keep_by policy INVERTED
    # from the default: keep='max' on a quality column equal to doc_id
    # keeps the LARGER rep of each template's near-dup pair, so any
    # wiring bug that silently falls back to min-id flips every row
    from datar_polars_spark.scale import video_dedup

    vdd_block = video_dedup(
        Tibble(vreps.withColumn("q", F.col("doc_id").cast("double"))),
        "content", id_col="doc_id", max_hamming=6, strict=True,
        keep_by="q", keep="max",
    ).df.select(
        F.lit("vdd").alias("op"),
        "doc_id",
        (F.col("doc_id") % 8).cast("string").alias("lang"),
        nullv,
    )

    # 'vmask'/'vfold': the persistent index lifecycle with deletion
    vidx_path = tempfile.mkdtemp(prefix="q70_vidx_") + "/idx"
    video_index_build(
        Tibble(vids.filter(F.col("doc_id") % 8 < 6)),
        "content", "doc_id", vidx_path, strict=True,
    )
    video_index_delete(
        spark, vidx_path,
        d.df.filter(
            (F.col("doc_id") % 8 == 5) & (F.col("doc_id") < 240)
        ).select("doc_id"),
    )
    vbatch = Tibble(vids.filter(F.col("doc_id") % 8 >= 4))
    vmask_block = dedup_against_video_index(
        vbatch, vidx_path, strict=True,
    ).df.select(F.lit("vmask").alias("op"), "doc_id", "lang", nullv)
    vmask_block = vmask_block.localCheckpoint(eager=True)
    video_index_compact(spark, vidx_path)
    vfold_block = dedup_against_video_index(
        vbatch, vidx_path, strict=True,
    ).df.select(F.lit("vfold").alias("op"), "doc_id", "lang", nullv)

    return (
        afp_block.unionByName(apair_block)
        .unionByName(amask_block)
        .unionByName(afold_block)
        .unionByName(vfp_block)
        .unionByName(vpair_block)
        .unionByName(vdd_block)
        .unionByName(vmask_block)
        .unionByName(vfold_block)
        .orderBy("op", "doc_id", "lang")
    )


# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_select_mutate": q02_select_mutate,
        "q03_filter_between_regex": q03_filter_between_regex,
        "q04_count_weighted": q04_count_weighted,
        "q05_distinct": q05_distinct,
        "q06_join_revenue_per_nation": q06_join_revenue_per_nation,
        "q07_left_join_zero_counts": q07_left_join_zero_counts,
        "q08_semi_anti_join": q08_semi_anti_join,
        "q10_topk_per_group": q10_topk_per_group,
        "q12_lag_cumsum": q12_lag_cumsum,
        "q13_conditionals": q13_conditionals,
        "q14_decontaminate": q14_decontaminate,
        "q15_string_functions": q15_string_functions,
        "q16_bind_rows": q16_bind_rows,
        "q17_set_ops": q17_set_ops,
        "q19_quantiles": q19_quantiles,
        "q20_n_distinct": q20_n_distinct,
        "q21_slice_min": q21_slice_min,
        "q22_group_deviation": q22_group_deviation,
        "q23_events_daily": q23_events_daily,
        "q25_rows_upsert": q25_rows_upsert,
        "q26_pivot": q26_pivot,
        "q28_separate_unite": q28_separate_unite,
        "q29_separate_rows_uncount": q29_separate_rows_uncount,
        "q30_fill_gaps": q30_fill_gaps,
        "q31_nest_unnest_roundtrip": q31_nest_unnest_roundtrip,
        "q32_complete_grid": q32_complete_grid,
        "q33_dedup": q33_dedup,
        "q35_text_stats": q35_text_stats,
        "q37_ann_topk": q37_ann_topk,
        "q38_minhash_dedup": q38_minhash_dedup,
        "q41_fct_lump": q41_fct_lump,
        "q42_cut_buckets": q42_cut_buckets,
        "q43_group_modify": q43_group_modify,
        "q44_add_count": q44_add_count,
        "q45_gopher_packing": q45_gopher_packing,
        "q47_row_stats": q47_row_stats,
        "q48_streaming": q48_streaming,
        "q51_sessionize": q51_sessionize,
        "q53_nest_join": q53_nest_join,
        "q60_col_random": q60_col_random,
        "q61_seeded_fuzz": q61_seeded_fuzz,
        "q62_semantic_dedup": q62_semantic_dedup,
        "q64_seeded_join_fuzz": q64_seeded_join_fuzz,
        "q65_rolling_windows": q65_rolling_windows,
        "q66_trailing_time_window": q66_trailing_time_window,
        "q67_relevance": q67_relevance,
        "q68_semantic_decon": q68_semantic_decon,
        "q69_curation": q69_curation,
        "q70_av_dedup": q70_av_dedup,
        # Registered last on purpose: the driver verifies the first 50
        # entries, which must stay exactly the r14 set (dropping any of
        # them is a gate regression); q46 rides in slot 51 so it is
        # declared (and oracle-green if checked) without displacing q70.
        "q46_fct_collapse": q46_fct_collapse,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_extendedprice), 4) AS avg_price,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q02_select_mutate": """
            SELECT l_orderkey, l_linenumber,
                   CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS disc_price_c,
                   CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT) AS charge_c
            FROM lineitem WHERE l_quantity >= 45
            ORDER BY l_orderkey, l_linenumber
        """,
        "q03_filter_between_regex": """
            SELECT p_partkey, p_name, p_type, p_size
            FROM part
            WHERE p_size BETWEEN 10 AND 20 AND regexp_matches(p_type, '^PROMO')
            ORDER BY p_partkey
        """,
        "q04_count_weighted": """
            SELECT l_returnflag, ROUND(CAST(SUM(l_quantity) AS DOUBLE), 4) AS total_qty
            FROM lineitem GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "q05_distinct": """
            SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
            ORDER BY o_orderstatus, o_orderpriority
        """,
        "q06_join_revenue_per_nation": """
            SELECT n_name,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
                   COUNT(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
            ORDER BY n_name
        """,
        "q07_left_join_zero_counts": """
            SELECT c_custkey, c_mktsegment,
                   CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_big
            FROM customer c
            LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 150000) o
              ON c.c_custkey = o.o_custkey
            GROUP BY c_custkey, c_mktsegment
            ORDER BY c_custkey
        """,
        "q08_semi_anti_join": """
            SELECT 'semi' AS op, c_custkey, c_name
            FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
            UNION ALL
            SELECT 'anti' AS op, c_custkey, c_name
            FROM customer
            WHERE c_custkey NOT IN (
                SELECT o_custkey FROM orders
                WHERE o_totalprice > 300000 AND o_custkey IS NOT NULL)
            ORDER BY op, c_custkey
        """,
        "q10_topk_per_group": """
            SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS r
                FROM orders
            ) WHERE r <= 3
            ORDER BY o_orderpriority, o_orderkey
        """,
        "q12_lag_cumsum": """
            SELECT o_orderkey, o_custkey,
                   ROUND(o_totalprice - LAG(o_totalprice) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderkey), 4) AS delta,
                   ROUND(SUM(o_totalprice) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running
            FROM orders
            ORDER BY o_orderkey
        """,
        "q13_conditionals": """
            SELECT CASE WHEN l_extendedprice < 20000 THEN 'small'
                        WHEN l_extendedprice < 60000 THEN 'medium'
                        ELSE 'large' END AS bucket,
                   COUNT(*) AS n,
                   CAST(SUM(CASE WHEN l_extendedprice < 20000 THEN 1 ELSE 0 END) AS BIGINT) AS n_cheap,
                   CAST(SUM(CASE WHEN COALESCE(NULLIF(l_discount, 0.0), -1.0) = -1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_no_disc
            FROM lineitem GROUP BY 1
            ORDER BY bucket
        """,
        "q14_decontaminate": """
            WITH w AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                                   x -> len(x) > 0) AS words
                FROM documents),
            g AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(words) - 1),
                              i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS gram
                FROM w),
            b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0),
            t AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                FROM documents),
            sg AS (
                SELECT doc_id,
                       list_distinct([array_to_string(toks[i+1:i+3], ' ')
                                      FOR i IN range(0, greatest(len(toks)-3, 0)+1)]) AS grams
                FROM t),
            fz AS (
                SELECT a.doc_id, CAST(COUNT(DISTINCT bb.doc_id) AS BIGINT) AS val
                FROM sg a JOIN sg bb
                  ON a.doc_id % 17 != 0 AND bb.doc_id % 17 = 0
                 AND len(list_intersect(a.grams, bb.grams)) * 1.0
                     / len(list_distinct(a.grams || bb.grams)) >= 0.5
                GROUP BY a.doc_id)
            SELECT op, doc_id, val FROM (
                SELECT 'exact' AS op, g.doc_id, CAST(COUNT(*) AS BIGINT) AS val
                FROM g JOIN b USING (gram)
                GROUP BY g.doc_id
                HAVING COUNT(*) > 0
                UNION ALL
                SELECT 'fuzzy' AS op, doc_id, val FROM fz
            ) ORDER BY op, doc_id
        """,
        "q15_string_functions": """
            SELECT c_custkey,
                   UPPER(c_mktsegment) AS seg_upper,
                   SUBSTRING(c_name, 2, 7) AS name_pfx,
                   CAST(LENGTH(c_name) AS INT) AS name_len,
                   c_mktsegment || '-' || CAST(c_custkey AS VARCHAR) AS tag
            FROM customer WHERE c_acctbal > 9000
            ORDER BY c_custkey
        """,
        "q16_bind_rows": """
            SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
            FROM orders WHERE o_totalprice > 250000 OR o_totalprice < 10000
            ORDER BY o_orderkey
        """,
        "q17_set_ops": """
            WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 100000),
                 b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
            SELECT 'intersect' AS op, o_custkey FROM (
                SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
            UNION ALL
            SELECT 'setdiff' AS op, o_custkey FROM (
                SELECT DISTINCT o_custkey FROM orders
                EXCEPT
                SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
            UNION ALL
            SELECT 'union' AS op, o_custkey FROM (
                SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)
            ORDER BY op, o_custkey
        """,
        "q19_quantiles": """
            SELECT l_returnflag,
                   ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS med_price,
                   ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
                   ROUND(stddev_samp(l_extendedprice), 4) AS sd_price
            FROM lineitem GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "q20_n_distinct": """
            SELECT l_returnflag,
                   COUNT(DISTINCT l_partkey) AS n_parts,
                   COUNT(DISTINCT l_suppkey) AS n_supps,
                   COUNT(*) AS n_rows,
                   TRUE AS within_bounds
            FROM lineitem GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "q21_slice_min": """
            SELECT p_brand, p_partkey, p_retailprice FROM (
                SELECT p_brand, p_partkey, p_retailprice,
                       RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice ASC) AS r
                FROM part
            ) WHERE r <= 1
            ORDER BY p_brand, p_partkey
        """,
        "q22_group_deviation": """
            SELECT l_orderkey, l_linenumber, l_suppkey,
                   ROUND(l_extendedprice / supp_avg, 4) AS ratio
            FROM (
                SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
                       AVG(l_extendedprice) OVER (PARTITION BY l_suppkey) AS supp_avg
                FROM lineitem
            ) WHERE l_extendedprice > 2 * supp_avg
            ORDER BY l_orderkey, l_linenumber, l_suppkey, ratio
        """,
        "q23_events_daily": """
            -- the mean travels as an exact fixed-point sum + count:
            -- ROUND(AVG, 4) flipped on a .00005 tie at sf0.001
            SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS BIGINT)
                       AS value_sum_e4
            FROM events GROUP BY 1, 2
            ORDER BY day, event_type
        """,
        "q25_rows_upsert": """
            WITH x AS (
                SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey <= 1000
            ), y AS (
                SELECT c_custkey, ROUND(c_acctbal * 2, 4) AS c_acctbal
                FROM customer WHERE c_acctbal > 5000
            ), ups AS (
                SELECT 'upsert' AS op,
                       CAST(COALESCE(x.c_custkey, y.c_custkey) AS BIGINT) AS key,
                       CAST(ROUND(COALESCE(y.c_acctbal, x.c_acctbal), 4) AS DOUBLE) AS val
                FROM x FULL JOIN y ON x.c_custkey = y.c_custkey
            ), zagg AS (
                -- the z-ordered LAYOUT must not change answers: the box
                -- aggregate recomputes from the original orders table
                SELECT 'zorder_agg' AS op,
                       CAST(COUNT(*) AS BIGINT) AS key,
                       CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)), 0) AS DOUBLE) AS val
                FROM orders
                WHERE o_custkey BETWEEN 100 AND 400
                  AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
            )
            SELECT op, key, val FROM ups
            UNION ALL SELECT op, key, val FROM zagg
            UNION ALL SELECT 'zorder_pruned', 1, 1.0
            ORDER BY op, key, val
        """,
        "q26_pivot": """
            WITH counts AS (
                SELECT l_returnflag, l_linestatus, COUNT(*) AS n
                FROM lineitem GROUP BY 1, 2
            ), rf AS (SELECT DISTINCT l_returnflag FROM lineitem),
               st AS (SELECT DISTINCT l_linestatus FROM lineitem)
            SELECT op, key, metric, val FROM (
                SELECT 'li' AS op, r.l_returnflag AS key, s.l_linestatus AS metric,
                       CAST(COALESCE(c.n, 0) AS DOUBLE) AS val
                FROM rf r CROSS JOIN st s
                LEFT JOIN counts c
                  ON c.l_returnflag = r.l_returnflag AND c.l_linestatus = s.l_linestatus
                UNION ALL
                SELECT 'part', LPAD(CAST(p_partkey AS VARCHAR), 8, '0'),
                       'p_retailprice', ROUND(p_retailprice, 4) FROM part
                UNION ALL
                SELECT 'part', LPAD(CAST(p_partkey AS VARCHAR), 8, '0'),
                       'p_size', ROUND(CAST(p_size AS DOUBLE), 4) FROM part
            ) ORDER BY op, key, metric
        """,
        "q28_separate_unite": """
            SELECT p_partkey,
                   p_brand || ':' || split_part(p_type, ' ', 1) AS brand_type,
                   CASE WHEN strpos(p_type, ' ') > 0
                        THEN substring(p_type, strpos(p_type, ' ') + 1)
                        ELSE NULL END AS t2
            FROM part
            ORDER BY p_partkey
        """,
        "q29_separate_rows_uncount": """
            WITH base AS (
                SELECT doc_id, lang, source, CAST(n_chars % 3 AS BIGINT) AS w
                FROM documents WHERE doc_id < 50
            )
            SELECT doc_id, lang, tag AS tags
            FROM base, UNNEST([lang, source]) AS u(tag),
                 UNNEST(generate_series(1, w)) AS g(c)
            WHERE w > 0
            ORDER BY doc_id, tags
        """,
        "q30_fill_gaps": """
            SELECT o_orderkey, o_custkey,
                   LAST_VALUE(CASE WHEN o_totalprice > 150000 THEN ROUND(o_totalprice, 4) END IGNORE NULLS)
                       OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bp_dn,
                   FIRST_VALUE(CASE WHEN o_totalprice > 150000 THEN ROUND(o_totalprice, 4) END IGNORE NULLS)
                       OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bp_up
            FROM orders
            ORDER BY o_orderkey
        """,
        "q31_nest_unnest_roundtrip": """
            SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
            FROM orders
            ORDER BY o_orderkey
        """,
        "q32_complete_grid": """
            WITH counts AS (
                SELECT l_returnflag, l_linestatus, COUNT(*) AS n
                FROM lineitem GROUP BY 1, 2
            ), grid AS (
                SELECT rf.l_returnflag, ls.l_linestatus
                FROM (SELECT DISTINCT l_returnflag FROM lineitem) rf
                CROSS JOIN (SELECT DISTINCT l_linestatus FROM lineitem) ls
            )
            SELECT g.l_returnflag, g.l_linestatus, COALESCE(c.n, 0) AS n
            FROM grid g LEFT JOIN counts c
              ON g.l_returnflag = c.l_returnflag AND g.l_linestatus = c.l_linestatus
            ORDER BY g.l_returnflag, g.l_linestatus
        """,
        "q33_dedup": r"""
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(lower(trim(text)), '\s+') AS w
                FROM documents
            ),
            positions AS (
                SELECT doc_id, w,
                       unnest(generate_series(0, len(w) - 8)) AS pos
                FROM toks WHERE len(w) >= 8
            ),
            grams AS (
                SELECT doc_id, pos,
                       array_to_string(w[pos + 1 : pos + 8], ' ') AS gram
                FROM positions
            ),
            cnt AS (SELECT gram, COUNT(*) AS c FROM grams GROUP BY gram),
            flagged AS (
                SELECT g.doc_id, g.pos
                FROM grams g JOIN cnt USING (gram) WHERE c >= 2
            ),
            islands AS (
                SELECT doc_id, pos,
                       SUM(CASE WHEN prev IS NULL OR pos > prev + 8
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY doc_id ORDER BY pos) AS isl
                FROM (
                    SELECT doc_id, pos,
                           LAG(pos) OVER (
                               PARTITION BY doc_id ORDER BY pos) AS prev
                    FROM flagged
                )
            ),
            spans AS (
                SELECT doc_id, isl,
                       MIN(pos) AS s, MAX(pos) + 8 AS e
                FROM islands GROUP BY doc_id, isl
            ),
            span_docs AS (
                SELECT doc_id,
                       string_agg(s || '-' || e, ',' ORDER BY s) AS key,
                       CAST(SUM(e - s) AS BIGINT) AS dup_words
                FROM spans GROUP BY doc_id
            ),
            -- r7 mask blocks: word coverage of flagged grams, keep=all
            -- vs keep=first (each gram's min (doc_id, pos) occurrence
            -- excluded before the coverage union)
            occ_rank AS (
                SELECT g.doc_id, g.pos,
                       ROW_NUMBER() OVER (
                           PARTITION BY g.gram
                           ORDER BY g.doc_id, g.pos) AS rn
                FROM grams g JOIN cnt USING (gram) WHERE c >= 2
            ),
            mask_cov AS (
                SELECT 'all' AS variant, doc_id, COUNT(DISTINCT idx) AS cov
                FROM (SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS idx
                      FROM flagged)
                GROUP BY doc_id
                UNION ALL
                SELECT 'first', doc_id, COUNT(DISTINCT idx)
                FROM (SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS idx
                      FROM occ_rank WHERE rn > 1)
                GROUP BY doc_id
            ),
            wcount AS (
                SELECT doc_id,
                       len(list_filter(string_split_regex(trim(text), '\s+'),
                                       x -> len(x) > 0)) AS nw
                FROM documents
            ),
            mask_stats AS (
                SELECT v.variant,
                       CAST(SUM(w.nw - COALESCE(m.cov, 0)) AS BIGINT) AS surv,
                       CAST(SUM(CASE WHEN COALESCE(m.cov, 0) > 0
                                     THEN 1 ELSE 0 END) AS BIGINT) AS changed
                FROM (SELECT 'all' AS variant UNION ALL SELECT 'first') v
                CROSS JOIN wcount w
                LEFT JOIN mask_cov m
                    ON m.variant = v.variant AND m.doc_id = w.doc_id
                GROUP BY v.variant
            )
            SELECT op, key, n_copies, keep_id FROM (
                SELECT 'exact' AS op,
                       COALESCE(lang, '<NA>') || '|' || COALESCE(source, '<NA>') AS key,
                       CAST(NULL AS BIGINT) AS n_copies,
                       MIN(doc_id) AS keep_id
                FROM documents GROUP BY lang, source
                UNION ALL
                -- r14 keep_by leg: winner per (lang, source) = the
                -- LONGEST text, ties to the smallest doc_id, NULL
                -- text length always loses
                SELECT 'best',
                       COALESCE(lang, '<NA>') || '|' || COALESCE(source, '<NA>'),
                       CAST(LENGTH(text) AS BIGINT), doc_id
                FROM (
                    SELECT lang, source, text, doc_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY lang, source
                               ORDER BY LENGTH(text) DESC NULLS LAST,
                                        doc_id ASC) AS rn
                    FROM documents
                ) WHERE rn = 1
                UNION ALL
                SELECT 'fp', md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
                       COUNT(*), MIN(doc_id)
                FROM documents GROUP BY 2
                UNION ALL
                SELECT 'spans', key, dup_words, doc_id FROM span_docs
                UNION ALL
                SELECT 'mask', variant, surv, changed FROM mask_stats
            ) ORDER BY op, key, keep_id
        """,
        "q35_text_stats": """
            WITH stats AS (
                SELECT lang, doc_id, n_chars,
                       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                       len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tokens,
                       ROUND(
                         list_sum(list_transform(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                                 t -> length(t)))
                         / GREATEST(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 1),
                         4) AS mwl,
                       (CASE WHEN length(text) BETWEEN 100 AND 10000 THEN 0.4 ELSE 0 END)
                     + (CASE WHEN len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0
                               / GREATEST(length(text), 1) < 0.2 THEN 0.2 ELSE 0 END)
                     + (CASE WHEN len(regexp_extract_all(text, '[0-9]')) * 1.0
                               / GREATEST(length(text), 1) < 0.3 THEN 0.2 ELSE 0 END)
                     + (CASE WHEN
                           list_sum(list_transform(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> length(t)))
                           * 1.0 / GREATEST(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 1)
                           BETWEEN 2 AND 12 THEN 0.2 ELSE 0 END) AS q,
                       -- r12 readability leg: same token/sentence/
                       -- vowel-group heuristics as the Spark registry
                       ROUND(206.835
                         - 1.015 * (GREATEST(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 1) * 1.0
                                    / GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1))
                         - 84.6 * (len(regexp_extract_all(lower(text), '[aeiouy]+')) * 1.0
                                   / GREATEST(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 1)),
                         4) AS fre,
                       ROUND(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) * 1.0
                             / GREATEST(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 1),
                         4) AS ttr
                FROM documents
            )
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(tokens) AS BIGINT) AS total_tokens,
                   ROUND(AVG(mwl), 4) AS avg_mwl,
                   ROUND(AVG(fre), 4) AS avg_fre,
                   ROUND(AVG(ttr), 4) AS avg_ttr,
                   CAST(SUM(CASE WHEN q >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_hq,
                   CAST(SUM(n_bytes) AS BIGINT) AS bytes_sum,
                   16 AS feat_dim_max,
                   CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_png,
                   CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tiff,
                   CAST(SUM(doc_id % 1000 + 1) AS BIGINT) AS img_w_sum,
                   CAST(SUM(n_chars % 1000 + 1) AS BIGINT) AS img_h_sum,
                   CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_wav,
                   CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_mp3,
                   CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 44100 END) AS BIGINT) AS rate_sum,
                   CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN n_chars * 10
                                 ELSE 1152 * (n_chars % 20 + 1) END) AS BIGINT) AS samples_sum,
                   -- r7 video leg: MP4 box-walk probe must round-trip the
                   -- synthesized dims/duration exactly (v0 and v1 layouts);
                   -- r10: doc_id%4 in (2,3) route to the WebM/Matroska
                   -- EBML walk, reported as 'webm'/'mkv'
                   CAST(SUM(CASE WHEN doc_id % 4 IN (0, 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_mp4,
                   CAST(SUM(CASE WHEN doc_id % 4 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_webm,
                   CAST(SUM(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_mkv,
                   CAST(SUM(doc_id % 1280 + 16) AS BIGINT) AS vid_w_sum,
                   CAST(SUM(n_chars % 720 + 16) AS BIGINT) AS vid_h_sum,
                   CAST(SUM((n_chars % 300 + 1) * 1000) AS BIGINT) AS duration_sum,
                   -- r13 dhash leg: distinct perceptual fingerprints
                   -- must equal distinct raster templates (dHash is
                   -- invariant to the synthesized brightness shift and
                   -- to the PNG/BMP container)
                   CAST(COUNT(DISTINCT doc_id % 4) AS BIGINT) AS n_dhash,
                   CAST(COUNT(DISTINCT doc_id % 4) AS BIGINT) AS n_tmpl
            FROM stats GROUP BY lang
            ORDER BY lang
        """,
        "q37_ann_topk": """
            WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
            scored AS (
                SELECT e.vec_id,
                       list_sum(list_transform(list_zip(e.embedding, q.qe),
                                x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(e.embedding,
                                v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
                          * sqrt(list_sum(list_transform(q.qe,
                                v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
                FROM embeddings e, qv q
            ), top AS (
                SELECT vec_id, ROUND(cos, 4) AS cosine
                FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 10
            )
            , base AS (
                SELECT vec_id,
                       list_transform(embedding, v -> CAST(v AS DOUBLE)) AS embedding
                FROM embeddings
            ), q2 AS (SELECT embedding AS qe FROM base WHERE vec_id = 0),
            planted AS (
                SELECT b.vec_id + 10000 AS vec_id,
                       list_transform(list_zip(q2.qe, b.embedding),
                                      x -> CAST(x[1] AS DOUBLE) + 0.25 * CAST(x[2] AS DOUBLE)) AS embedding
                FROM base b, q2 WHERE b.vec_id BETWEEN 1 AND 10
            ), corpus AS (
                SELECT * FROM base UNION ALL SELECT * FROM planted
            ), lsh_scored AS (
                SELECT c.vec_id,
                       list_sum(list_transform(list_zip(c.embedding, q2.qe),
                                x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(c.embedding,
                                v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
                          * sqrt(list_sum(list_transform(q2.qe,
                                v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
                FROM corpus c, q2
            ), lsh_top AS (
                SELECT vec_id, ROUND(cos, 4) AS cosine
                FROM lsh_scored ORDER BY cos DESC, vec_id ASC LIMIT 10
            ), knn_scored AS (
                SELECT q.vec_id AS query_id, e.vec_id AS match_id,
                       list_sum(list_transform(list_zip(e.embedding, q.embedding),
                                x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(e.embedding,
                                v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
                          * sqrt(list_sum(list_transform(q.embedding,
                                v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
                FROM embeddings e, embeddings q
                WHERE q.vec_id BETWEEN 1 AND 3
            ), knn_top AS (
                SELECT 'knn' || CAST(query_id AS VARCHAR) AS method,
                       match_id AS vec_id, ROUND(cos, 4) AS cosine
                FROM (SELECT *, ROW_NUMBER() OVER (
                          PARTITION BY query_id
                          ORDER BY cos DESC, match_id ASC) AS rn
                      FROM knn_scored)
                WHERE rn <= 5
            )
            SELECT method, vec_id, cosine FROM (
                SELECT 'brute' AS method, vec_id, cosine FROM top
                UNION ALL
                SELECT 'ivf' AS method, vec_id, cosine FROM top
                UNION ALL
                SELECT 'lsh' AS method, vec_id, cosine FROM lsh_top
                UNION ALL
                SELECT method, vec_id, cosine FROM knn_top
                UNION ALL
                -- batch PQ vs Spark-side reconstruction brute force:
                -- symmetric-difference count pinned at zero
                SELECT 'pq_check', 0, 0.0
                UNION ALL
                -- IVF-PQ (residual codes, nprobe = nlist) vs Spark-side
                -- centroid+residual reconstruction brute force:
                -- symmetric-difference count pinned at zero
                SELECT 'ivfpq_check', 0, 0.0
            ) ORDER BY method, cosine DESC, vec_id
        """,
        "q38_minhash_dedup": """
            -- r11: exact-equivalent gram-join formulation instead of
            -- the all-pairs cross join (which was intractable past
            -- sf0.01): |I| counts shared distinct grams per pair,
            -- |U| = |A| + |B| - |I|; zero-overlap pairs have j = 0
            -- and are correctly absent from every leg
            WITH t AS (
                SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                FROM documents
            ), g AS (
                SELECT doc_id,
                       list_distinct([array_to_string(toks[i+1:i+3], ' ')
                                      FOR i IN range(0, greatest(len(toks)-3, 0)+1)]) AS grams
                FROM t
            ), ge AS (
                SELECT doc_id, len(grams) AS sz, unnest(grams) AS gram
                FROM g
            ), jp AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       COUNT(*) * 1.0
                       / (ANY_VALUE(a.sz) + ANY_VALUE(b.sz) - COUNT(*)) AS j
                FROM ge a JOIN ge b
                  ON a.gram = b.gram AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ), dup AS (
                SELECT DISTINCT id_b AS doc_id FROM jp WHERE j >= 0.5
            ),
            -- r12 'idx' leg, r14 retention: the corpus indexed as two
            -- stamped increments (doc_id % 3 = 1 at 10, % 3 = 2 at 20)
            -- and expired before 15, so the LIVE corpus is % 3 = 2
            -- only; batch (doc_id % 3 = 0) drops on identical
            -- normalized text OR cross 3-gram Jaccard >= 0.5 vs LIVE
            cfp AS (
                SELECT DISTINCT md5(regexp_replace(lower(trim(text)),
                                                   '\\s+', ' ', 'g')) AS fp
                FROM documents WHERE doc_id % 3 = 2
            ),
            bdoc AS (
                SELECT doc_id, lang,
                       md5(regexp_replace(lower(trim(text)),
                                          '\\s+', ' ', 'g')) AS fp
                FROM documents WHERE doc_id % 3 = 0
            ),
            xhit AS (
                SELECT b.doc_id
                FROM ge a JOIN ge b
                  ON a.gram = b.gram
                 AND a.doc_id % 3 = 2 AND b.doc_id % 3 = 0
                GROUP BY a.doc_id, b.doc_id
                HAVING COUNT(*) * 1.0
                       / (ANY_VALUE(a.sz) + ANY_VALUE(b.sz) - COUNT(*)) >= 0.5
            ),
            idx_surv AS (
                SELECT doc_id, lang FROM bdoc b
                WHERE NOT EXISTS (SELECT 1 FROM cfp c
                                  WHERE c.fp IS NOT DISTINCT FROM b.fp)
                  AND doc_id NOT IN (SELECT doc_id FROM xhit)
            ),
            -- r12 'prank' leg: 3 unrolled PageRank power iterations
            -- (d = 0.85) over the symmetric supplier<->part graph
            -- (part node ids offset by 1e6; symmetric -> no dangling)
            pe AS (
                SELECT DISTINCT l_suppkey AS s,
                       l_partkey + 1000000 AS p
                FROM lineitem
            ),
            pedges AS (
                SELECT s AS u, p AS v FROM pe
                UNION ALL
                SELECT p AS u, s AS v FROM pe
            ),
            pdeg AS (SELECT u, COUNT(*) AS deg FROM pedges GROUP BY u),
            pn AS (SELECT COUNT(*) AS n FROM pdeg),
            pr0 AS (SELECT u, 1.0 / (SELECT n FROM pn) AS r FROM pdeg),
            pr1 AS (
                SELECT e.v AS u,
                       (1.0 - 0.85) / (SELECT n FROM pn)
                       + 0.85 * SUM(r.r / d.deg) AS r
                FROM pedges e
                JOIN pr0 r ON e.u = r.u JOIN pdeg d ON e.u = d.u
                GROUP BY e.v
            ),
            pr2 AS (
                SELECT e.v AS u,
                       (1.0 - 0.85) / (SELECT n FROM pn)
                       + 0.85 * SUM(r.r / d.deg) AS r
                FROM pedges e
                JOIN pr1 r ON e.u = r.u JOIN pdeg d ON e.u = d.u
                GROUP BY e.v
            ),
            pr3 AS (
                SELECT e.v AS u,
                       (1.0 - 0.85) / (SELECT n FROM pn)
                       + 0.85 * SUM(r.r / d.deg) AS r
                FROM pedges e
                JOIN pr2 r ON e.u = r.u JOIN pdeg d ON e.u = d.u
                GROUP BY e.v
            )
            SELECT op, doc_id, lang, v FROM (
                SELECT 'minhash' AS op, doc_id, lang,
                       CAST(NULL AS DOUBLE) AS v FROM documents
                WHERE doc_id NOT IN (SELECT doc_id FROM dup)
                UNION ALL
                SELECT 'simhash_check', 0,
                       CAST((SELECT COUNT(*) FROM documents) AS VARCHAR),
                       CAST(NULL AS DOUBLE)
                UNION ALL
                SELECT 'jpair', id_a, CAST(id_b AS VARCHAR), ROUND(j, 4)
                FROM jp WHERE j >= 0.3
                UNION ALL
                SELECT 'idx', doc_id, lang, CAST(NULL AS DOUBLE)
                FROM idx_surv
                UNION ALL
                -- r13 image-index block, r14 retention: the corpus
                -- (templates 0..11 by doc_id % 16) indexed with
                -- per-row stamps (templates < 10 at 10, 10..11 at 20)
                -- then expired before 15, so the LIVE corpus is
                -- templates 10..11 only; survivors are the batch docs
                -- (templates 8..15) whose template is not live:
                -- 8..9 (expired) and 12..15 (never indexed)
                SELECT 'iidx', doc_id, lang, CAST(NULL AS DOUBLE)
                FROM documents
                WHERE doc_id % 16 >= 12
                   OR doc_id % 16 IN (8, 9)
                UNION ALL
                SELECT 'prank', u,
                       CASE WHEN u >= 1000000 THEN 'p' ELSE 's' END,
                       ROUND(r * (SELECT n FROM pn), 4)
                FROM pr3
            ) ORDER BY op, doc_id, lang
        """,
        "q41_fct_lump": """
            -- 'lump' block: fct_infreq + fct_lump_n + factor codes;
            -- 'coll' block (merged r14 q41+q46): fct_collapse with the
            -- NULL level preserved, code NULL (no infreq coding)
            WITH cnt AS (
                SELECT event_type, COUNT(*) AS c
                FROM events WHERE event_type IS NOT NULL
                GROUP BY event_type
            ), ranked AS (
                SELECT event_type, c,
                       ROW_NUMBER() OVER (ORDER BY c DESC, event_type ASC) AS rn
                FROM cnt
            )
            SELECT op, event_type, code, n FROM (
                SELECT 'lump' AS op,
                       CASE WHEN rn <= 3 THEN event_type ELSE 'Other' END AS event_type,
                       CAST(CASE WHEN rn <= 3 THEN rn ELSE 4 END AS BIGINT) AS code,
                       CAST(SUM(c) AS BIGINT) AS n
                FROM ranked GROUP BY 1, 2, 3
                UNION ALL
                SELECT 'coll',
                       CASE WHEN event_type IN ('click', 'view') THEN 'engagement'
                            WHEN event_type IN ('signup', 'purchase') THEN 'conversion'
                            WHEN event_type IS NULL THEN NULL
                            ELSE 'misc' END,
                       CAST(NULL AS BIGINT),
                       COUNT(*)
                FROM events GROUP BY 2
            ) ORDER BY op, code NULLS LAST, event_type NULLS LAST
        """,
        "q42_cut_buckets": """
            WITH b AS (
                SELECT CASE WHEN l_quantity > 0  AND l_quantity <= 10 THEN 'low'
                            WHEN l_quantity > 10 AND l_quantity <= 25 THEN 'mid'
                            WHEN l_quantity > 25 AND l_quantity <= 50 THEN 'high'
                       END AS bucket,
                       l_returnflag
                FROM lineitem
            ), counts AS (
                SELECT bucket, l_returnflag, COUNT(*) AS n FROM b GROUP BY 1, 2
            ), grid AS (
                SELECT x.bucket, y.l_returnflag
                FROM (SELECT DISTINCT bucket FROM b) x
                CROSS JOIN (SELECT DISTINCT l_returnflag FROM b) y
            )
            SELECT g.bucket, g.l_returnflag, COALESCE(c.n, 0) AS n
            FROM grid g LEFT JOIN counts c
              ON g.bucket = c.bucket AND g.l_returnflag = c.l_returnflag
            ORDER BY g.bucket, g.l_returnflag
        """,
        "q43_group_modify": """
            SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
            FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
            ) WHERE rn <= 2
            ORDER BY o_orderpriority, o_orderkey
        """,
        "q44_add_count": """
            SELECT o_orderkey, o_custkey, n FROM (
                SELECT o_orderkey, o_custkey,
                       COUNT(*) OVER (PARTITION BY o_custkey) AS n
                FROM orders
            ) WHERE n >= 18
            ORDER BY o_orderkey
        """,
        "q45_gopher_packing": """
            WITH w AS (
                SELECT doc_id, text,
                       list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                                   x -> len(x) > 0) AS words,
                       len(string_split_regex(trim(lower(text)), '\\s+')) AS toks,
                       list_filter(string_split_regex(trim(text), '\\s+'),
                                   x -> len(x) > 0) AS wtoks
                FROM documents),
            g AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(words)),
                              i -> words[i] || ' ' || words[i+1])) AS gram
                FROM w),
            g2 AS (SELECT doc_id, gram, COUNT(*) AS c, LEN(gram) AS L
                   FROM g GROUP BY doc_id, gram),
            m AS (SELECT doc_id, MAX(c * L) AS top_chars,
                         SUM(CASE WHEN c > 1 THEN c * L ELSE 0 END) AS dup_chars
                  FROM g2 GROUP BY doc_id),
            metrics AS (
                SELECT w.doc_id, w.toks,
                       ROUND(COALESCE(m.top_chars, 0) * 1.0 / LEN(w.text), 4) AS top2,
                       ROUND(COALESCE(m.dup_chars, 0) * 1.0 / LEN(w.text), 4) AS dup2,
                       ROUND(len(list_filter(w.wtoks, x -> regexp_matches(x, '[A-Za-z]')))
                             * 1.0 / len(w.wtoks), 4) AS awr
                FROM w LEFT JOIN m USING (doc_id)),
            packed AS (
                SELECT *,
                       CAST(FLOOR(COALESCE(SUM(toks) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                           / 500.0) AS BIGINT) AS pack_id
                FROM metrics),
            -- r7 chunk_documents proof: max_tokens=120, overlap=10
            -- (step 110); per-doc chunk count, per-chunk token counts,
            -- rewritten-text char lengths (sum of token lengths +
            -- single-space joins — pins the overlap regions exactly)
            cdoc AS (
                SELECT doc_id, wtoks, len(wtoks) AS n,
                       CASE WHEN len(wtoks) <= 120 THEN 1
                            ELSE 1 + CAST(CEIL((len(wtoks) - 120) / 110.0) AS BIGINT)
                       END AS c
                FROM w),
            cstat AS (
                SELECT
                    CAST(SUM(c) AS BIGINT) AS n_chunks,
                    CAST(SUM(list_sum([GREATEST(LEAST(n - i*110, 120), 0)
                                       FOR i IN range(0, c)])) AS BIGINT) AS tok_sum,
                    CAST(SUM(c*(c-1)//2) AS BIGINT) AS cid_sum,
                    CAST(SUM(list_sum([
                        COALESCE(list_sum(list_transform(
                            wtoks[i*110+1 : i*110+120], x -> len(x))), 0)
                        + GREATEST(len(wtoks[i*110+1 : i*110+120]) - 1, 0)
                        FOR i IN range(0, c)])) AS BIGINT) AS chars_sum,
                    CAST(SUM(len(list_filter([LEAST(n - i*110, 120)
                                              FOR i IN range(0, c)],
                                             t -> t = 120))) AS BIGINT) AS full_chunks
                FROM cdoc)
            SELECT * FROM (
                SELECT pack_id,
                       COUNT(*) AS n_docs,
                       CAST(SUM(toks) AS BIGINT) AS tok_total,
                       CAST(SUM(CAST(ROUND(top2 * 10000, 0) AS BIGINT)) AS BIGINT) AS sum_top2_e4,
                       CAST(SUM(CAST(ROUND(dup2 * 10000, 0) AS BIGINT)) AS BIGINT) AS sum_dup2_e4,
                       CAST(SUM(CAST(ROUND(awr * 10000, 0) AS BIGINT)) AS BIGINT) AS sum_awr_e4
                FROM packed GROUP BY pack_id
                UNION ALL
                SELECT -1, n_chunks, tok_sum, cid_sum, chars_sum, full_chunks
                FROM cstat
                UNION ALL
                -- r10: the exact token_counts path under uniform
                -- all-ones costs is contractually identical to the
                -- whitespace path, so the same figures recur at -2
                SELECT -2, n_chunks, tok_sum, cid_sum, chars_sum, full_chunks
                FROM cstat
            ) ORDER BY pack_id
        """,
        "q47_row_stats": """
            SELECT p_partkey,
                   ROUND(p_retailprice + p_size, 4) AS rs,
                   ROUND((p_retailprice + p_size) / 2, 4) AS rm,
                   ROUND(SQRT(POWER(p_retailprice - (p_retailprice + p_size) / 2, 2)
                            + POWER(p_size - (p_retailprice + p_size) / 2, 2)), 4) AS rsd,
                   ROUND(GREATEST(p_retailprice, CAST(p_size AS DOUBLE)), 4) AS rmed,
                   ROUND(p_retailprice + p_size, 4) AS ca
            FROM part WHERE ROUND(p_retailprice + p_size, 4) > 990
            ORDER BY p_partkey
        """,
        # both streaming answers (windowed + stateful) == their batch aggs
        "q48_streaming": """
            SELECT op, k, n_events, total, max_value FROM (
                SELECT 'win' AS op,
                       CAST(CAST(ts AS DATE) AS VARCHAR) || '|' || event_type AS k,
                       COUNT(*) AS n_events,
                       ROUND(SUM(value), 4) AS total,
                       CAST(NULL AS DOUBLE) AS max_value
                FROM events GROUP BY 2
                UNION ALL
                SELECT 'state', LPAD(CAST(user_id AS VARCHAR), 10, '0'),
                       COUNT(*), ROUND(SUM(value), 4), ROUND(MAX(value), 4)
                FROM events GROUP BY user_id
                UNION ALL
                SELECT 'neardup', 'diff', 0,
                       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
                UNION ALL
                SELECT 'neardup', 'self',
                       (SELECT COUNT(*) FROM documents
                        WHERE text IS NOT NULL),
                       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
            ) ORDER BY op, k
        """,
        "q51_sessionize": """
            WITH gaps AS (
                SELECT user_id,
                       CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (
                                PARTITION BY user_id ORDER BY ts)) > 1800
                              OR LAG(ts) OVER (
                                PARTITION BY user_id ORDER BY ts) IS NULL
                            THEN 1 ELSE 0 END AS new_s
                FROM events
            ), sess AS (
                SELECT user_id,
                       CAST(SUM(new_s) AS BIGINT) AS n_sessions,
                       COUNT(*) AS total_events
                FROM gaps GROUP BY user_id
            ), runs AS (
                SELECT user_id, CAST(SUM(chg) AS BIGINT) AS n_runs FROM (
                    SELECT user_id,
                           CASE WHEN event_type IS DISTINCT FROM
                                     LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
                                THEN 1 ELSE 0 END AS chg
                    FROM events
                ) GROUP BY user_id
            )
            SELECT s.user_id, s.n_sessions, s.total_events, r.n_runs
            FROM sess s JOIN runs r ON s.user_id = r.user_id
            ORDER BY s.user_id
        """,
        "q53_nest_join": """
            SELECT c.c_custkey, c.c_mktsegment,
                   CAST(COUNT(o.o_orderkey) AS INT) AS n_orders
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey, c.c_mktsegment
            ORDER BY c.c_custkey
        """,
        "q60_col_random": """
            SELECT TRUE AS rbinom_ok,
                   TRUE AS rpois_ok,
                   ROUND(CAST(SUM(l_quantity) AS DOUBLE), 4) AS sum_qty,
                   FLOOR(AVG(l_quantity) * 10000) / 10000 AS mean_qty,
                   ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
                   ROUND(MEDIAN(l_quantity), 4) AS med_qty
            FROM lineitem
        """,
        # generated from the SAME seeded spec as the Spark pipeline
        "q61_seeded_fuzz": _fuzz_sql(),
        "q64_seeded_join_fuzz": _fuzz2_sql(),
        "q65_rolling_windows": """
            SELECT o_orderkey,
                   CASE WHEN rn >= 30 THEN ROUND(rsum, 4) END AS roll_rev,
                   CASE WHEN rn >= 30 THEN ROUND(rmean, 4) END AS roll_avg
            FROM (
                SELECT o_orderkey,
                       ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn,
                       SUM(o_totalprice) OVER (ORDER BY o_orderkey
                           ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS rsum,
                       AVG(o_totalprice) OVER (ORDER BY o_orderkey
                           ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS rmean
                FROM orders)
            ORDER BY o_orderkey
        """,
        "q66_trailing_time_window": """
            SELECT user_id,
                   CAST(ts AS VARCHAR) AS ts,
                   ROUND(SUM(value) OVER w, 4) AS value_sum,
                   CAST(COUNT(value) OVER w AS BIGINT) AS value_count
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
            ORDER BY user_id, ts
        """,
        # planted-duplicate construction: each leg's survivors are
        # exactly the original corpus (see q62 docstring)
        "q62_semantic_dedup": """
            SELECT op, vec_id FROM (
                SELECT 'semantic' AS op, vec_id FROM embeddings
                UNION ALL
                SELECT 'lshdedup', vec_id FROM embeddings
            ) ORDER BY op, vec_id
        """,
        "q67_relevance": r"""
            WITH terms AS (
                SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                FROM (
                    SELECT doc_id,
                           unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
                    FROM documents
                )
                WHERE term <> ''
                GROUP BY doc_id, term
            ),
            ndocs AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
            dfc AS (
                SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM terms GROUP BY term
            ),
            top3 AS (
                SELECT * FROM (
                    SELECT t.doc_id, t.term, t.tf, d.df,
                           t.tf * (LN(CAST(n.n + 1 AS DOUBLE) / (d.df + 1)) + 1.0)
                               AS score,
                           ROW_NUMBER() OVER (
                               PARTITION BY t.doc_id
                               ORDER BY t.tf * (LN(CAST(n.n + 1 AS DOUBLE)
                                   / (d.df + 1)) + 1.0) DESC, t.term ASC
                           ) AS rank
                    FROM terms t JOIN dfc d USING (term) CROSS JOIN ndocs n
                ) WHERE rank <= 3
            ),
            doclen AS (SELECT doc_id, SUM(tf) AS dl FROM terms GROUP BY doc_id),
            stats AS (
                SELECT (SELECT COUNT(DISTINCT doc_id) FROM documents) AS n,
                       (SELECT AVG(dl) FROM doclen) AS avgdl
            ),
            qhits AS (
                SELECT * FROM terms WHERE term IN ('spark', 'vector', 'stream')
            ),
            qdf AS (
                SELECT term, COUNT(DISTINCT doc_id) AS df FROM qhits GROUP BY term
            ),
            bm AS (
                SELECT q.doc_id,
                       SUM(LN(1.0 + (s.n - qd.df + 0.5) / (qd.df + 0.5))
                           * (q.tf * (1.2 + 1))
                           / (q.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
                       ) AS bm25
                FROM qhits q
                JOIN qdf qd USING (term)
                JOIN doclen dl USING (doc_id)
                CROSS JOIN stats s
                GROUP BY q.doc_id
            ),
            tokd AS (
                SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\s+')) AS w,
                       generate_subscripts(
                           string_split_regex(lower(trim(text)), '\s+'), 1) AS i
                FROM documents
            ),
            seq AS (
                SELECT doc_id, w,
                       COALESCE(LAG(w) OVER (
                           PARTITION BY doc_id ORDER BY i), '<s>') AS prev,
                       COALESCE(LAG(w, 2) OVER (
                           PARTITION BY doc_id ORDER BY i), '<s>')
                       || ' ' ||
                       COALESCE(LAG(w) OVER (
                           PARTITION BY doc_id ORDER BY i), '<s>') AS prev2
                FROM tokd WHERE w <> ''
            ),
            refseq AS (
                SELECT s.* FROM seq s
                JOIN documents d ON s.doc_id = d.doc_id
                WHERE d.lang = 'en'
            ),
            uni AS (SELECT w, COUNT(*) AS c FROM refseq GROUP BY w),
            bi AS (
                SELECT prev, w, COUNT(*) AS c FROM refseq GROUP BY prev, w
            ),
            tri AS (
                SELECT prev2, w, COUNT(*) AS c FROM refseq GROUP BY prev2, w
            ),
            ctx AS (SELECT prev, SUM(c) AS c FROM bi GROUP BY prev),
            ctx2 AS (SELECT prev2, SUM(c) AS c FROM tri GROUP BY prev2),
            nt AS (SELECT SUM(c) AS n FROM uni),
            sc AS (
                SELECT s.doc_id,
                       CASE WHEN t.c IS NOT NULL
                                THEN CAST(t.c AS DOUBLE) / cx2.c
                            WHEN b.c IS NOT NULL
                                THEN 0.4 * b.c / cx.c
                            WHEN u.c IS NOT NULL
                                THEN 0.16 * u.c / nt.n
                            ELSE 0.16 / nt.n END AS sval,
                       CASE WHEN u.c IS NULL THEN 1.0 ELSE 0.0 END AS oov
                FROM seq s
                LEFT JOIN tri t ON s.prev2 = t.prev2 AND s.w = t.w
                LEFT JOIN ctx2 cx2 ON s.prev2 = cx2.prev2
                LEFT JOIN bi b ON s.prev = b.prev AND s.w = b.w
                LEFT JOIN ctx cx ON s.prev = cx.prev
                LEFT JOIN uni u ON s.w = u.w
                CROSS JOIN nt
            ),
            lm AS (
                SELECT doc_id,
                       ROUND(AVG(LOG10(sval)), 4) AS lm_logprob,
                       ROUND(AVG(oov), 4) AS lm_oov
                FROM sc GROUP BY doc_id
            ),
            -- r7 per-language models: the same trigram count tables and
            -- 3-way backoff CASE, every key widened by lang (training
            -- corpus = the full table, sliced per group)
            seql AS (
                SELECT s.*, d.lang FROM seq s
                JOIN documents d ON s.doc_id = d.doc_id
            ),
            unil AS (SELECT lang, w, COUNT(*) AS c FROM seql GROUP BY lang, w),
            bil AS (
                SELECT lang, prev, w, COUNT(*) AS c
                FROM seql GROUP BY lang, prev, w
            ),
            tril AS (
                SELECT lang, prev2, w, COUNT(*) AS c
                FROM seql GROUP BY lang, prev2, w
            ),
            ctxl AS (SELECT lang, prev, SUM(c) AS c FROM bil GROUP BY lang, prev),
            ctx2l AS (
                SELECT lang, prev2, SUM(c) AS c FROM tril GROUP BY lang, prev2
            ),
            ntl AS (SELECT lang, SUM(c) AS n FROM unil GROUP BY lang),
            scl AS (
                SELECT s.doc_id,
                       CASE WHEN t.c IS NOT NULL
                                THEN CAST(t.c AS DOUBLE) / cx2.c
                            WHEN b.c IS NOT NULL
                                THEN 0.4 * b.c / cx.c
                            WHEN u.c IS NOT NULL
                                THEN 0.16 * u.c / nl.n
                            ELSE 0.16 / nl.n END AS sval
                FROM seql s
                LEFT JOIN tril t
                    ON s.lang = t.lang AND s.prev2 = t.prev2 AND s.w = t.w
                LEFT JOIN ctx2l cx2 ON s.lang = cx2.lang AND s.prev2 = cx2.prev2
                LEFT JOIN bil b
                    ON s.lang = b.lang AND s.prev = b.prev AND s.w = b.w
                LEFT JOIN ctxl cx ON s.lang = cx.lang AND s.prev = cx.prev
                LEFT JOIN unil u ON s.lang = u.lang AND s.w = u.w
                LEFT JOIN ntl nl ON s.lang = nl.lang
            ),
            lml AS (
                SELECT doc_id, ROUND(AVG(LOG10(sval)), 4) AS lm_lang
                FROM scl GROUP BY doc_id
            )
            SELECT top3.doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df,
                   ROUND(score, 4) AS tfidf,
                   ROUND(COALESCE(bm.bm25, 0.0), 4) AS bm25,
                   lm.lm_logprob, lm.lm_oov, lml.lm_lang
            FROM top3
            LEFT JOIN bm USING (doc_id)
            LEFT JOIN lm ON top3.doc_id = lm.doc_id
            LEFT JOIN lml ON top3.doc_id = lml.doc_id
            ORDER BY top3.doc_id, rank
        """,
        "q68_semantic_decon": """
            -- r10 embedding_join broadcast mode is EXACT, so the
            -- brute-force cosine cross join is a value-level oracle;
            -- 'clean' recounts decontaminate_semantic's anti-join
            WITH bench AS (
                SELECT vec_id + 100000 AS bid,
                       list_transform(embedding,
                           v -> CAST(v AS DOUBLE) * 0.5) AS be
                FROM embeddings WHERE vec_id < 10
            ), pairs AS (
                SELECT e.vec_id AS id_a, b.bid AS id_b,
                       list_sum(list_transform(list_zip(e.embedding, b.be),
                           x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(e.embedding,
                             v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
                          * sqrt(list_sum(list_transform(b.be,
                             v -> v * v)))) AS cos
                FROM embeddings e, bench b
            ), hits AS (
                SELECT * FROM pairs WHERE cos >= 0.9
            )
            SELECT 'match' AS op, CAST(id_a AS BIGINT) AS id_a,
                   CAST(id_b AS BIGINT) AS id_b, ROUND(cos, 4) AS cos
            FROM hits
            UNION ALL
            SELECT 'clean',
                   (SELECT COUNT(*) FROM embeddings e2
                    WHERE e2.vec_id NOT IN (SELECT id_a FROM hits)),
                   -1, -1.0
            UNION ALL
            -- r10 audit rows: per contaminated doc, match count +
            -- strongest cosine from the same brute-force pair set
            SELECT 'report', CAST(id_a AS BIGINT),
                   CAST(COUNT(*) AS BIGINT), ROUND(MAX(cos), 4)
            FROM hits GROUP BY id_a
            UNION ALL
            -- r11 LSH-mode rows: scaled-copy benchmark guarantees
            -- candidacy in every band; exact verify makes the LSH
            -- hit set identical to the brute-force one
            SELECT 'lsh', CAST(id_a AS BIGINT),
                   CAST(id_b AS BIGINT), ROUND(cos, 4)
            FROM hits
            UNION ALL
            -- r12 persistent-semantic-index rows: the benchmark
            -- matched AGAINST THE STORE — same pair set, sides
            -- swapped (id_a = benchmark id, id_b = corpus id).
            -- r14 retention: even corpus vectors indexed at stamp 10
            -- then expired before 15 — only the ODD (live) corpus
            -- side may appear
            SELECT 'sidx', CAST(id_b AS BIGINT),
                   CAST(id_a AS BIGINT), ROUND(cos, 4)
            FROM hits WHERE id_a % 2 = 1
            UNION ALL
            -- r13 text_embed rows: the synthesized 60-doc corpus (4
            -- disjoint-vocab templates x 3 variants by doc_id) must
            -- embed to unit-norm vectors whose cos>=0.6 neighbor set
            -- is exactly the template peer set — stated relationally:
            -- each doc's neighbor count is its template's size - 1
            SELECT 'embed', CAST(doc_id AS BIGINT),
                   COUNT(*) OVER (PARTITION BY doc_id % 4) - 1, 1.0
            FROM documents WHERE doc_id < 60
            UNION ALL
            -- identical texts embed identically: distinct vectors per
            -- template == distinct filler variants present
            SELECT 'edet', CAST(1000 + doc_id % 4 AS BIGINT),
                   CAST(COUNT(DISTINCT doc_id % 3) AS BIGINT), -1.0
            FROM documents WHERE doc_id < 60 GROUP BY doc_id % 4
            ORDER BY op, id_a
        """,
        "q70_av_dedup": """
            -- audio + video family oracle, stated relationally: clips
            -- are a pure function of doc_id (audio: template =
            -- doc_id % 16, variant = (doc_id // 16) % 2; video:
            -- template = doc_id % 8, variant = (doc_id // 8) % 2), so
            -- fingerprint identity is (t, v) identity, near-dup pairs
            -- over per-(t,v) representatives are same-template pairs
            -- (audio variant distance <= 4 bits measured vs >= 20
            -- cross-template; video <= 2 vs >= 25 — budget 6 both),
            -- and index-dedup survivors are the batch docs whose
            -- template was deleted (audio 11 / video 5) or never
            -- indexed -- identically before and after the compact
            WITH reps AS (
                SELECT doc_id % 16 AS t, (doc_id // 16) % 2 AS vv,
                       MIN(doc_id) AS rep
                FROM documents GROUP BY 1, 2
            ), vreps AS (
                SELECT doc_id % 8 AS t, (doc_id // 8) % 2 AS vv,
                       MIN(doc_id) AS rep
                FROM documents WHERE doc_id < 240 GROUP BY 1, 2
            )
            SELECT op, doc_id, lang, v FROM (
                SELECT DISTINCT 'afp' AS op, doc_id % 16 AS doc_id,
                       CAST((doc_id // 16) % 2 AS VARCHAR) AS lang,
                       CAST(1 AS DOUBLE) AS v
                FROM documents
                UNION ALL
                SELECT 'apair', a.rep, CAST(b.rep AS VARCHAR),
                       CAST(NULL AS DOUBLE)
                FROM reps a JOIN reps b
                  ON a.t = b.t AND a.rep < b.rep
                UNION ALL
                SELECT 'amask', doc_id, lang, CAST(NULL AS DOUBLE)
                FROM documents WHERE doc_id % 16 >= 11
                UNION ALL
                SELECT 'afold', doc_id, lang, CAST(NULL AS DOUBLE)
                FROM documents WHERE doc_id % 16 >= 11
                UNION ALL
                SELECT DISTINCT 'vfp', doc_id % 8,
                       CAST((doc_id // 8) % 2 AS VARCHAR),
                       CAST(1 AS DOUBLE)
                FROM documents WHERE doc_id < 240
                UNION ALL
                SELECT 'vpair', a.rep, CAST(b.rep AS VARCHAR),
                       CAST(NULL AS DOUBLE)
                FROM vreps a JOIN vreps b
                  ON a.t = b.t AND a.rep < b.rep
                UNION ALL
                -- r14 one-call video_dedup with keep='max' on a
                -- quality column equal to doc_id: the survivor per
                -- template is the LARGER of its two reps
                SELECT 'vdd', MAX(rep), CAST(t AS VARCHAR),
                       CAST(NULL AS DOUBLE)
                FROM vreps GROUP BY t
                UNION ALL
                SELECT 'vmask', doc_id, lang, CAST(NULL AS DOUBLE)
                FROM documents WHERE doc_id % 8 >= 5 AND doc_id < 240
                UNION ALL
                SELECT 'vfold', doc_id, lang, CAST(NULL AS DOUBLE)
                FROM documents WHERE doc_id % 8 >= 5 AND doc_id < 240
            ) ORDER BY op, doc_id, lang
        """,
        "q69_curation": r"""
            -- 'para' leg (r10 dedup_paragraphs): synthesize paragraph
            -- structure (head + shared boilerplate + tail), keep-first
            -- by (doc_id, pos) over normalized paragraphs (empty ones
            -- exempt), reassemble with blank-line separators, roll up
            -- per lang. 'url' leg (r10 url_normalize /
            -- url_registrable_domain): the synthesized URL shapes are
            -- known, so the EXPECTED canonical strings construct
            -- directly and every byte is pinned via min() + distinct
            -- counts per registrable domain.
            WITH base AS (
                SELECT doc_id, lang,
                       substr(text, 1, 100) || chr(10) || chr(10) ||
                       'SHARED BOILERPLATE PARAGRAPH.' ||
                       chr(10) || chr(10) ||
                       substr(text, 101, 100) AS text
                FROM documents
            ), p AS (
                SELECT doc_id, lang,
                       unnest(regexp_split_to_array(
                           coalesce(text, ''), '\n\n+')) AS para,
                       unnest(range(1, len(regexp_split_to_array(
                           coalesce(text, ''), '\n\n+')) + 1)) AS pos
                FROM base
            ), flagged AS (
                SELECT *,
                       len(trim(para)) < 1 AS exempt,
                       ROW_NUMBER() OVER (
                           PARTITION BY CASE WHEN len(trim(para)) < 1
                                             THEN NULL
                                             ELSE lower(trim(para)) END
                           ORDER BY doc_id, pos) AS rn
                FROM p
            ), kept AS (
                SELECT doc_id, lang, para, pos,
                       (exempt OR rn = 1) AS keep
                FROM flagged
            ), rebuilt AS (
                SELECT doc_id, ANY_VALUE(lang) AS lang,
                       COALESCE(string_agg(
                           CASE WHEN keep THEN para END,
                           chr(10) || chr(10) ORDER BY pos), '') AS text,
                       SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS removed
                FROM kept GROUP BY doc_id
            ), u AS (
                SELECT doc_id, lang,
                    CASE
                        WHEN doc_id % 3 = 0 THEN
                            'https://www.site' || (doc_id % 7) ||
                            '.com/Page/' || doc_id || '?a=1&b=2'
                        WHEN doc_id % 3 = 1 THEN
                            'http://news.site' || (doc_id % 7) ||
                            '.co.uk:8080/a/' || doc_id || '?y=8&z=9'
                        ELSE
                            'https://site' || (doc_id % 7) ||
                            '.com/p' || doc_id
                    END AS norm,
                    CASE
                        WHEN doc_id % 3 = 1 THEN
                            'site' || (doc_id % 7) || '.co.uk'
                        ELSE 'site' || (doc_id % 7) || '.com'
                    END AS domain
                FROM documents
            )
            SELECT op, k, n1, n2, s FROM (
                SELECT 'para' AS op, lang AS k,
                       COUNT(*) AS n1,
                       CAST(SUM(removed) AS BIGINT) AS n2,
                       CAST(CAST(SUM(len(text)) AS BIGINT) AS VARCHAR) AS s
                FROM rebuilt GROUP BY lang
                UNION ALL
                SELECT 'url', domain, COUNT(*),
                       CAST(COUNT(DISTINCT norm) AS BIGINT), MIN(norm)
                FROM u GROUP BY domain
                UNION ALL
                -- r11 domain_report leg: distinct texts (= langs),
                -- distinct canonical URLs, char mass per domain
                SELECT 'dreport', domain,
                       CAST(COUNT(DISTINCT lang) AS BIGINT),
                       CAST(COUNT(DISTINCT norm) AS BIGINT),
                       CAST(CAST(SUM(len(lang)) AS BIGINT) AS VARCHAR)
                FROM u GROUP BY domain
                UNION ALL
                -- r12 warc leg: the query synthesizes 24 HTTP response
                -- records (plain .warc + member-per-record .warc.gz)
                -- and reads them through read_warc; the expected
                -- payload bodies reconstruct arithmetically, so the
                -- md5 over the sorted body concatenation pins every
                -- ingested byte (gzip walk + envelope strip included)
                SELECT 'warc', CAST(i % 3 AS VARCHAR), COUNT(*),
                       CAST(SUM(len(body)) AS BIGINT),
                       md5(string_agg(body, '|' ORDER BY body))
                FROM (SELECT i,
                             repeat('payload ' || i || ' ', (i % 5) + 1)
                                 AS body
                      FROM range(24) t(i))
                GROUP BY i % 3
                UNION ALL
                -- r12 langid leg: the hashed char-n-gram model must
                -- route each fixed out-of-corpus sentence (assigned by
                -- doc_id % 4) to the right language; the oracle states
                -- the expected routing directly
                SELECT 'langid',
                       CASE doc_id % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'fr'
                                       WHEN 2 THEN 'de' ELSE 'es' END,
                       COUNT(*),
                       COUNT(DISTINCT doc_id % 4),
                       MIN(CASE doc_id % 4
                           WHEN 0 THEN 'the engineers reviewed the plans carefully before the bridge could open to morning traffic'
                           WHEN 1 THEN 'les ingénieurs ont examiné attentivement les plans avant que le pont ne soit ouvert à la circulation du matin'
                           WHEN 2 THEN 'die ingenieure prüften die pläne sorgfältig bevor die brücke für den morgendlichen verkehr geöffnet werden konnte'
                           ELSE 'los ingenieros revisaron los planos con cuidado antes de que el puente se abriera al tráfico de la mañana' END)
                FROM documents GROUP BY 1, 2
                UNION ALL
                -- r12 qclf leg: the trained quality classifier must
                -- route the held-out hq/lq texts (assigned by
                -- doc_id % 2) to the right side of 0.5; the oracle
                -- states the expected routing directly
                SELECT 'qclf',
                       CASE doc_id % 2 WHEN 0 THEN 'hq' ELSE 'lq' END,
                       COUNT(*),
                       COUNT(DISTINCT doc_id % 2),
                       MIN(CASE doc_id % 2
                           WHEN 0 THEN 'careful measured analysis with detailed evidence and a clear method'
                           ELSE 'click the free prize and buy cheap casino pills from the spam lottery' END)
                FROM documents GROUP BY 1, 2
                UNION ALL
                -- r12 funnel leg: filter_funnel's one-aggregation
                -- sequential accounting — every stage's survivor
                -- count recomputed as nested conditional sums
                SELECT 'funnel', k, n1, n2, CAST(n1 - n2 AS VARCHAR)
                FROM (
                    SELECT 'n200' AS k, COUNT(*) AS n1,
                           CAST(SUM(CASE WHEN n_chars > 200
                                    THEN 1 ELSE 0 END) AS BIGINT) AS n2
                    FROM documents
                    UNION ALL
                    SELECT 'noz',
                           CAST(SUM(CASE WHEN n_chars > 200
                                    THEN 1 ELSE 0 END) AS BIGINT),
                           CAST(SUM(CASE WHEN n_chars > 200
                                    AND lang != 'zh'
                                    THEN 1 ELSE 0 END) AS BIGINT)
                    FROM documents
                    UNION ALL
                    SELECT 'even',
                           CAST(SUM(CASE WHEN n_chars > 200
                                    AND lang != 'zh'
                                    THEN 1 ELSE 0 END) AS BIGINT),
                           CAST(SUM(CASE WHEN n_chars > 200
                                    AND lang != 'zh' AND doc_id % 2 = 0
                                    THEN 1 ELSE 0 END) AS BIGINT)
                    FROM documents
                )
                UNION ALL
                -- r14 hrank leg: ring-graph PageRank is exactly the
                -- uniform vector (the fixed point of the power
                -- iteration from the uniform start), so every ranked
                -- host carries rank*7 == 1 to fp precision and the
                -- edge-absent host takes the 0.0 fill
                SELECT 'hrank',
                       CASE WHEN doc_id % 5 = 0 THEN 'unranked.example'
                            ELSE 'h' || (doc_id % 7) || '.example' END,
                       COUNT(*),
                       CAST(SUM(CASE WHEN doc_id % 5 = 0
                                THEN 0 ELSE 1 END) AS BIGINT),
                       MIN(CASE WHEN doc_id % 5 = 0
                                THEN 'fill' ELSE 'ranked' END)
                FROM documents GROUP BY 1, 2
                UNION ALL
                -- r14 idedup leg: the image-dedup funnel stage — the
                -- dHash survivor per template is the min doc_id among
                -- doc_id < 96 sharing doc_id % 8 (brightness variants
                -- collapse to the SAME 64-bit hash; distinct seeded
                -- templates never collide), then the n_chars / parity
                -- stages chain as nested conditional sums
                SELECT 'idedup', k, n1, n2, CAST(n1 - n2 AS VARCHAR)
                FROM (
                    SELECT 'imgkeep' AS k, COUNT(*) AS n1,
                           CAST(SUM(CASE WHEN keeper
                                    THEN 1 ELSE 0 END) AS BIGINT) AS n2
                    FROM (SELECT doc_id, n_chars,
                                 doc_id = MIN(doc_id) OVER (
                                     PARTITION BY doc_id % 8) AS keeper
                          FROM documents WHERE doc_id < 96)
                    UNION ALL
                    SELECT 'n200',
                           CAST(SUM(CASE WHEN keeper
                                    THEN 1 ELSE 0 END) AS BIGINT),
                           CAST(SUM(CASE WHEN keeper AND n_chars > 200
                                    THEN 1 ELSE 0 END) AS BIGINT)
                    FROM (SELECT doc_id, n_chars,
                                 doc_id = MIN(doc_id) OVER (
                                     PARTITION BY doc_id % 8) AS keeper
                          FROM documents WHERE doc_id < 96)
                    UNION ALL
                    SELECT 'even',
                           CAST(SUM(CASE WHEN keeper AND n_chars > 200
                                    THEN 1 ELSE 0 END) AS BIGINT),
                           CAST(SUM(CASE WHEN keeper AND n_chars > 200
                                    AND doc_id % 2 = 0
                                    THEN 1 ELSE 0 END) AS BIGINT)
                    FROM (SELECT doc_id, n_chars,
                                 doc_id = MIN(doc_id) OVER (
                                     PARTITION BY doc_id % 8) AS keeper
                          FROM documents WHERE doc_id < 96)
                )
            ) ORDER BY op, k
        """,
        "q46_fct_collapse": """
            SELECT CASE WHEN event_type IN ('click', 'view') THEN 'engagement'
                        WHEN event_type IN ('signup', 'purchase') THEN 'conversion'
                        WHEN event_type IS NULL THEN NULL
                        ELSE 'misc' END AS event_type,
                   COUNT(*) AS n
            FROM events GROUP BY 1
            ORDER BY event_type
        """,
    }
