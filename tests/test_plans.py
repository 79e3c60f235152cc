"""Physical-plan regression guards — scale properties that silently
break (pushdown past the lazy order column, schema pruning, broadcast
selection, hidden-column leakage) get locked in here."""

import re

import pytest
from pyspark.sql import functions as F

from datar_polars_spark import (
    f,
    read_parquet,
    select,
    filter_,
    mutate,
    group_by,
    summarise,
    inner_join,
    slice_max,
)
from datar_polars_spark.functions import sum_, n

SF = "/root/testdata/sf0.001"


def _plan(td) -> str:
    return td.df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_survives_lazy_order(spark):
    """The hidden order column must stay lazy: a filtered scan shows a
    non-empty PushedFilters (materializing monotonically_increasing_id
    before the filter would block pushdown)."""
    td = (
        read_parquet(spark, f"{SF}/lineitem.parquet")
        >> filter_(f.l_quantity > 40)
        >> select(f.l_orderkey, f.l_quantity)
    )
    m = re.search(r"PushedFilters: \[([^\]]*)\]", _plan(td))
    assert m and "GreaterThan(l_quantity,40.0)" in m.group(1)


def test_projection_prunes_scan(spark):
    td = read_parquet(spark, f"{SF}/lineitem.parquet") >> select(
        f.l_orderkey, f.l_quantity
    )
    m = re.search(r"ReadSchema: struct<([^>]*)>", _plan(td))
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_orderkey", "l_quantity"}


def test_small_dim_join_broadcasts(spark):
    o = read_parquet(spark, f"{SF}/orders.parquet")
    c = read_parquet(spark, f"{SF}/customer.parquet")
    td = o >> inner_join(c, by={"o_custkey": "c_custkey"})
    assert "BroadcastHashJoin" in _plan(td)


def test_join_carries_no_hidden_columns(spark):
    o = read_parquet(spark, f"{SF}/orders.parquet")
    c = read_parquet(spark, f"{SF}/customer.parquet")
    td = o >> inner_join(c, by={"o_custkey": "c_custkey"})
    assert not [col for col in td.df.columns if col.startswith("__datar_") and td.df.columns.count(col) > 1]
    assert not [col for col in td.columns if col.startswith("__datar_")]


def test_grouped_agg_is_partial(spark):
    """groupBy compiles to partial (map-side) + final aggregation."""
    td = (
        read_parquet(spark, f"{SF}/lineitem.parquet")
        >> group_by(f.l_returnflag)
        >> summarise(s=sum_(f.l_quantity, na_rm=True), c=n())
    )
    plan = _plan(td)
    assert plan.count("HashAggregate") >= 2 or "partial" in plan


def test_topk_uses_window_group_limit(spark):
    """slice_max compiles to a rank window that Spark 4 executes with
    map-side WindowGroupLimit (partial top-k before the shuffle)."""
    td = (
        read_parquet(spark, f"{SF}/orders.parquet")
        >> group_by(f.o_orderpriority)
        >> slice_max(f.o_totalprice, n=3)
    )
    assert "WindowGroupLimit" in _plan(td)


def test_mutate_arithmetic_no_python_udf(spark):
    td = read_parquet(spark, f"{SF}/lineitem.parquet") >> mutate(
        v=f.l_extendedprice * (1 - f.l_discount)
    )
    plan = _plan(td)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_salted_join_matches_plain_join(spark):
    from datar_polars_spark import inner_join
    from datar_polars_spark.operators.join import salted_join

    o = read_parquet(spark, f"{SF}/orders.parquet")
    c = read_parquet(spark, f"{SF}/customer.parquet")
    plain = (o >> inner_join(c, by={"o_custkey": "c_custkey"})).df
    salted = salted_join(o, c, by={"o_custkey": "c_custkey"}, salt=8).df
    cols = ["o_orderkey", "o_custkey", "c_name"]
    a = sorted(tuple(r) for r in plain.select(*cols).collect())
    b = sorted(tuple(r) for r in salted.select(*cols).collect())
    assert a == b


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from datar_polars_spark import rename
    from datar_polars_spark.sources import write_bucketed, read_table

    o = read_parquet(spark, f"{SF}/orders.parquet")
    c = read_parquet(spark, f"{SF}/customer.parquet")
    write_bucketed(o, "orders_b", "o_custkey", 8, path=str(tmp_path / "o"))
    write_bucketed(
        c >> rename(o_custkey=f.c_custkey), "customer_b", "o_custkey", 8,
        path=str(tmp_path / "c"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_table(spark, "orders_b") >> inner_join(
            read_table(spark, "customer_b"), by="o_custkey"
        )
        plan = _plan(j)
        assert j.nrow() == o.nrow()
        # co-bucketed scan: the join needs no Exchange at all
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    from datar_polars_spark.sources import write_parquet

    li = read_parquet(spark, f"{SF}/lineitem.parquet")
    write_parquet(li, str(tmp_path / "li"), partition_by=["l_returnflag"])
    back = read_parquet(spark, str(tmp_path / "li"))
    td = back >> filter_(f.l_returnflag == "A") >> select(f.l_orderkey)
    plan = _plan(td)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    # the partition predicate reaches the scan: only the A directory is read
    assert m and "l_returnflag" in m.group(1)


def test_bind_cols_no_global_window(spark):
    """bind_cols positional ids are two-pass distributed: the plan must
    not contain an unpartitioned Window (the old single-task design)."""
    from datar_polars_spark.operators.bind import bind_cols

    a = read_parquet(spark, f"{SF}/orders.parquet") >> select(f.o_orderkey)
    b = read_parquet(spark, f"{SF}/orders.parquet") >> select(f.o_totalprice)
    td = bind_cols(a, b)
    plan = _plan(td)
    assert "Window" not in plan
    assert td.nrow() == a.nrow()


def test_ungrouped_row_number_no_single_partition(spark):
    """Ungrouped mutate(rn=row_number()) uses the two-pass bucket
    rewrite: no SinglePartition exchange, no unpartitioned window."""
    from datar_polars_spark.functions import row_number

    td = read_parquet(spark, f"{SF}/orders.parquet") >> mutate(rn=row_number())
    plan = _plan(td)
    assert "SinglePartition" not in plan


def test_ungrouped_cumsum_no_single_partition(spark):
    from datar_polars_spark.functions import cumsum

    td = read_parquet(spark, f"{SF}/orders.parquet") >> mutate(
        cs=cumsum(f.o_totalprice)
    )
    plan = _plan(td)
    assert "SinglePartition" not in plan


def test_ungrouped_lag_lead_no_single_partition(spark):
    """Ungrouped lag/lead on frame order compile to the two-pass
    per-bucket shift + broadcast carry map — no single-task window."""
    from datar_polars_spark.functions import lag, lead

    td = read_parquet(spark, f"{SF}/orders.parquet") >> mutate(
        prev=lag(f.o_totalprice), nxt=lead(f.o_totalprice, 2, default=0.0)
    )
    plan = _plan(td)
    assert "SinglePartition" not in plan


def test_ungrouped_ntile_no_single_partition(spark):
    from datar_polars_spark.functions import ntile

    td = read_parquet(spark, f"{SF}/orders.parquet") >> mutate(nt=ntile(n=10))
    plan = _plan(td)
    assert "SinglePartition" not in plan


def test_ungrouped_window_aggregate_no_window_no_jobs(spark):
    """Ungrouped mutate(m=mean(x)) compiles to a 1-row global agg
    cross-joined back as a broadcast — no Window at all in the plan,
    and building the plan launches ZERO Spark jobs (r3 computed the
    scalar eagerly at compile time)."""
    from datar_polars_spark.functions import mean

    base = read_parquet(spark, f"{SF}/orders.parquet")
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    td = base >> mutate(m=mean(f.o_totalprice, na_rm=True))
    plan = _plan(td)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert "Window" not in plan
    assert after == before, f"plan construction ran Spark jobs: {after - before}"


def test_grouped_agg_mutate_avoids_window_shuffle(spark):
    """Grouped unordered aggregates in mutate compile to groupBy +
    join (fact side unshuffled, agg side broadcast-able), NOT to a
    full-table Window.partitionBy shuffle."""
    from datar_polars_spark.functions import mean

    li = read_parquet(spark, f"{SF}/lineitem.parquet")
    td = li >> group_by(f.l_suppkey) >> mutate(avg_p=mean(f.l_extendedprice, na_rm=True))
    plan = _plan(td)
    assert "Window" not in plan
    assert "Join" in plan


def test_grouped_agg_filter_avoids_window_shuffle(spark):
    from datar_polars_spark.functions import mean

    li = read_parquet(spark, f"{SF}/lineitem.parquet")
    td = li >> group_by(f.l_suppkey) >> filter_(f.l_extendedprice > mean(f.l_extendedprice, na_rm=True))
    plan = _plan(td)
    assert "Window" not in plan
    assert not re.search(r"__datar_gagg_|__datar_gk_", plan.split("Project")[0])


def test_cur_group_id_avoids_global_sort_window(spark):
    """cur_group_id materializes via rank-over-distinct-keys broadcast
    join (Tibble.ensure_gid): the fact table must NOT pass through a
    single-partition global sort window."""
    from datar_polars_spark.functions import builder

    cur_group_id = builder("cur_group_id")
    li = read_parquet(spark, f"{SF}/lineitem.parquet")
    td = li >> group_by(f.l_returnflag) >> mutate(gid=cur_group_id())
    plan = _plan(td)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert not re.search(r"Window.*\n.*SinglePartition", plan)


def test_complex_ops_keep_pushdown(spark):
    """struct<re,im> complex ops are plain JVM expressions — a filter
    before them still reaches the parquet scan."""
    from datar_polars_spark.functions import arg, complex_, mod

    td = (
        read_parquet(spark, f"{SF}/lineitem.parquet")
        >> filter_(f.l_quantity > 40)
        >> mutate(m=mod(complex_(real=f.l_extendedprice, imaginary=f.l_discount)))
    )
    plan = _plan(td)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "GreaterThan(l_quantity,40.0)" in m.group(1)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mix_corpora_is_narrow(spark):
    """The resample itself is one filter pass: no Exchange in the plan
    (the per-source count agg is a separate tiny job)."""
    from datar_polars_spark.scale import mix_corpora
    from datar_polars_spark import tibble

    docs = read_parquet(spark, f"{SF}/documents.parquet")
    out = docs >> mix_corpora(f.source, {k: 1.0 for k in
        [r[0] for r in docs.df.select("source").distinct().collect()]})
    assert "Exchange" not in _plan(out)


def test_connected_components_no_single_partition(spark):
    """Every stage of the alternating-star rounds is keyed groupBy/join
    — nothing funnels through one task."""
    from datar_polars_spark.scale.graph import _large_star, _small_star

    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    stepped = _small_star(_large_star(edges))
    plan = stepped._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_post_arrange_cumsum_no_single_partition(spark):
    """After arrange(numeric_col), two-pass windows bucket on the sort
    KEY's quantile boundaries (cross-job deterministic) — cumsum /
    row_number / lag still avoid the single-partition window even
    though post-sort mono ids are job-local."""
    from datar_polars_spark import arrange
    from datar_polars_spark.functions import cumsum, lag, row_number

    td = (
        read_parquet(spark, f"{SF}/orders.parquet")
        >> arrange(f.o_totalprice)
        >> mutate(
            cs=cumsum(f.o_totalprice),
            rn=row_number(),
            prev=lag(f.o_totalprice),
        )
    )
    plan = _plan(td)
    assert "SinglePartition" not in plan


def test_pack_documents_post_arrange_distributed(spark):
    """pack_documents(mode='chunk') after arrange — the q45 shape —
    stays fully distributed via the key-bucket rewrite."""
    from datar_polars_spark import arrange
    from datar_polars_spark.scale import pack_documents

    td = (
        read_parquet(spark, f"{SF}/documents.parquet")
        >> arrange(f.doc_id)
        >> mutate(toks=f.n_chars)
        >> pack_documents(tokens="toks", budget=5000, mode="chunk")
    )
    plan = _plan(td)
    assert "SinglePartition" not in plan


def test_ungrouped_consecutive_id_no_single_partition(spark):
    """consecutive_id composes the two-pass shift + row_number + cumsum
    primitives; the change-flag window expression is legal in the
    offsets job because _bucket_offsets pre-projects its value."""
    from datar_polars_spark.functions import consecutive_id

    td = read_parquet(spark, f"{SF}/lineitem.parquet") >> mutate(
        cid=consecutive_id(f.l_returnflag)
    )
    plan = _plan(td)
    assert "SinglePartition" not in plan


def test_ungrouped_value_ranks_no_single_partition(spark):
    """min_rank/dense_rank/percent_rank/cume_dist/ntile over a VALUE
    column bucket on the key's own quantiles: ungrouped whole-table
    ranking runs in parallel, not through one sort task."""
    from datar_polars_spark.functions import (
        cume_dist,
        dense_rank,
        min_rank,
        ntile,
        percent_rank,
    )

    td = read_parquet(spark, f"{SF}/lineitem.parquet") >> mutate(
        r=min_rank(f.l_extendedprice),
        dr=dense_rank(f.l_extendedprice),
        pr=percent_rank(f.l_extendedprice),
        cd=cume_dist(f.l_extendedprice),
        nt=ntile(f.l_extendedprice, n=7),
    )
    plan = _plan(td)
    assert "SinglePartition" not in plan


def test_semantic_pairs_single_shuffle_no_funnel(spark):
    """semantic_pairs (SemDeDup-style, r3): the pair search is one
    groupBy-cluster shuffle into an Arrow applyInPandas stage — no
    SinglePartition exchange anywhere."""
    from datar_polars_spark.scale.dedup import semantic_pairs

    td = read_parquet(spark, f"{SF}/embeddings.parquet")
    pairs = semantic_pairs(td, f.embedding, f.vec_id, eps=0.05, n_clusters=8)
    plan = pairs.df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "FlatMapGroupsInPandas" in plan
    # r5: the salt-split factor comes from a distributed census, NOT a
    # driver collect inlined as a create_map literal (k entries in the
    # plan). r11: the census is a map-side-combined groupBy joined
    # back (a count-over-window put an over-full cluster — the exact
    # case the salt exists for — into one unsplittable task), so BELOW
    # the Arrow stage there are at most two hash exchanges: the wide
    # (cluster, salt) one carrying vectors, and the tiny census one
    # carrying only (cluster, partial count).
    assert "keys:" not in plan  # no map literal
    pre_pandas = plan.split("FlatMapGroupsInPandas")[-1]
    assert pre_pandas.count("Exchange hashpartitioning") <= 2
    assert "partial_count" in pre_pandas  # census combines map-side
    assert "Window" not in pre_pandas  # no unsplittable per-cluster task


def test_grouped_agg_join_broadcasts_small_side(spark):
    """Grouped mutate of an unordered aggregate (the q22 shape): the
    parquet-footer cardinality bound proves the agg side is
    broadcast-sized WITHOUT running a Spark job (r5: AQE never demotes
    this SMJ at runtime on Spark 4.x — verified by minimal repro — so
    r4's stage gate was removed in favor of the metadata-only bound).
    The fact table is never hash-exchanged; plan construction launches
    zero jobs."""
    from datar_polars_spark.functions import mean

    base = read_parquet(spark, f"{SF}/lineitem.parquet") >> group_by(f.l_suppkey)
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    td = base >> mutate(dev=f.l_extendedprice - mean(f.l_extendedprice, na_rm=True))
    plan = _plan(td)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before, f"plan construction ran Spark jobs: {after - before}"
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    # the fact side must reach the join unshuffled: the only
    # hashpartitioning exchange is the agg side's partial-state shuffle
    assert len(re.findall(r"[+:]- Exchange hashpartitioning", plan)) <= 1


def test_footer_bound_broadcast_beats_static_estimate(spark):
    """The discriminating scenario for the footer bound: a broadcast
    threshold far below Catalyst's static size estimate for the agg
    side (an aggregate's estimate is its INPUT size — at 100 TB the
    static path always shuffles the fact table). The footer bound
    (distinct suppkeys <= max-min+1 from file metadata, ~56 KB of agg
    rows) proves the broadcast is safe anyway."""
    from datar_polars_spark.functions import mean

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(1 << 20))
    try:
        base = read_parquet(spark, f"{SF}/lineitem.parquet") >> group_by(
            f.l_suppkey
        )
        td = base >> mutate(
            dev=f.l_extendedprice - mean(f.l_extendedprice, na_rm=True)
        )
        assert "BroadcastHashJoin" in _plan(td)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_footer_bound_refuses_unsafe_keys(spark):
    """The footer bound must bail (None -> shuffled join) when the key
    is not a pristine relation attribute: a mutated key's footer stats
    describe a DIFFERENT value, and a string key has no integer
    domain. Both shapes must fall back to the plain shuffled join with
    a 1 KB threshold (no broadcast from static estimates either)."""
    from datar_polars_spark.functions import mean

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try:
        # mutated key: l_suppkey overwritten before group_by
        base = (
            read_parquet(spark, f"{SF}/lineitem.parquet")
            >> mutate(l_suppkey=f.l_suppkey % 7)
            >> group_by(f.l_suppkey)
        )
        td = base >> mutate(
            dev=f.l_extendedprice - mean(f.l_extendedprice, na_rm=True)
        )
        assert "BroadcastHashJoin" not in _plan(td)
        # string key: no integer domain bound
        base2 = read_parquet(spark, f"{SF}/lineitem.parquet") >> group_by(
            f.l_returnflag
        )
        td2 = base2 >> mutate(
            dev=f.l_extendedprice - mean(f.l_extendedprice, na_rm=True)
        )
        assert "BroadcastHashJoin" not in _plan(td2)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pending_agg_detection_is_structural_not_repr(spark):
    """A user STRING LITERAL containing '__datar_gagg_' inside an
    aggregate must NOT be mistaken for a nested pending placeholder:
    the grouped rewrite still applies (groupBy+join, no Window) and
    plan construction launches zero Spark jobs (ADVICE r4: the old
    substring grep over Column.__repr__ misrouted this to the window /
    eager fallback)."""
    from datar_polars_spark.functions import sum_ as dsum, if_else

    base = read_parquet(spark, f"{SF}/lineitem.parquet") >> group_by(f.l_suppkey)
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    td = base >> mutate(
        odd=dsum(if_else(f.l_returnflag == "__datar_gagg_0__", 1, 0), na_rm=True)
    )
    plan = _plan(td)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before, f"plan construction ran Spark jobs: {after - before}"
    assert "Window" not in plan
    assert "Join" in plan
    # and the values are right: no shipmode matches the marker string
    assert all(v == 0 for v in (r["odd"] for r in td.df.select("odd").collect()))


def test_grouped_agg_join_aqe_off_broadcast_knob(spark):
    """With AQE disabled there is no runtime demotion path; the
    documented DATAR_AGG_BROADCAST=1 knob statically broadcast-hints
    the agg side so the fact table still never hash-shuffles."""
    import os

    from datar_polars_spark.functions import mean

    os.environ["DATAR_AGG_BROADCAST"] = "1"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        base = read_parquet(spark, f"{SF}/lineitem.parquet") >> group_by(f.l_suppkey)
        td = base >> mutate(dev=f.l_extendedprice - mean(f.l_extendedprice, na_rm=True))
        plan = _plan(td)
        assert "BroadcastHashJoin" in plan
        assert "Window" not in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        del os.environ["DATAR_AGG_BROADCAST"]


def test_write_clustered_layout_is_range_disjoint(spark, tmp_path):
    """write_clustered (r5): files cover near-disjoint key ranges so
    parquet min/max statistics can prune scans. Verified against the
    ACTUAL file footers via pyarrow, not the plan."""
    import pyarrow.parquet as pq
    from datar_polars_spark.sources import write_clustered

    o = read_parquet(spark, f"{SF}/orders.parquet")
    dest = str(tmp_path / "clustered")
    write_clustered(o, dest, by="o_orderdate", n_files=6)

    import glob
    ranges = []
    for fp in glob.glob(f"{dest}/*.parquet"):
        md = pq.ParquetFile(fp).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["o_orderdate"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2
    ranges.sort()
    # consecutive files may share exactly one boundary key (the range
    # partitioner puts identical keys in one partition, so overlap
    # beyond a single shared key means clustering failed)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"
    # and the filtered read-back pushes the predicate to the scan
    td = read_parquet(spark, dest) >> filter_(f.o_orderdate >= "1995-06-01")
    plan = _plan(td)
    assert "PushedFilters: [" in plan and "o_orderdate" in plan.split("PushedFilters")[1][:200]


def test_fits_broadcast_refuses_variable_width_agg_values(spark):
    """The footer bound is a row-count bound only: agg outputs whose
    per-row bytes are unbounded (collect_list arrays, structs, binary)
    must disable the forced broadcast hint — F.broadcast bypasses
    Spark's own size check, so an optimistic estimate here OOMs
    executors at scale. Strings get a conservative 256-byte width."""
    from datar_polars_spark.plans.context import EvalContext

    base = read_parquet(spark, f"{SF}/lineitem.parquet") >> group_by(f.l_suppkey)
    ctx = EvalContext(base)
    ok_df = spark.createDataFrame([], "k bigint, m double")
    arr_df = spark.createDataFrame([], "k bigint, vals array<double>")
    struct_df = spark.createDataFrame([], "k bigint, s struct<a:int>")
    bin_df = spark.createDataFrame([], "k bigint, b binary")
    str_df = spark.createDataFrame([], "k bigint, s string")
    assert ctx._fits_broadcast(ok_df, 1000)
    assert not ctx._fits_broadcast(arr_df, 1000)
    assert not ctx._fits_broadcast(struct_df, 1000)
    assert not ctx._fits_broadcast(bin_df, 1000)
    # strings: allowed under a 256-byte-per-value assumption...
    assert ctx._fits_broadcast(str_df, 1000)
    # ...which forgoes the hint once the row count leaves no headroom
    thresh = ctx._parse_bytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    )
    assert not ctx._fits_broadcast(str_df, thresh // 200)


def test_footer_bound_dominates_true_distinct(spark, tmp_path):
    """Soundness property: for random integer data round-tripped
    through parquet, the footer bound is always >= the true distinct
    count (the broadcast decision may only ever over-estimate)."""
    import numpy as np
    import pandas as pd

    from datar_polars_spark import read_parquet as rp
    from datar_polars_spark.plans.context import EvalContext

    rng = np.random.RandomState(5)
    for trial, (lo, hi, n) in enumerate(
        [(0, 10, 500), (-50, 50, 300), (1000, 1002, 64), (7, 7, 10)]
    ):
        pdf = pd.DataFrame({"k": rng.randint(lo, hi + 1, n), "v": rng.rand(n)})
        p = str(tmp_path / f"t{trial}")
        spark.createDataFrame(pdf).repartition(3).write.parquet(p)
        td = rp(spark, p) >> group_by(f.k)
        ctx = EvalContext(td)
        bound = ctx._footer_group_bound(td.df)
        true_distinct = int(pdf["k"].nunique())
        assert bound is not None and bound >= true_distinct, (trial, bound)


def test_partitioned_write_accepts_bare_string(spark, tmp_path):
    """partition_by='col' must partition on ONE column — the r7 bug was
    partitionBy(*'col') splatting the string into characters and dying
    on a duplicate single-letter column name."""
    from datar_polars_spark import read_parquet
    from datar_polars_spark.sources import write_orc, write_parquet

    li = read_parquet(spark, "/root/testdata/sf0.001/lineitem.parquet")
    p = str(tmp_path / "li_str")
    write_parquet(li, p, partition_by="l_returnflag")
    back = read_parquet(spark, p)
    assert set(back.df.select("l_returnflag").distinct().toPandas()["l_returnflag"]) \
        == set(li.df.select("l_returnflag").distinct().toPandas()["l_returnflag"])
    import os

    assert any(d.startswith("l_returnflag=") for d in os.listdir(p))
    o = str(tmp_path / "li_orc")
    write_orc(li, o, partition_by="l_returnflag")
    assert any(d.startswith("l_returnflag=") for d in os.listdir(o))


def test_write_training_shards_order_is_deterministic(spark, tmp_path):
    """write_training_shards (r11): shard files are contiguous slices
    of the seeded global permutation; reading files in name order
    replays it exactly, and a re-run with the same seed reproduces the
    identical sequence (a bare repartition(n) does not)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from datar_polars_spark import read_parquet
    from datar_polars_spark.sources import write_training_shards

    docs = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    want = [
        r["doc_id"]
        for r in docs.df.select("doc_id")
        .orderBy(
            F.xxhash64(F.lit(7).cast("long"), F.col("doc_id")).asc(),
            F.col("doc_id").asc(),
        )
        .collect()
    ]

    def read_order(path):
        ids = []
        for fp in sorted(glob.glob(os.path.join(path, "part-*"))):
            ids.extend(
                r["doc_id"] for r in spark.read.parquet(fp).collect()
            )
        return ids

    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(docs, p1, n_shards=4, seed=7)
    assert len(glob.glob(os.path.join(p1, "part-*"))) == 4
    got1 = read_order(p1)
    assert got1 == want  # file order replays the seeded permutation
    write_training_shards(docs, p2, n_shards=4, seed=7)
    assert read_order(p2) == got1  # reproducible across runs

    # a different seed is a different permutation of the same rows
    p3 = str(tmp_path / "s3")
    write_training_shards(docs, p3, n_shards=4, seed=8)
    got3 = read_order(p3)
    assert sorted(got3) == sorted(want) and got3 != got1

    import pytest

    with pytest.raises(ValueError, match="__shuffle__"):
        from datar_polars_spark.tibble import ensure_tibble

        write_training_shards(
            ensure_tibble(docs.df.withColumn("__shuffle__", F.lit(1))),
            str(tmp_path / "bad"),
        )


def test_dedup_exact_id_path_has_no_window(spark):
    """r11 skew lock: the id_col path is a min_by aggregation (map-side
    partial combine), not a row_number window — a mega duplicate
    cluster must never form one unsplittable task."""
    from datar_polars_spark import read_parquet
    from datar_polars_spark.scale import dedup_exact

    docs = read_parquet(spark, f"{SF}/documents.parquet")
    out = dedup_exact(docs, f.text, id_col=f.doc_id)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min_by" in plan  # combines before the shuffle
    assert "SinglePartition" not in plan
