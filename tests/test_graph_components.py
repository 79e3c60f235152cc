"""Connected components (scale/graph.py: alternating large-star /
small-star, Kiveris et al. SoCC 2014) — verified against a driver-side
union-find, including the case where single-link dedup diverges from
true components."""

from __future__ import annotations

import random

import pytest

from datar_polars_spark import f, tibble
from datar_polars_spark.scale import connected_components, minhash_dedup


def union_find(edges, nodes=None):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for x in list(parent) + list(nodes or []):
        out[x] = find(x)
    return out


def _cc(spark, edges, **kw):
    td = tibble(spark, a=[e[0] for e in edges], b=[e[1] for e in edges])
    rows = (td >> connected_components(f.a, f.b, **kw)).collect()
    return dict(zip(rows["id"], rows["component"]))


# every core case runs BOTH execution paths: the driver union-find
# shortcut (default for small pair graphs) and the distributed
# alternating-star rounds (small_graph_edges=0 forces it)
BOTH_PATHS = [{}, {"small_graph_edges": 0}]


class TestConnectedComponents:
    @pytest.mark.parametrize("kw", BOTH_PATHS)
    def test_two_components(self, spark, kw):
        edges = [(1, 2), (2, 3), (10, 11)]
        assert _cc(spark, edges, **kw) == union_find(edges)

    @pytest.mark.parametrize("kw", BOTH_PATHS)
    def test_single_link_counterexample(self, spark, kw):
        # pairs (1,5) and (3,5): single-link keeps {1, 3}; true
        # components keep only 1 (component minimum of {1,3,5})
        edges = [(1, 5), (3, 5)]
        got = _cc(spark, edges, **kw)
        assert got == {1: 1, 3: 1, 5: 1}

    @pytest.mark.parametrize("kw", BOTH_PATHS)
    def test_long_chain_converges(self, spark, kw):
        # path graph 0-1-2-...-40: naive propagation needs ~40 rounds;
        # alternating stars must finish well under the 50-iteration cap
        edges = [(i, i + 1) for i in range(40)]
        got = _cc(spark, edges, **kw)
        assert set(got.values()) == {0}
        assert len(got) == 41

    def test_random_graphs_match_union_find(self, spark):
        rng = random.Random(7)
        for _ in range(3):
            n = 30
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(25)
            ]
            edges = [e for e in edges if e[0] != e[1]]
            assert _cc(spark, edges) == union_find(edges)

    def test_star_cluster(self, spark):
        # hub node with many spokes — the large-star round collapses it
        edges = [(0, i) for i in range(1, 200)]
        got = _cc(spark, edges)
        assert set(got.values()) == {0}
        assert len(got) == 200

    def test_ids_need_not_be_dense(self, spark):
        edges = [(1000000, 5), (5, 70000), (2, 999)]
        assert _cc(spark, edges) == union_find(edges)


class TestDedupResolve:
    def _docs(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again "
        texts, ids = [], []
        # chain of three near-identical docs (each adjacent pair is a
        # near-dup) plus two unrelated docs
        for i, suffix in enumerate(["one two three", "one two four", "one five four"]):
            texts.append(base * 3 + suffix)
            ids.append(i + 1)
        texts += ["completely different content about spark plans and shuffles " * 4,
                  "yet another unrelated document mentioning parquet pushdown " * 4]
        ids += [10, 11]
        return tibble(spark, doc_id=ids, text=texts)

    def test_components_resolution_keeps_one_per_cluster(self, spark):
        td = self._docs(spark)
        out = (
            td >> minhash_dedup(f.text, f.doc_id, threshold=0.5, resolve="components")
        ).collect()
        kept = sorted(out["doc_id"])
        assert 1 in kept and 10 in kept and 11 in kept
        # at most one of the chained trio survives
        assert len([k for k in kept if k in (1, 2, 3)]) == 1

    def test_single_link_default_unchanged(self, spark):
        td = self._docs(spark)
        out = (td >> minhash_dedup(f.text, f.doc_id, threshold=0.5)).collect()
        assert 1 in list(out["doc_id"])

    def test_bad_resolve_raises(self, spark):
        td = self._docs(spark)
        with pytest.raises(ValueError, match="resolve"):
            (td >> minhash_dedup(f.text, f.doc_id, resolve="nope")).collect()


class TestDuplicateClusterSkew:
    """VERDICT r1 item 5: a mega-cluster of identical copies must not
    send the LSH bucket self-join quadratic. The fingerprint pre-pass
    removes all but one copy before banding; with the pre-pass bypassed,
    the bucket cap bounds candidate generation."""

    def _skewed(self, spark, n_copies=10_000):
        from datar_polars_spark import from_pandas
        import pandas as pd

        boiler = "subscribe to our newsletter for the latest updates " * 4
        texts = [boiler] * n_copies + [
            f"unique document number {i} about topic {i % 7} with words " * 3
            for i in range(50)
        ]
        return from_pandas(
            spark, pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )

    def test_dedup_mega_cluster_no_quadratic(self, spark):
        import time

        from datar_polars_spark import f
        from datar_polars_spark.scale import minhash_dedup

        td = self._skewed(spark)
        t0 = time.perf_counter()
        out = (td >> minhash_dedup(f.text, f.doc_id, threshold=0.7)).collect()
        elapsed = time.perf_counter() - t0
        # one survivor from the 10k-copy cluster + the 50 uniques
        kept = set(out["doc_id"])
        assert 0 in kept and len([k for k in kept if k < 10_000]) == 1
        # a quadratic candidate stage (1e8 pairs) cannot finish this fast
        assert elapsed < 60, f"dedup took {elapsed:.1f}s — quadratic blowup?"

    def test_bucket_cap_bounds_pairs_without_prepass(self, spark):
        from datar_polars_spark import f
        from datar_polars_spark.scale import minhash_pairs

        td = self._skewed(spark, n_copies=2_000)
        # raw pairs on the skewed corpus, pre-pass bypassed: the bucket
        # cap must exclude the mega-cluster buckets outright
        pairs = (
            td >> minhash_pairs(f.text, f.doc_id, threshold=0.7, max_bucket=100)
        ).df.count()
        assert pairs < 100_000  # uncapped would be ~2e6 within one bucket
