"""Distributed exact PCA (scale/similarity.py): tree-aggregated
sufficient statistics == numpy PCA on the collected data, orthonormal
sign-fixed components, projection semantics, ANN composition, and
model persistence."""

import numpy as np
import pytest

from datar_polars_spark import read_parquet
from datar_polars_spark.scale import pca_apply, pca_read, pca_train, pca_write
from datar_polars_spark.tibble import ensure_tibble

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return read_parquet(spark, f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def model(emb):
    return pca_train(emb, dim_out=16)


def _numpy_reference(emb, dim_out):
    X = np.array(
        [r["embedding"] for r in emb.df.select("embedding").collect()],
        dtype="float64",
    )
    mean = X.mean(axis=0)
    cov = np.cov(X, rowvar=False)  # ddof=1, matching pca_train
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:dim_out]
    comps = evecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def test_matches_numpy_reference(emb, model):
    """The tree-aggregated covariance is EXACT, so the distributed
    model equals a single-node numpy PCA (same ddof, same sign
    convention) to fp tolerance."""
    mean, comps, evals = _numpy_reference(emb, 16)
    assert np.allclose(model["mean"], mean, atol=1e-9)
    assert np.allclose(model["explained_variance"], evals, atol=1e-9)
    assert np.allclose(model["components"], comps, atol=1e-7)


def test_components_are_orthonormal_and_variance_sorted(model):
    W = np.asarray(model["components"])
    assert np.allclose(W @ W.T, np.eye(W.shape[0]), atol=1e-9)
    ev = model["explained_variance"]
    assert all(a >= b - 1e-12 for a, b in zip(ev, ev[1:]))
    assert all(v >= 0 for v in ev)


def test_apply_projects_and_preserves_nulls(spark, emb, model):
    td = ensure_tibble(
        emb.df.select("vec_id", "embedding")
        .limit(20)
        .unionByName(
            spark.createDataFrame(
                [(999_999, None)], "vec_id long, embedding array<float>"
            )
        )
    )
    out = pca_apply(td, model, out_col="proj")
    rows = {r["vec_id"]: r for r in out.df.collect()}
    assert rows[999_999]["proj"] is None
    mean = np.asarray(model["mean"])
    W = np.asarray(model["components"])
    for vid, r in rows.items():
        if vid == 999_999:
            continue
        want = (np.asarray(r["embedding"], dtype="float64") - mean) @ W.T
        assert np.allclose(r["proj"], want, atol=1e-9)
        assert len(r["proj"]) == 16


def test_full_rank_projection_preserves_distances(spark, emb):
    """dim_out == d is a rigid rotation + centering: pairwise L2
    distances are preserved, so downstream L2 ANN ranking is
    unchanged."""
    m = pca_train(emb, dim_out=None)
    out = pca_apply(ensure_tibble(emb.df.limit(30)), m, out_col="proj")
    rows = out.df.select("embedding", "proj").collect()
    X = np.array([r["embedding"] for r in rows], dtype="float64")
    Y = np.array([r["proj"] for r in rows], dtype="float64")
    dx = np.linalg.norm(X[:, None] - X[None, :], axis=-1)
    dy = np.linalg.norm(Y[:, None] - Y[None, :], axis=-1)
    assert np.allclose(dx, dy, atol=1e-7)


def test_ann_composition_recall_on_low_rank_data(spark):
    """The advertised pipeline on data where PCA can work: vectors
    with rank-8 structure + small isotropic noise. Training the model
    DISTRIBUTED, reducing 64 -> 16 dims, brute-force L2 top-k in
    reduced space recalls nearly all full-space neighbors. (The
    driver's synthetic embeddings are near-isotropic, where no linear
    reduction preserves neighborhoods — structure is the point.)"""
    rng = np.random.default_rng(5)
    Z = rng.standard_normal((400, 8))
    B = rng.standard_normal((8, 64))
    X = Z @ B + 0.05 * rng.standard_normal((400, 64))
    td = ensure_tibble(
        spark.createDataFrame(
            [(i, X[i].tolist()) for i in range(len(X))],
            "vec_id long, embedding array<double>",
        )
    )
    m = pca_train(td, dim_out=16)
    # the rank-8 signal dominates the top of the spectrum
    ev = m["explained_variance"]
    assert ev[7] > 10 * ev[8]
    mean, W = np.asarray(m["mean"]), np.asarray(m["components"])
    Y = (X - mean) @ W.T
    hits = 0
    for q in range(20):
        full = set(np.argsort(((X - X[q]) ** 2).sum(1))[1:11].tolist())
        red = set(np.argsort(((Y - Y[q]) ** 2).sum(1))[1:11].tolist())
        hits += len(full & red)
    assert hits >= 180  # >= 90% neighbor recall at 16/64 dims


def test_validation_and_persistence(spark, emb, model, tmp_path):
    with pytest.raises(ValueError, match="dim_out"):
        pca_train(emb, dim_out=0)
    with pytest.raises(ValueError, match="dim_out"):
        pca_train(emb, dim_out=1000)
    with pytest.raises(ValueError, match="components"):
        pca_apply(emb, {"not": "a model"})
    with pytest.raises(ValueError, match="no non-NULL"):
        pca_train(
            ensure_tibble(
                spark.createDataFrame(
                    [(1, None)], "vec_id long, embedding array<float>"
                )
            )
        )
    path = str(tmp_path / "pca.json")
    pca_write(spark, model, f"file://{path}")
    loaded = pca_read(spark, f"file://{path}")
    assert loaded == model
    with pytest.raises(ValueError, match="pca_write artifact"):
        from datar_polars_spark.scale.jsonio import write_json_file

        write_json_file(spark, f"file://{path}2", {"format": "other"})
        pca_read(spark, f"file://{path}2")


def test_dim_mismatch_fails_fast(spark, model):
    bad = ensure_tibble(
        spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
    )
    with pytest.raises(Exception, match="dim"):
        pca_apply(bad, model).df.collect()


def test_final_fold_collects_exactly_one_row(spark, emb, monkeypatch):
    """r12: the driver receives ONE (n, s, xtx) statistics row —
    d^2+d doubles — not combine_width of them (~0.5 GB at d=1024).
    Pinned by intercepting the collect at the DataFrame boundary."""
    # Spark 4: the concrete class (pyspark.sql.classic) defines its
    # own collect, so patching the abstract base would never fire
    from pyspark.sql.classic.dataframe import DataFrame

    seen = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        if self.columns == ["n", "s", "xtx"]:
            seen.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    m = pca_train(emb, dim_out=4, combine_width=8)
    assert seen == [1]
    assert len(m["components"]) == 4
