"""r15: reliable_checkpoint — the checkpoint-dir-aware lineage cut.

The iterative operators truncate lineage with localCheckpoint, whose
blocks live in executor-local storage: one executor loss mid-job on a
real cluster loses the data. When the deployment configures
``setCheckpointDir`` (standard iterative-job hygiene), the helper must
switch to the RELIABLE checkpoint; with no dir configured it must stay
byte-for-byte the r14 localCheckpoint (same plan, no files written).
"""

from __future__ import annotations

import os
import tempfile

from datar_polars_spark.plans.cache import reliable_checkpoint


def _scala_none(sc):
    return sc._jvm.scala.Option.empty()


def test_local_mode_without_checkpoint_dir(spark):
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    df = spark.range(10).withColumnRenamed("id", "x")
    out = reliable_checkpoint(df, eager=True)
    assert out.count() == 10
    # localCheckpoint path: still no checkpoint dir configured
    assert sc.getCheckpointDir() is None


def test_reliable_when_dir_configured(spark):
    sc = spark.sparkContext
    ckdir = tempfile.mkdtemp(prefix="datar_ck_")
    sc.setCheckpointDir(ckdir)
    try:
        df = spark.range(7).withColumnRenamed("id", "x")
        out = reliable_checkpoint(df, eager=True)
        assert sorted(r["x"] for r in out.collect()) == list(range(7))
        # reliable: checkpoint files land under the configured dir
        # (df.checkpoint writes rdd-N block files beneath a uuid dir)
        written = [
            os.path.join(root, name)
            for root, _d, files in os.walk(ckdir)
            for name in files
        ]
        assert written, "reliable checkpoint wrote no files"
    finally:
        # restore the unconfigured state so the rest of the session
        # keeps the (cheaper) localCheckpoint behaviour; the Scala
        # setter's mangled name needs getattr
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(_scala_none(sc))
        assert sc.getCheckpointDir() is None
