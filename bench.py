"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query set = the shuffle/join/window-heavy subset of the correctness
gate (the ones whose cost scales), so BENCH measures the same plans the
driver verifies for correctness.

NOISE DISCIPLINE (r12): every committed wall number carries a spread.
The headline "value" is the per-query MEDIAN of THREE genuinely cold
runs, each in its own fresh JVM (``--cold-child`` subprocess: new
SparkSession, sf0.001 codegen warm-up, one timed sf-scale pass) — r11's
single-shot cold swung 4.27->5.03 s within an hour on identical code
and could not prove itself noise. A loadavg guard waits (bounded) for
the box to quiet before timing and records what it saw, so a
load-inflated artifact is visible as such instead of reading as a
regression.
"""

from __future__ import annotations

import json
import os
import sys
import time

# module-level so pandas_udf type hints ('pd.Series' strings under the
# postponed-annotations future import) resolve against module globals
import pandas as pd  # noqa: F401

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
_t_imp = time.perf_counter()
import __spark_entry__ as entry_mod

# recorded in the artifact (and each cold child's line): the r13 drift
# audit asked whether growing import cost inflates the fresh-JVM cold
# numbers — it cannot (import happens once per child, OUTSIDE the
# per-query timers), but the number makes that checkable per round
# (r14 measurement: ~0.7 s, dominated by pandas/pyspark/pyarrow;
# datar_polars_spark.scale itself is ~80 ms)
_IMPORT_SEC = round(time.perf_counter() - _t_imp, 3)

HEADLINE = [
    "q01_pricing_summary",
    "q02_select_mutate",
    "q06_join_revenue_per_nation",
    "q07_left_join_zero_counts",
    "q10_topk_per_group",
    "q12_lag_cumsum",
    "q19_quantiles",
    "q20_n_distinct",
    "q22_group_deviation",
    "q23_events_daily",
]


_PQ_STATE: dict = {}


def _pq_knn_bench(emb):
    """Batch PQ retrieval pipeline at bench scale: train once per
    process (codebook sample bounded independent of corpus size),
    encode the corpus, retrieve top-10 for 64 query rows."""
    from datar_polars_spark.scale import pq_encode, pq_knn_join, pq_train
    from datar_polars_spark.tibble import ensure_tibble

    if "book" not in _PQ_STATE:
        _PQ_STATE["book"] = pq_train(emb, m=4, nbits=6, sample_size=2000, seed=3)
    book = _PQ_STATE["book"]
    coded = pq_encode(emb, book)
    queries = ensure_tibble(emb.df.select("vec_id", "embedding").filter("vec_id < 64"))
    return pq_knn_join(queries, coded, book, k=10).df.count()


def _pq_knn_dist_bench(emb):
    """r7: the DISTRIBUTED query-side PQ path — same 64-query batch
    forced through the cogrouped applyInPandas (max_queries=16 splits
    it into 4 chunks x 8 corpus blocks), so the executor-side path's
    overhead vs the driver-batch path is visible in the artifact."""
    from datar_polars_spark.scale import pq_encode, pq_knn_join, pq_train
    from datar_polars_spark.tibble import ensure_tibble

    if "book" not in _PQ_STATE:
        _PQ_STATE["book"] = pq_train(emb, m=4, nbits=6, sample_size=2000, seed=3)
    book = _PQ_STATE["book"]
    coded = pq_encode(emb, book)
    queries = ensure_tibble(emb.df.select("vec_id", "embedding").filter("vec_id < 64"))
    return pq_knn_join(
        queries, coded, book, k=10, max_queries=16, n_corpus_blocks=8
    ).df.count()


def _ivfpq_bench(emb):
    """r7: IVF-PQ retrieval — coarse cells prune the code scan to
    ~nprobe/nlist (4/16 here) before the Arrow pass; residual codes
    keep per-row memory at m bytes. Train once per process."""
    from datar_polars_spark.scale import ivfpq_encode, ivfpq_knn_join, ivfpq_train
    from datar_polars_spark.tibble import ensure_tibble

    if "ivfpq" not in _PQ_STATE:
        _PQ_STATE["ivfpq"] = ivfpq_train(
            emb, n_clusters=16, m=4, nbits=6, iters=4, sample_size=2000, seed=3
        )
    index = _PQ_STATE["ivfpq"]
    coded = ivfpq_encode(emb, index)
    queries = ensure_tibble(emb.df.select("vec_id", "embedding").filter("vec_id < 64"))
    return ivfpq_knn_join(queries, coded, index, k=10, nprobe=4).df.count()


def _ivfpq_dist_bench(emb):
    """r9: the DISTRIBUTED query-side IVF-PQ path — the 64-query batch
    forced through the cogrouped (cell, query-block) scorer
    (max_queries=16). Corpus codes join the broadcast distinct live
    (cell, block) pairs instead of exploding to every block, so only
    probed cells enter the cogroup shuffle — the artifact tracks that
    pruning's cost vs the driver-batch path."""
    from datar_polars_spark.scale import ivfpq_encode, ivfpq_knn_join, ivfpq_train
    from datar_polars_spark.tibble import ensure_tibble

    if "ivfpq" not in _PQ_STATE:
        _PQ_STATE["ivfpq"] = ivfpq_train(
            emb, n_clusters=16, m=4, nbits=6, iters=4, sample_size=2000, seed=3
        )
    index = _PQ_STATE["ivfpq"]
    coded = ivfpq_encode(emb, index)
    queries = ensure_tibble(emb.df.select("vec_id", "embedding").filter("vec_id < 64"))
    return ivfpq_knn_join(
        queries, coded, index, k=10, nprobe=4, max_queries=16, n_query_blocks=4
    ).df.count()


def _minhash_sigs_fold(docs_df, num_perm: int, shingle_words: int) -> int:
    """The r5 formulation, kept ONLY as the bench A/B counterpart: one
    aggregate+zip_with HOF fold per row — narrow, shuffle-free, but
    interpreted (not whole-stage-codegen), which is why it measured 3x
    slower warm than the explode form and was retired from the main
    path in r6."""
    from pyspark.sql import functions as F

    from datar_polars_spark.scale.dedup import minhash_signature, word_shingles

    return (
        docs_df.select(
            F.col("doc_id").alias("id"),
            minhash_signature(
                word_shingles(F.col("text"), shingle_words), num_perm
            ).alias("sig"),
        )
        .filter(F.col("sig")[0].isNotNull())
        .count()
    )


def _minhash_sigs_explode(docs_df, num_perm: int, shingle_words: int):
    """Explode shingles to rows, then num_perm partial-min aggregates
    back to one signature row per doc — the main-path formulation
    since r6 (map-side combine means the shuffle moves ~1 row/doc)."""
    from pyspark.sql import functions as F

    from datar_polars_spark.scale.dedup import word_shingles

    ex = docs_df.select(
        F.col("doc_id").alias("id"),
        F.explode(word_shingles(F.col("text"), shingle_words)).alias("sh"),
    )
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    return ex.groupBy("id").agg(*aggs)


def _html_extract_bench(docs) -> int:
    """The r11 extraction front-end (html_to_text -> normalize_text)
    over documents wrapped in synthetic HTML markup — pure JVM regex
    chains inside the scan; times the per-byte cost of the stage."""
    from pyspark.sql import functions as F

    from datar_polars_spark.scale import html_to_text, normalize_text
    from datar_polars_spark.tibble import ensure_tibble

    pages = ensure_tibble(
        docs.df.select(
            "doc_id",
            F.concat(
                F.lit("<html><head><script>x()</script></head><body><p>"),
                F.substring("text", 1, 1000),
                F.lit("</p><div>"),
                F.substring("text", 1001, 1000),
                F.lit("</div></body></html>"),
            ).alias("html"),
        )
    )
    out = normalize_text(
        html_to_text(pages, html="html", out_col="text"), text="text"
    )
    return out.df.select(F.sum(F.length("text"))).first()[0] or 0


def _dedup_paragraphs_bench(docs) -> int:
    """Corpus-scope paragraph dedup over synthesized paragraph
    structure (head + shared boilerplate + tail — the q69 gate shape):
    times the r11 narrow plan (only id/pos/para in the exchanges)."""
    from pyspark.sql import functions as F

    from datar_polars_spark.scale import dedup_paragraphs
    from datar_polars_spark.tibble import ensure_tibble

    base = ensure_tibble(
        docs.df.select(
            "doc_id",
            "lang",
            F.concat(
                F.substring("text", 1, 100),
                F.lit("\n\nSHARED BOILERPLATE PARAGRAPH.\n\n"),
                F.substring("text", 101, 100),
            ).alias("text"),
        )
    )
    return dedup_paragraphs(base).df.count()


def _lang_id_bench(spark, docs) -> int:
    """r12: trained language-ID scoring over the documents table —
    seed model trained once per process, then one Arrow pass."""
    from datar_polars_spark.scale import lang_id_predict, lang_id_train_seed

    if "lid" not in _PQ_STATE:
        _PQ_STATE["lid"] = lang_id_train_seed(spark)
    return (
        lang_id_predict(docs, _PQ_STATE["lid"], text="text")
        .df.groupBy("lang_pred")
        .count()
        .count()
    )


def _index_dedup_bench(docs, phase: str) -> int:
    """r12: persistent dedup index — 'build' indexes 2/3 of the corpus
    to local parquet (fingerprints + narrow LSH postings), 'match'
    dedups the remaining 1/3 against the store. The match side is the
    steady-state incremental-crawl cost: only the batch is shingled,
    the corpus contributes pre-computed stores through equi-joins."""
    from pyspark.sql import functions as F

    from datar_polars_spark.scale import dedup_against_index, dedup_index_build
    from datar_polars_spark.tibble import Tibble

    if "didx" not in _PQ_STATE:
        import tempfile

        _PQ_STATE["didx"] = tempfile.mkdtemp(prefix="bench_didx_") + "/idx"
    path = _PQ_STATE["didx"]
    if phase == "build":
        corpus = Tibble(docs.df.filter(F.col("doc_id") % 3 != 0))
        dedup_index_build(corpus, "text", "doc_id", path, num_perm=64, bands=16)
        return 1
    batch = Tibble(docs.df.filter(F.col("doc_id") % 3 == 0))
    return dedup_against_index(batch, path, threshold=0.7).df.count()


def _semantic_index_bench(emb, phase: str) -> int:
    """r12: persistent semantic index — 'build' writes hyperplane
    postings + vectors for 2/3 of the embeddings, 'match' dedups the
    remaining 1/3 against the store (sign batch, equi-join postings,
    exact-cosine verify)."""
    from pyspark.sql import functions as F

    from datar_polars_spark.scale import (
        dedup_against_semantic_index,
        semantic_index_build,
    )
    from datar_polars_spark.tibble import Tibble

    if "sidx" not in _PQ_STATE:
        import tempfile

        _PQ_STATE["sidx"] = tempfile.mkdtemp(prefix="bench_sidx_") + "/idx"
    path = _PQ_STATE["sidx"]
    if phase == "build":
        corpus = Tibble(emb.df.filter(F.col("vec_id") % 3 != 0))
        semantic_index_build(corpus, "embedding", "vec_id", path)
        return 1
    batch = Tibble(emb.df.filter(F.col("vec_id") % 3 == 0))
    return dedup_against_semantic_index(
        batch, path, threshold=0.9
    ).df.count()


def _image_index_bench(docs, phase: str) -> int:
    """r13: persistent image-fingerprint index — 'build' synthesizes a
    pixel PNG per corpus doc (template raster by doc_id % 64), hashes,
    and indexes to parquet; 'match' dedups the remaining third against
    the store. The Arrow dHash pass dominates; everything after is JVM
    band joins."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    from datar_polars_spark.scale import (
        dedup_against_image_index,
        image_index_build,
    )
    from datar_polars_spark.tibble import Tibble

    @F.pandas_udf(BinaryType())
    def _img(doc_id: pd.Series) -> pd.Series:
        import numpy as np

        from datar_polars_spark.scale.codecs import make_png_pixels

        out = []
        for d_ in doc_id:
            rng = np.random.default_rng(int(d_) % 64)
            out.append(
                make_png_pixels(
                    rng.integers(0, 250, (16, 24, 3), dtype=np.uint8)
                )
            )
        return pd.Series(out)

    imgs = docs.df.select("doc_id", _img(F.col("doc_id")).alias("content"))
    if "iidx" not in _PQ_STATE:
        import tempfile

        _PQ_STATE["iidx"] = tempfile.mkdtemp(prefix="bench_iidx_") + "/idx"
    path = _PQ_STATE["iidx"]
    if phase == "build":
        image_index_build(
            Tibble(imgs.filter(F.col("doc_id") % 3 != 0)),
            "content", "doc_id", path, strict=True,
        )
        return 1
    return dedup_against_image_index(
        Tibble(imgs.filter(F.col("doc_id") % 3 == 0)), path, strict=True
    ).df.count()


def _audio_index_bench(docs, phase: str) -> int:
    """r14: persistent audio-fingerprint index — 'build' synthesizes a
    tonal 16-bit WAV per corpus doc (chord template by doc_id % 64,
    0.5 s at 8 kHz), fingerprints (one Arrow PCM-decode+FFT pass), and
    indexes to parquet; 'match' dedups the remaining third against the
    store. Same shape as the image-index rows — the shared fp_index
    engine means any regression here is an engine regression."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    from datar_polars_spark.scale import (
        audio_index_build,
        dedup_against_audio_index,
    )
    from datar_polars_spark.tibble import Tibble

    @F.pandas_udf(BinaryType())
    def _clip(doc_id: pd.Series) -> pd.Series:
        import numpy as np

        from datar_polars_spark.scale.codecs import make_wav_pcm

        cache = {}  # 64 distinct templates -> synthesize each once
        out = []
        for d_ in doc_id:
            t = int(d_) % 64
            if t in cache:
                out.append(cache[t])
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
            cache[t] = make_wav_pcm(np.clip(x / 2.4, -1, 1), sr)
            out.append(cache[t])
        return pd.Series(out)

    clips = docs.df.select("doc_id", _clip(F.col("doc_id")).alias("content"))
    if "aidx" not in _PQ_STATE:
        import tempfile

        _PQ_STATE["aidx"] = tempfile.mkdtemp(prefix="bench_aidx_") + "/idx"
    path = _PQ_STATE["aidx"]
    if phase == "build":
        audio_index_build(
            Tibble(clips.filter(F.col("doc_id") % 3 != 0)),
            "content", "doc_id", path, strict=True,
        )
        return 1
    return dedup_against_audio_index(
        Tibble(clips.filter(F.col("doc_id") % 3 == 0)), path, strict=True
    ).df.count()


def _video_index_bench(docs, phase: str) -> int:
    """r14: persistent video-fingerprint index — 'build' synthesizes a
    4-frame MJPEG AVI per corpus doc (random-walk raster template by
    doc_id % 64, quality-85 baseline JPEG frames), fingerprints (one
    Arrow frame-walk + JPEG-DC decode pass; byte-identical clips
    decode once per batch via the fingerprint memo), and indexes to
    parquet; 'match' dedups the remaining third against the store.
    Same shape as the image/audio-index rows over the shared fp_index
    engine — this row prices the most decode-heavy modality."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    from datar_polars_spark.scale import (
        dedup_against_video_index,
        video_index_build,
    )
    from datar_polars_spark.tibble import Tibble

    @F.pandas_udf(BinaryType())
    def _clip(doc_id: pd.Series) -> pd.Series:
        import numpy as np

        from datar_polars_spark.scale.codecs import (
            make_avi_mjpeg,
            make_jpeg_pixels,
        )

        cache = {}  # 64 distinct templates -> synthesize each once
        out = []
        for d_ in doc_id:
            t = int(d_) % 64
            if t not in cache:
                rng = np.random.default_rng(900 + t)
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
                cache[t] = make_avi_mjpeg(
                    [make_jpeg_pixels(fr, quality=85) for fr in frames],
                    fps=10,
                )
            out.append(cache[t])
        return pd.Series(out)

    # synthesize + materialize the clips ONCE (pure-Python MJPEG
    # encode is the expensive part of the generator, not of the
    # index) — both phases then price the index work itself, as they
    # would against real stored footage
    if "vclips" not in _PQ_STATE:
        _PQ_STATE["vclips"] = (
            docs.df.select(
                "doc_id", _clip(F.col("doc_id")).alias("content")
            ).localCheckpoint(eager=True)
        )
    clips = _PQ_STATE["vclips"]
    if "vidx" not in _PQ_STATE:
        import tempfile

        _PQ_STATE["vidx"] = tempfile.mkdtemp(prefix="bench_vidx_") + "/idx"
    path = _PQ_STATE["vidx"]
    if phase == "build":
        video_index_build(
            Tibble(clips.filter(F.col("doc_id") % 3 != 0)),
            "content", "doc_id", path, strict=True,
        )
        return 1
    return dedup_against_video_index(
        Tibble(clips.filter(F.col("doc_id") % 3 == 0)), path, strict=True
    ).df.count()


def _pagerank_bench(spark, sf_dir: str, iterations: int = 3) -> int:
    """r12: PageRank power iterations over the symmetric
    supplier<->part graph from lineitem (the q38 'prank' construction)
    — one keyed shuffle per iteration plus the edge/node
    materialization. r13 adds a 12-iteration row: above the internal-
    cache registry's FIFO cap, where the r12 implementation silently
    lost its edge cache to eviction and re-exchanged the edge list
    every remaining round — iteration caches are locally managed now,
    and this row would catch a regression to registry-dependent
    caching."""
    from pyspark.sql import functions as F

    from datar_polars_spark.scale import pagerank

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e0 = li.select(
        F.col("l_suppkey").cast("long").alias("s"),
        (F.col("l_partkey").cast("long") + 1_000_000).alias("p"),
    ).distinct()
    edges = e0.select(F.col("s").alias("src"), F.col("p").alias("dst")).unionAll(
        e0.select(F.col("p").alias("src"), F.col("s").alias("dst"))
    )
    return pagerank(edges, iterations=iterations).df.count()


def _text_embed_bench(docs) -> int:
    """r12: model-free hashing-trick embeddings over the documents
    table — one Arrow pass, 64 dims."""
    from pyspark.sql import functions as F

    from datar_polars_spark.scale import text_embed

    return (
        text_embed(docs, "text", dim=64)
        .df.select(F.sum(F.size("embedding")))
        .first()[0]
        or 0
    )


def build_session(cpus: str) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("datar-polars-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def _headline_names(qs) -> list:
    return [n for n in HEADLINE if n in qs]


def _warmup_headline(spark, qs, names, sf_dir: str) -> None:
    """JVM/codegen warm-up: run EVERY headline plan once on the
    smallest SF so whole-stage codegen classes are compiled before
    timing; the timed passes then measure sf-scale execution, not
    first-call classloading."""
    warm_dir = "/root/testdata/sf0.001"
    use = warm_dir if os.path.isdir(warm_dir) else sf_dir
    for name in names:
        try:
            qs[name](spark, use).count()
        except Exception:
            pass


def _cold_child() -> None:
    """One genuinely cold headline run in a fresh JVM: build a new
    session, codegen-warm at sf0.001, time one sf-scale pass per
    query, emit a tagged JSON line for the parent."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    names = _headline_names(qs)
    _warmup_headline(spark, qs, names, sf_dir)
    out = {}
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        out[name] = round(time.perf_counter() - t0, 3)
    out["__import_sec__"] = _IMPORT_SEC
    print("COLD_CHILD_JSON:" + json.dumps(out))


def _cold_runs(n_runs: int = 3) -> list:
    """Spawn ``n_runs`` sequential fresh-JVM cold children (never
    concurrent — they would contend for the same cores and measure
    each other)."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    runs = []
    for _ in range(n_runs):
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cold-child"],
                capture_output=True,
                text=True,
                timeout=1200,
                cwd=here,
            )
            for line in p.stdout.splitlines():
                if line.startswith("COLD_CHILD_JSON:"):
                    runs.append(json.loads(line.split(":", 1)[1]))
                    break
        except Exception:
            continue
    return runs


def _med_spread(runs: dict) -> tuple:
    """Per-key median + [median, min, max] spread over a {key: [t...]}
    dict of repeated timings."""
    med, spread = {}, {}
    for k, r in runs.items():
        s = sorted(r)
        m = s[len(s) // 2]
        med[k] = m
        spread[k] = [m, s[0], s[-1]]
    return med, spread


def _loadavg_guard(cpus: int, limit_sec: float = 120.0) -> dict:
    """Wait (bounded) for 1-min loadavg to drop below cpus/4 before
    timing, and record what happened — a run that started hot is
    annotated in the artifact instead of silently polluting the trend
    (r11 vs r10 cold differed 30% on identical headline code with
    loadavg_start 8.5 vs 4.7)."""
    thresh = max(1.0, cpus / 4.0)
    waited = 0.0
    la = os.getloadavg()[0]
    while la > thresh and waited < limit_sec:
        time.sleep(5.0)
        waited += 5.0
        la = os.getloadavg()[0]
    return {
        "threshold": round(thresh, 2),
        "waited_sec": waited,
        "loadavg_after_wait": round(la, 2),
        "satisfied": la <= thresh,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    loadavg_start = list(os.getloadavg())
    guard = _loadavg_guard(int(cpus))

    # ---- cold headline: THREE fresh-JVM runs (subprocesses), the
    # committed number is the per-query median and every number carries
    # its [median, min, max] spread. Falls back to one in-process pass
    # if the children fail (the artifact says which mode produced it).
    cold_children = _cold_runs(3)
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    names = _headline_names(qs)
    _warmup_headline(spark, qs, names, sf_dir)

    if cold_children:
        cold_mode = f"median of {len(cold_children)} fresh-JVM runs"
        cold_samples = {
            n: [run[n] for run in cold_children if n in run] for n in names
        }
        cold_samples = {n: r for n, r in cold_samples.items() if r}
        cold, cold_spread = _med_spread(cold_samples)
    else:
        cold_mode = "in-process single pass (cold children failed)"
        cold = {}
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            cold[name] = round(time.perf_counter() - t0, 3)
        cold_spread = {n: [v, v, v] for n, v in cold.items()}

    # one untimed priming pass so the warm passes below are pure
    # steady state (sf-scale codegen compiled), then THREE timed
    # steady-state passes: per-query MEDIAN + [med, min, max] spread —
    # a noise-inflated run is visible in the artifact instead of
    # masquerading as a code regression (the r3 recorded/re-run totals
    # differed 45% on identical code)
    for name in names:
        try:
            qs[name](spark, sf_dir).count()
        except Exception:
            pass
    warm_runs: dict[str, list[float]] = {name: [] for name in names}
    for _ in range(3):
        for name in names:
            fn = qs[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n_rows = df.count()  # materialize the whole result
            warm_runs[name].append(round(time.perf_counter() - t0, 3))
            _ = n_rows
    warm, warm_spread = _med_spread(warm_runs)

    # scale-pipeline ops (LLM-training-data path): pass 1 is dominated
    # by whole-stage-codegen compilation of the wide signature
    # expressions (a fixed per-plan cost that amortizes to zero at
    # corpus scale) and is recorded as the first-call cost; then THREE
    # steady-state passes give the warm median + [med, min, max]
    # spread that actually scales with data
    scale_ops: dict[str, float] = {}
    scale_ops_warm: dict[str, float] = {}
    scale_ops_warm_spread: dict[str, list] = {}
    scale_ops_error: str | None = None
    sf1_error: str | None = None
    warm_dir = "/root/testdata/sf0.001"
    try:
        from datar_polars_spark import f, read_parquet
        from datar_polars_spark.scale import cosine_topk, minhash_dedup

        docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
        emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
        q = emb.df.select("embedding").first()[0]
        # same codegen warm-up protocol as the headline queries: run the
        # dedup plan once at the smallest SF so the timed passes measure
        # sf-scale execution, not first-call whole-stage-codegen compile
        if os.path.isdir(warm_dir):
            try:
                wdocs = read_parquet(spark, f"{warm_dir}/documents.parquet")
                (wdocs >> minhash_dedup(f.text, f.doc_id, threshold=0.7)).df.count()
            except Exception:
                pass
        ops = {
            "minhash_dedup": lambda: (
                docs >> minhash_dedup(f.text, f.doc_id, threshold=0.7)
            ).df.count(),
            "minhash_dedup_components": lambda: (
                docs
                >> minhash_dedup(
                    f.text, f.doc_id, threshold=0.7, resolve="components"
                )
            ).df.count(),
            "cosine_topk": lambda: cosine_topk(
                emb, [float(v) for v in q], f.embedding, f.vec_id, k=10
            ).df.count(),
            "semantic_dedup": lambda: __import__(
                "datar_polars_spark.scale.dedup", fromlist=["semantic_dedup"]
            ).semantic_dedup(emb, f.embedding, f.vec_id, eps=0.05).df.count(),
            # batch retrieval: 64 query rows x corpus, exact path
            # (broadcast queries + map-side WindowGroupLimit top-k)
            "knn_join": lambda: __import__(
                "datar_polars_spark.scale.similarity", fromlist=["knn_join"]
            ).knn_join(
                emb.df.filter("vec_id < 64"), emb, k=10
            ).df.count(),
            # r5 ops: exact-substring spans (two keyed shuffles),
            # Stupid Backoff LM scoring (count tables + hash joins),
            # Bloom semi-join reduction (build + narrow probe)
            "duplicate_spans": lambda: __import__(
                "datar_polars_spark.scale.substr", fromlist=["duplicate_spans"]
            ).duplicate_spans(docs, k=8, min_count=2).df.count(),
            # order passed explicitly on both sides: a real pipeline
            # knows the order it trained, and the explicit arg keeps
            # score's plan build job-free (no max(n) derivation)
            "ngram_lm_score": lambda: (
                lambda lmmod: lmmod.ngram_lm_score(
                    docs, lmmod.ngram_lm_train(docs, order=2), order=2
                ).df.count()
            )(__import__("datar_polars_spark.scale.lm", fromlist=["x"])),
            # r6: CCNet-style 5-gram quality filtering — the deep-order
            # backoff costs one extra hash join per order; the bench
            # guards that 5-gram stays within ~2x of bigram at sf0.1
            "ngram_lm5_score": lambda: (
                lambda lmmod: lmmod.ngram_lm_score(
                    docs, lmmod.ngram_lm_train(docs, order=5), order=5
                ).df.count()
            )(__import__("datar_polars_spark.scale.lm", fromlist=["x"])),
            # r6: batch PQ retrieval — encode the corpus once, stack 64
            # query LUTs, one Arrow pass + WindowGroupLimit top-k
            "pq_knn_join": lambda: _pq_knn_bench(emb),
            # r7: the same batch through the distributed (cogrouped)
            # query path, and the IVF-PQ composition (probed cells +
            # residual codes) — the billion-vector shapes
            "pq_knn_join_dist": lambda: _pq_knn_dist_bench(emb),
            "ivfpq_knn_join": lambda: _ivfpq_bench(emb),
            # r9: the distributed IVF-PQ path with live-pair pruning
            "ivfpq_knn_join_dist": lambda: _ivfpq_dist_bench(emb),
            # r6 A/B: the narrow per-row HOF signature fold (the r5
            # formulation, built here explicitly) vs the explode+groupBy
            # form that _minhash_sigs now uses — same shingles, same 64
            # xxhash64 permutations, counted signatures. The r6 switch to
            # explode rests on this measurement; it re-defends itself
            # every round.
            "minhash_sig_fold": lambda: _minhash_sigs_fold(docs.df, 64, 3),
            "minhash_sig_explode": lambda: _minhash_sigs_explode(
                docs.df, 64, 3
            ).count(),
            "bloom_semi_reduce": lambda: __import__(
                "datar_polars_spark.scale.bloom", fromlist=["bloom_semi_reduce"]
            ).bloom_semi_reduce(
                docs,
                docs.df.filter("doc_id % 7 = 0").select("doc_id"),
                on="doc_id",
            ).df.count(),
            # r10: cross-table embedding match, broadcast (exact) mode —
            # the semantic-decontamination shape: a 64-row benchmark
            # matrix broadcasts and ONE narrow Arrow pass over the
            # corpus scores every pair, no shuffle
            "embedding_join_bcast": lambda: __import__(
                "datar_polars_spark.scale.dedup", fromlist=["embedding_join"]
            ).embedding_join(
                emb,
                emb.df.filter("vec_id < 64").select("vec_id", "embedding"),
                threshold=0.9,
                mode="broadcast",
            ).df.count(),
            # r11: corpus-scope paragraph dedup after the shuffle
            # narrowing (only id/pos/para ride the exchanges) — same
            # synthesized-paragraph shape as the q69 gate
            "dedup_paragraphs": lambda: _dedup_paragraphs_bench(docs),
            # r11: the extraction front-end (html_to_text ->
            # normalize_text) over synthetic markup — scan-stage regex
            "html_extract": lambda: _html_extract_bench(docs),
            # r12: the trained-model scoring stages — language ID
            # (dense-matrix gather scoring) and the model-free
            # hashing-trick embedding, each ONE Arrow pass over docs
            "lang_id_predict": lambda: _lang_id_bench(spark, docs),
            "text_embed": lambda: _text_embed_bench(docs),
            # r12: persistent dedup index — one-time corpus indexing
            # vs the steady-state batch-vs-store match (dict order
            # guarantees build runs before match in every round)
            "dedup_index_build": lambda: _index_dedup_bench(docs, "build"),
            "dedup_against_index": lambda: _index_dedup_bench(docs, "match"),
            # r13: persistent image-fingerprint index — same build/
            # match split over per-doc synthesized pixel PNGs
            "image_index_build": lambda: _image_index_bench(docs, "build"),
            "dedup_against_image_index": lambda: _image_index_bench(
                docs, "match"
            ),
            # r14: persistent audio-fingerprint index — same engine,
            # spectral fingerprint over per-doc synthesized WAVs
            "audio_index_build": lambda: _audio_index_bench(docs, "build"),
            "dedup_against_audio_index": lambda: _audio_index_bench(
                docs, "match"
            ),
            # r14: persistent video-fingerprint index — same engine,
            # temporal-median fingerprint over per-doc MJPEG AVIs
            "video_index_build": lambda: _video_index_bench(docs, "build"),
            "dedup_against_video_index": lambda: _video_index_bench(
                docs, "match"
            ),
            # r12: crawl-graph ranking — 3 power iterations over the
            # symmetric supplier<->part graph (~2x distinct lineitem
            # pairs as edges)
            "pagerank": lambda: _pagerank_bench(spark, sf_dir),
            # r13: the long-run regime (12 > the FIFO registry cap of
            # 8) — locks the locally-managed iteration caches; should
            # scale ~linearly from the 3-iteration row, never jump to
            # per-round edge re-exchange cost
            "pagerank_12iter": lambda: _pagerank_bench(
                spark, sf_dir, iterations=12
            ),
            # r12: persistent semantic index — corpus postings to
            # disk once, steady-state batch-vs-store semantic match
            "semantic_index_build": lambda: _semantic_index_bench(
                emb, "build"
            ),
            "dedup_against_semantic_index": lambda: _semantic_index_bench(
                emb, "match"
            ),
        }
        for op_name, op in ops.items():
            t0 = time.perf_counter()
            op()
            scale_ops[op_name] = round(time.perf_counter() - t0, 3)
        op_runs: dict[str, list[float]] = {n_: [] for n_ in ops}
        for _ in range(3):
            for op_name, op in ops.items():
                t0 = time.perf_counter()
                op()
                op_runs[op_name].append(round(time.perf_counter() - t0, 3))
        scale_ops_warm, scale_ops_warm_spread = _med_spread(op_runs)
    except Exception:
        # never silent: a failed section shows up in the artifact as an
        # error string, not as a mysteriously missing block
        import traceback

        scale_ops_error = traceback.format_exc(limit=3).strip().splitlines()[-1]

    # ---- sf1 scaling pass (10x data): one timed pass per headline
    # query + the dedup scale op, after codegen is warm — the point is
    # the SCALING CURVE (10x data should cost well under 10x wall on
    # these plans: fixed per-query overheads amortize and every stage
    # is a parallel keyed shuffle). The sf1 dataset is a key-shifted
    # 10x replication of sf0.1 (tools/make_sf1.py), generated on first
    # use and kept under benchdata/.
    sf1: dict[str, float] = {}
    sf1_spread: dict[str, list] = {}
    sf1_scale_ops: dict[str, list] = {}
    sf1_loadavg: list | None = None
    sf1_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchdata", "sf1")
    if os.environ.get("SPARK_GRAFT_SKIP_SF1", "") != "1":
        try:
            # drop persisted frames from the sf0.1 passes so the sf1
            # timings measure execution, not GC pressure from stale
            # cached state
            spark.catalog.clearCache()
            # regenerate when the driver refreshed the source testdata
            src_probe = os.path.join(sf_dir, "orders.parquet")
            dst_probe = os.path.join(sf1_dir, "orders.parquet")
            stale = (
                os.path.isdir(sf1_dir)
                and os.path.exists(src_probe)
                and os.path.exists(dst_probe)
                and os.path.getmtime(src_probe) > os.path.getmtime(dst_probe)
            )
            if stale:
                import shutil

                shutil.rmtree(sf1_dir, ignore_errors=True)
            if not os.path.isdir(sf1_dir):
                import subprocess

                subprocess.run(
                    [sys.executable, "tools/make_sf1.py", sf_dir, sf1_dir],
                    check=True,
                    capture_output=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                )
            # THREE timed passes per headline query at sf1 (the r11
            # single-shot section was the last spread-less number in
            # the artifact): median + [med, min, max]
            sf1_runs: dict[str, list[float]] = {name: [] for name in names}
            for _ in range(3):
                for name in names:
                    t0 = time.perf_counter()
                    qs[name](spark, sf1_dir).count()
                    sf1_runs[name].append(
                        round(time.perf_counter() - t0, 3)
                    )
            sf1, sf1_spread = _med_spread(sf1_runs)
            from datar_polars_spark import f as _f
            from datar_polars_spark import read_parquet as _rp
            from datar_polars_spark.scale import duplicate_spans as _dsp
            from datar_polars_spark.scale import minhash_dedup as _mh

            # r10/r11: scale-factor evidence for dedup, the ANN paths
            # and the substring-span pipeline — the IVF-PQ indexes
            # trained on the sf0.1 pass stay valid (sf1 is a
            # key-shifted replication of the same vectors), so these
            # time pure retrieval/scan scaling, not training. Each op
            # runs THREE times and records [median, min, max]: r10's
            # single-shot duplicate_spans read 6.3 s in one run and
            # 18.2 s in a re-run of identical code (box load), and a
            # single number cannot distinguish that from a regression.
            docs1 = _rp(spark, f"{sf1_dir}/documents.parquet")
            emb1 = _rp(spark, f"{sf1_dir}/embeddings.parquet")
            # r12: fresh index over the sf1 corpus, built ONCE
            # (untimed — the sf0.1 section carries build cost); the
            # timed op is the steady-state batch-vs-store match
            _PQ_STATE.pop("didx", None)
            _index_dedup_bench(docs1, "build")
            _PQ_STATE.pop("sidx", None)
            _semantic_index_bench(emb1, "build")
            sf1_ops = {
                "minhash_dedup": lambda: (
                    docs1 >> _mh(_f.text, _f.doc_id, threshold=0.7)
                ).df.count(),
                "ivfpq_knn_join": lambda: _ivfpq_bench(emb1),
                "ivfpq_knn_join_dist": lambda: _ivfpq_dist_bench(emb1),
                "duplicate_spans": lambda: _dsp(
                    docs1, k=8, min_count=2
                ).df.count(),
                "dedup_paragraphs": lambda: _dedup_paragraphs_bench(docs1),
                "dedup_against_index": lambda: _index_dedup_bench(
                    docs1, "match"
                ),
                "pagerank": lambda: _pagerank_bench(spark, sf1_dir),
                "dedup_against_semantic_index": lambda:
                    _semantic_index_bench(emb1, "match"),
            }
            for op_name, op in sf1_ops.items():
                runs = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    op()
                    runs.append(round(time.perf_counter() - t0, 3))
                runs.sort()
                sf1_scale_ops[op_name] = [runs[1], runs[0], runs[2]]
            sf1_loadavg = list(os.getloadavg())
        except Exception:
            import traceback

            sf1_error = traceback.format_exc(limit=3).strip().splitlines()[-1]

    total = round(sum(cold.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    payload = json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "value_definition": "sum of per-query cold medians; "
                + cold_mode,
                "queries": cold,
                "queries_cold_spread": cold_spread,
                "spread_format": "[median, min, max] of 3",
                "warm_total": round(sum(warm.values()), 3),
                "queries_warm": warm,
                "queries_warm_spread": warm_spread,
                "warm_runs": 3,
                "loadavg_start": loadavg_start,
                "loadavg_guard": guard,
                "loadavg_end": list(os.getloadavg()),
                # r13 drift audit: package+entry import cost per fresh
                # cold child — sits OUTSIDE the per-query timers, so a
                # uniform per-query drift cannot be import growth
                # (r14: ~0.7 s/child, scale/ itself ~80 ms); a uniform
                # drift with stable import + quiet loadavg is box-state
                # (page cache / cgroup), not code
                "cold_child_import_sec": [
                    run.get("__import_sec__") for run in cold_children
                ] or None,
                "scale_ops_first_call": scale_ops,
                "scale_ops_warm": scale_ops_warm,
                "scale_ops_warm_spread": scale_ops_warm_spread,
                "scale_ops_error": scale_ops_error,
                "sf1_error": sf1_error,
                "sf1_total": round(sum(sf1.values()), 3) if sf1 else None,
                "sf1_queries": sf1 or None,
                "sf1_queries_spread": sf1_spread or None,
                "sf1_scale_ops": sf1_scale_ops or None,
                "sf1_loadavg": sf1_loadavg,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
    )
    # file copy FIRST: BENCH_r05's recorded JSON was truncated by the
    # driver's stdout-tail capture ("parsed": null); the file makes the
    # metrics independent of how much tail the harness keeps
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_LAST.json"), "w") as fh:
            fh.write(payload + "\n")
    except Exception:
        pass
    # The payload must be the LAST thing this process emits: BENCH_r12
    # had rc=0 but "parsed": null because a DAGScheduler
    # PythonAccumulatorV2 broken-pipe stack trace was printed AFTER the
    # JSON line and displaced it from the driver's stdout-tail capture.
    # Stop every streaming query and the whole Spark JVM first — a dead
    # JVM cannot emit post-payload traces — then print and exit.
    try:
        for q in list(spark.streams.active):
            try:
                q.stop()
            except Exception:
                pass
        spark.stop()
    except Exception:
        pass
    sys.stderr.flush()
    # The last line must also FIT the driver's stdout-tail capture:
    # BENCH_r13 printed the full 6,088-byte payload last (post-stop, so
    # nothing displaced it) and STILL recorded "parsed": null because
    # the tail window keeps only ~2,000 chars — the JSON's head was cut
    # off. Emit a compact summary (<1,000 bytes) as the final line; the
    # full artifact (spreads, scale ops, sf1 section) lives in
    # BENCH_LAST.json, written above.
    # r15: the compute-bound sf1 numbers ride in the parsed summary —
    # at sf0.1 the headline queries are fixed-overhead-bound (~30 ms
    # tasks; the r14 8-core run beat the 32-core run on every query),
    # so the round-over-round and scaling trends need the 10x block
    # where per-stage compute dominates. loadavg is rounded to keep the
    # line compact.
    summary = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": cold,
            "warm_total": round(sum(warm.values()), 3),
            "sf1_total": round(sum(sf1.values()), 3) if sf1 else None,
            "sf1_queries": sf1 or None,
            "loadavg_start": [round(v, 2) for v in loadavg_start],
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "full_payload": "BENCH_LAST.json",
        }
    )
    if len(summary) > 1900:  # hard guard: never exceed the tail window
        summary = json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "full_payload": "BENCH_LAST.json",
            }
        )
    print(summary, flush=True)


if __name__ == "__main__":
    if "--cold-child" in sys.argv[1:]:
        _cold_child()
    else:
        main()
