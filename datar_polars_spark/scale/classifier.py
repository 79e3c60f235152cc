"""Trainable text-quality classifier — the fastText-style supervised
linear model over hashed word n-grams that CCNet / DCLM / FineWeb-Edu
pipelines train to keep "high-quality" documents (reference has no
counterpart; this extends the curation layer the same way langid.py
does, and plugs into ``classifier_score``'s scoring slot).

Public technique only: feature hashing (Weinberger et al. 2009),
mean-pooled bag of hashed word 1..n-grams (the fastText input layer,
Joulin et al. 2016), binary logistic regression trained full-batch
with driver-side Adam over DISTRIBUTED sufficient gradients.

100 TB design:

* ``quality_classifier_train`` tokenizes the corpus ONCE into bounded
  sparse per-doc feature vectors (one Arrow pass, no shuffle) and
  caches that — iterations never re-read or re-tokenize the text.
* Each iteration is one Arrow scan computing per-PARTITION dense
  gradient accumulators, emitted sparse; the only shuffle is a
  groupBy(bucket) sum whose width is bounded by ``buckets`` rows after
  map-side combine — independent of corpus size.
* The driver holds O(buckets) floats (the model, ~1 MB at the default
  2^17) — never a row of data; the weight vector ships to executors in
  the UDF closure each iteration.
* ``quality_classifier_predict`` is ONE Arrow pass with the model in
  the closure — no shuffle, composes with in-scan filters (apply
  selective filters BEFORE predict, as with lang_id_predict).
"""

from __future__ import annotations

import math
import re
import zlib
from typing import Any

import pandas as pd
from pyspark.sql import Column  # noqa: F401 (parity with siblings)
from pyspark.sql import functions as F

from ..tibble import Tibble, ensure_tibble

__all__ = [
    "quality_classifier_train",
    "quality_classifier_predict",
    "quality_classifier_eval",
    "quality_classifier_write",
    "quality_classifier_read",
]

_WORD_RE = re.compile(r"[^\W_]+", re.UNICODE)


_WS_RE = re.compile(r"[\s0-9]+")


def _doc_grams(text: str, n_lo: int, n_hi: int, analyzer: str) -> list:
    """The document's gram list. ``analyzer="word"``: hashed word
    1..n-grams (the fastText shape — right for whitespace-delimited
    scripts). ``analyzer="char"``: boundary-padded char n-grams (the
    langid shape — required for unsegmented CJK text, where the word
    regex would collapse a whole run of hanzi/kana into ONE token and
    every document would hash to near-unique grams)."""
    if analyzer == "char":
        t = "\x02" + _WS_RE.sub("\x02", text.lower()) + "\x02"
        return [
            t[i : i + n]
            for n in range(n_lo, n_hi + 1)
            for i in range(len(t) - n + 1)
        ]
    toks = _WORD_RE.findall(text.lower())
    grams: list = []
    for n in range(n_lo, n_hi + 1):
        if n == 1:
            grams.extend(toks)
        else:
            grams.extend(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
    return grams


def _doc_features(
    text: str, n_lo: int, n_hi: int, buckets: int, analyzer: str = "word"
):
    """Sparse mean-pooled hashed-gram features for one document:
    (sorted bucket ids, values summing to 1). None when no grams."""
    grams = _doc_grams(text, n_lo, n_hi, analyzer)
    if not grams:
        return None
    counts: dict = {}
    for g in grams:
        b = zlib.crc32(g.encode("utf-8")) % buckets
        counts[b] = counts.get(b, 0) + 1
    tot = float(len(grams))
    idx = sorted(counts)
    return idx, [counts[b] / tot for b in idx]


def quality_classifier_train(
    td: Any,
    text: Any = "text",
    label: Any = "label",
    pos_label: Any = None,
    n_lo: int = 1,
    n_hi: int = 2,
    buckets: int = 1 << 17,
    iters: int = 40,
    lr: float = 0.25,
    l2: float = 0.0,
    class_weight: Any = None,
    tol: float = 0.0,
    analyzer: str = "word",
) -> dict:
    """Train a binary quality classifier from a labeled (text, label)
    table. ``label`` is 0/1 (numeric or boolean); pass ``pos_label``
    to derive y from an arbitrary label column (y = label == pos_label).

    ``class_weight``: None (all rows weigh 1), ``"balanced"`` (each
    class weighted n/(2*n_class) so a 1%-positive corpus — the typical
    quality-filter shape — doesn't collapse to the majority), or a
    ``{0: w0, 1: w1}`` dict. Balanced counts cost one extra aggregation
    over the cached features.

    ``tol``: early stopping — stop when the mean loss improves by less
    than ``tol`` between iterations (0 disables). Each iteration is a
    full corpus scan, so on a large labeled set a converged-at-12
    run with ``tol=1e-4`` saves the remaining scans outright.

    ``analyzer``: ``"word"`` (hashed word n-grams, fastText shape) or
    ``"char"`` (boundary-padded char n-grams — use with e.g.
    ``n_lo=2, n_hi=4`` for unsegmented CJK corpora, where word
    tokenization collapses whole hanzi/kana runs into single tokens).
    Recorded in the model; predict/eval follow it automatically.

    One tokenize-and-hash Arrow pass caches bounded sparse per-doc
    vectors; each of ``iters`` full-batch iterations computes the
    (weighted) logistic-loss gradient as per-partition dense
    accumulators reduced by a groupBy(bucket) sum (map-side combine,
    <= ``buckets`` rows on the wire), and the driver applies an Adam
    step. Returns a JSON-able model dict (sparse ``weights``,
    ``bias``, gram config, ``loss_history`` of per-doc mean weighted
    log-loss).
    """
    import numpy as np

    td = ensure_tibble(td)
    tname = text if isinstance(text, str) else text._name
    lname = label if isinstance(label, str) else label._name
    buckets = int(buckets)
    n_lo, n_hi = int(n_lo), int(n_hi)
    if analyzer not in ("word", "char"):
        raise ValueError(
            f"quality_classifier_train: analyzer must be 'word' or "
            f"'char', got {analyzer!r}"
        )

    if pos_label is not None:
        ycol = (F.col(lname) == F.lit(pos_label)).cast("double")
    else:
        ycol = F.col(lname).cast("double")
    base = td.df.select(
        ycol.alias("__y"), F.col(tname).alias("__t")
    ).where(F.col("__y").isNotNull() & F.col("__t").isNotNull())

    feat_schema = "y double, idx array<int>, val array<double>"

    def tokenize(batches):
        for pdf in batches:
            ys, idxs, vals = [], [], []
            for y, t in zip(pdf["__y"], pdf["__t"]):
                fv = _doc_features(str(t), n_lo, n_hi, buckets, analyzer)
                if fv is None:
                    continue
                ys.append(float(y))
                idxs.append(fv[0])
                vals.append(fv[1])
            if ys:
                yield pd.DataFrame({"y": ys, "idx": idxs, "val": vals})

    feats = base.mapInPandas(tokenize, schema=feat_schema)
    # tokenization runs exactly once: iterations scan the cached sparse
    # vectors (spill-safe — MEMORY_AND_DISK)
    from pyspark import StorageLevel

    feats = feats.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        if class_weight == "balanced":
            by = {
                float(r["y"]): int(r["n"])
                for r in feats.groupBy("y")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            n_all = sum(by.values())
            if not n_all:
                raise ValueError(
                    "quality_classifier_train: no usable labeled rows "
                    "(all texts empty or labels NULL)"
                )
            w0 = n_all / (2.0 * by.get(0.0, 1)) if by.get(0.0) else 1.0
            w1 = n_all / (2.0 * by.get(1.0, 1)) if by.get(1.0) else 1.0
        elif isinstance(class_weight, dict):
            w0 = float(class_weight.get(0, 1.0))
            w1 = float(class_weight.get(1, 1.0))
        elif class_weight is None:
            w0 = w1 = 1.0
        else:
            raise ValueError(
                "quality_classifier_train: class_weight must be None, "
                f"'balanced', or a {{0: w0, 1: w1}} dict, got "
                f"{class_weight!r}"
            )
        w = np.zeros(buckets)
        bias = 0.0
        m_w = np.zeros(buckets)
        v_w = np.zeros(buckets)
        m_b = v_b = 0.0
        beta1, beta2, eps = 0.9, 0.999, 1e-8
        loss_history: list = []
        n_docs = None

        grad_schema = "bucket long, val double"

        for it in range(1, int(iters) + 1):
            w_c, b_c = w, bias  # close over this iteration's params

            def grad_pass(batches, _w=w_c, _b=b_c):
                g = np.zeros(buckets)
                bias_g = 0.0
                loss = 0.0
                cnt = 0
                wsum = 0.0
                for pdf in batches:
                    for y, idx, val in zip(pdf["y"], pdf["idx"], pdf["val"]):
                        xi = np.asarray(idx, dtype=np.int64)
                        xv = np.asarray(val, dtype=np.float64)
                        z = _b + float(_w[xi] @ xv)
                        p = 1.0 / (1.0 + math.exp(-z))
                        cw = w1 if float(y) >= 0.5 else w0
                        e = cw * (p - float(y))
                        np.add.at(g, xi, e * xv)
                        bias_g += e
                        # clamped log-loss (p can saturate to 0/1)
                        p = min(max(p, 1e-12), 1.0 - 1e-12)
                        loss -= cw * (
                            float(y) * math.log(p)
                            + (1.0 - float(y)) * math.log(1.0 - p)
                        )
                        cnt += 1
                        wsum += cw
                nz = np.nonzero(g)[0]
                yield pd.DataFrame(
                    {
                        "bucket": np.concatenate(
                            [nz, np.array([-1, -2, -3, -4], dtype=np.int64)]
                        ),
                        "val": np.concatenate(
                            [g[nz], np.array([bias_g, loss, float(cnt), wsum])]
                        ),
                    }
                )

            rows = (
                feats.mapInPandas(grad_pass, schema=grad_schema)
                .groupBy("bucket")
                .agg(F.sum("val").alias("val"))
                .collect()
            )
            g = np.zeros(buckets)
            bias_g = loss = 0.0
            cnt = wsum = 0.0
            for r in rows:
                b = int(r["bucket"])
                if b == -1:
                    bias_g = float(r["val"])
                elif b == -2:
                    loss = float(r["val"])
                elif b == -3:
                    cnt = float(r["val"])
                elif b == -4:
                    wsum = float(r["val"])
                else:
                    g[b] = float(r["val"])
            if cnt == 0:
                raise ValueError(
                    "quality_classifier_train: no usable labeled rows "
                    "(all texts empty or labels NULL)"
                )
            n_docs = int(cnt)
            g /= wsum
            bias_g /= wsum
            if l2:
                g += float(l2) * w
            mean_loss = loss / wsum
            if (
                tol > 0
                and loss_history
                and loss_history[-1] - mean_loss < float(tol)
            ):
                loss_history.append(round(mean_loss, 6))
                break
            loss_history.append(round(mean_loss, 6))

            # Adam step (driver-side; model-sized state only)
            m_w = beta1 * m_w + (1 - beta1) * g
            v_w = beta2 * v_w + (1 - beta2) * g * g
            m_b = beta1 * m_b + (1 - beta1) * bias_g
            v_b = beta2 * v_b + (1 - beta2) * bias_g * bias_g
            mh = m_w / (1 - beta1**it)
            vh = v_w / (1 - beta2**it)
            w = w - lr * mh / (np.sqrt(vh) + eps)
            bias = bias - lr * (m_b / (1 - beta1**it)) / (
                math.sqrt(v_b / (1 - beta2**it)) + eps
            )
    finally:
        feats.unpersist()

    nz = np.nonzero(w)[0]
    return {
        "format": "datar-quality-clf",
        "version": 1,
        "buckets": buckets,
        "n_lo": n_lo,
        "n_hi": n_hi,
        "bias": float(bias),
        "weights": {str(int(b)): float(w[b]) for b in nz},
        "n_docs": n_docs,
        "iters": int(iters),
        "analyzer": analyzer,
        "class_weight": None if w0 == w1 == 1.0 else [w0, w1],
        "loss_history": loss_history,
    }


def quality_classifier_predict(
    td: Any,
    model: dict,
    text: Any = "text",
    out_col: str = "quality_prob",
) -> Tibble:
    """Score a text column through a :func:`quality_classifier_train`
    model: adds ``out_col`` = P(label=1), NULL for NULL/gramless text.
    ONE Arrow pass, model in the closure, no shuffle — as with
    lang_id_predict, apply selective filters BEFORE this so they reach
    the scan (the UDF carries the asNondeterministic marker that stops
    Catalyst from pushing filters into the UDF expression)."""
    if not isinstance(model, dict) or model.get("format") != "datar-quality-clf":
        raise ValueError(
            "quality_classifier_predict: model must be a "
            "quality_classifier_train dict"
        )
    import numpy as np

    td = ensure_tibble(td)
    tname = text if isinstance(text, str) else text._name
    buckets = int(model["buckets"])
    n_lo, n_hi = int(model["n_lo"]), int(model["n_hi"])
    analyzer = model.get("analyzer", "word")  # pre-r12 artifacts: word
    bias = float(model["bias"])
    w = np.zeros(buckets)
    for b, v in model["weights"].items():
        w[int(b)] = float(v)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _score(s: pd.Series) -> pd.Series:
        out = []
        for v in s:
            if v is None:
                out.append(None)
                continue
            fv = _doc_features(str(v), n_lo, n_hi, buckets, analyzer)
            if fv is None:
                out.append(None)
                continue
            xi = np.asarray(fv[0], dtype=np.int64)
            xv = np.asarray(fv[1], dtype=np.float64)
            z = bias + float(w[xi] @ xv)
            out.append(1.0 / (1.0 + math.exp(-z)))
        return pd.Series(out, dtype="float64")

    _score = _score.asNondeterministic()
    if out_col in td.columns:
        raise ValueError(
            f"quality_classifier_predict: column {out_col!r} already exists"
        )
    return td.with_df(td.df.withColumn(out_col, _score(F.col(tname))))


def quality_classifier_write(spark, model: dict, path: str) -> None:
    """Persist a model as a one-file JSON artifact (pca_write's format
    envelope)."""
    from .jsonio import write_json_file

    write_json_file(spark, path, model)


def quality_classifier_read(spark, path: str) -> dict:
    """Load a quality_classifier_write artifact; validates the format
    tag."""
    from .jsonio import read_json_file

    model = read_json_file(spark, path)
    if model.get("format") != "datar-quality-clf":
        raise ValueError(
            f"quality_classifier_read: not a quality classifier "
            f"artifact at {path!r}"
        )
    return model


def quality_classifier_eval(
    td: Any,
    model: dict,
    text: Any = "text",
    label: Any = "label",
    pos_label: Any = None,
    auc_buckets: int = 1000,
) -> dict:
    """Held-out evaluation of a :func:`quality_classifier_train` model:
    returns ``{"n", "n_pos", "accuracy", "log_loss", "auc"}``.

    Distributed shape: ONE scoring Arrow pass + ONE aggregation.
    Accuracy and log-loss are exact (conditional sums). AUC is
    bucket-approximated: scores quantize into ``auc_buckets`` bins, a
    groupBy(bin) counts positives/negatives per bin (map-side combine,
    <= auc_buckets rows), and the driver integrates the ROC curve by
    the trapezoid rule over those bins — the resolution error is
    bounded by 1/auc_buckets, and NO global sort or single-task rank
    window ever touches the corpus (the textbook rank-based AUC would
    be exactly that bottleneck at 100 TB).
    """
    import numpy as np

    td = ensure_tibble(td)
    tname = text if isinstance(text, str) else text._name
    lname = label if isinstance(label, str) else label._name
    if pos_label is not None:
        ycol = (F.col(lname) == F.lit(pos_label)).cast("double")
    else:
        ycol = F.col(lname).cast("double")
    nb = int(auc_buckets)
    scored = quality_classifier_predict(
        ensure_tibble(
            td.df.select(F.col(tname).alias("__t"), ycol.alias("__y")).where(
                F.col("__y").isNotNull() & F.col(tname).isNotNull()
            )
        ),
        model,
        "__t",
        out_col="__p",
    ).df.where(F.col("__p").isNotNull())

    p = F.col("__p")
    yv = F.col("__y")
    pc = F.greatest(F.least(p, F.lit(1.0 - 1e-12)), F.lit(1e-12))
    stats = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(yv).alias("n_pos"),
        F.sum(
            F.when((p >= 0.5) == (yv >= 0.5), 1).otherwise(0)
        ).alias("n_correct"),
        F.sum(-(yv * F.log(pc) + (1 - yv) * F.log(1 - pc))).alias("ll"),
    ).first()
    n = int(stats["n"] or 0)
    if n == 0:
        raise ValueError("quality_classifier_eval: no usable labeled rows")
    n_pos = int(stats["n_pos"])

    # bucketed ROC: per-bin positive/negative counts, driver trapezoid
    binned = (
        scored.select(
            F.least(
                F.floor(p * nb).cast("int"), F.lit(nb - 1)
            ).alias("__b"),
            yv,
        )
        .groupBy("__b")
        .agg(
            F.sum(yv).alias("pos"),
            F.sum(1 - yv).alias("neg"),
        )
        .collect()
    )
    pos = np.zeros(nb)
    neg = np.zeros(nb)
    for r in binned:
        pos[int(r["__b"])] = float(r["pos"])
        neg[int(r["__b"])] = float(r["neg"])
    auc = None
    if 0 < n_pos < n:
        # pair-counting AUC over bins: a positive beats every negative
        # in a LOWER bin, and half-credits ties in its own bin — exact
        # up to the bin resolution (error bounded by 1/auc_buckets)
        neg_below = 0.0
        pairs = 0.0
        for b in range(nb):
            pairs += pos[b] * (neg_below + 0.5 * neg[b])
            neg_below += neg[b]
        auc = pairs / (n_pos * (n - n_pos))
    return {
        "n": n,
        "n_pos": n_pos,
        "accuracy": round(int(stats["n_correct"]) / n, 6),
        "log_loss": round(float(stats["ll"]) / n, 6),
        "auc": round(auc, 6) if auc is not None else None,
        "auc_buckets": nb,
    }
