"""Trainable quality classifier (scale/classifier.py): feature
extraction, distributed full-batch training vs a numpy reference on
the SAME data, separability/accuracy floors, pos_label derivation,
NULL semantics, persistence round-trip, loss monotonicity, and plan
shape (predict is one Arrow pass, no shuffle)."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from datar_polars_spark.scale import (
    quality_classifier_predict,
    quality_classifier_read,
    quality_classifier_train,
    quality_classifier_write,
)
from datar_polars_spark.scale.classifier import _doc_features
from datar_polars_spark.tibble import ensure_tibble

GOOD_WORDS = (
    "research careful analysis method evidence result clear "
    "structure paragraph citation measured detailed thorough"
).split()
BAD_WORDS = (
    "click buy cheap winner prize free casino pills xxx "
    "subscribe spam lottery jackpot viagra"
).split()


def _corpus(n=160, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        good = i % 2 == 0
        words = GOOD_WORDS if good else BAD_WORDS
        text = " ".join(rng.choice(words) for _ in range(30))
        rows.append((text, 1 if good else 0))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return ensure_tibble(
        spark.createDataFrame(_corpus(), "text string, label int")
    )


@pytest.fixture(scope="module")
def model(corpus):
    return quality_classifier_train(corpus, "text", "label", iters=30)


def test_doc_features_mean_pooled():
    idx, val = _doc_features("the cat sat", 1, 2, 1 << 17)
    # 3 unigrams + 2 bigrams = 5 grams, values sum to 1
    assert abs(sum(val) - 1.0) < 1e-12
    assert len(idx) == len(val) and idx == sorted(idx)
    assert _doc_features("", 1, 2, 64) is None
    assert _doc_features("!!! ...", 1, 2, 64) is None


def test_model_shape_and_loss_decreases(model):
    assert model["format"] == "datar-quality-clf"
    assert model["n_docs"] == 160
    hist = model["loss_history"]
    assert len(hist) == 30
    # full-batch Adam on separable data: loss collapses
    assert hist[-1] < hist[0] / 5
    assert hist[0] <= math.log(2) + 0.01  # starts at ~ln 2 from w=0


def test_separable_accuracy(spark, model, corpus):
    scored = quality_classifier_predict(corpus, model, "text")
    rows = scored.df.select("label", "quality_prob").collect()
    acc = sum(
        1 for r in rows if (r["quality_prob"] >= 0.5) == (r["label"] == 1)
    ) / len(rows)
    assert acc == 1.0
    # confident margins on clearly separable data
    assert all(
        abs(r["quality_prob"] - 0.5) > 0.3 for r in rows
    )


def test_held_out_generalization(spark, model):
    held = ensure_tibble(
        spark.createDataFrame(
            [
                ("careful detailed research with measured evidence", 1),
                ("free prize click buy cheap pills now", 0),
            ],
            "text string, label int",
        )
    )
    rows = quality_classifier_predict(held, model, "text").df.collect()
    by = {r["label"]: r["quality_prob"] for r in rows}
    assert by[1] > 0.8 and by[0] < 0.2


def test_matches_numpy_reference(spark):
    """The distributed gradient must equal a single-machine
    implementation of the same model on the same data — train 5 iters
    both ways and compare predictions to float tolerance."""
    rows = _corpus(n=40, seed=3)
    td = ensure_tibble(spark.createDataFrame(rows, "text string, label int"))
    buckets, n_lo, n_hi, iters, lr = 1 << 13, 1, 2, 5, 0.25
    m = quality_classifier_train(
        td, "text", "label", buckets=buckets, iters=iters, lr=lr
    )

    # numpy twin: identical features, full-batch gradient, Adam
    feats = []
    for text, y in rows:
        fv = _doc_features(text, n_lo, n_hi, buckets)
        feats.append((float(y), np.asarray(fv[0]), np.asarray(fv[1])))
    w = np.zeros(buckets)
    bias = 0.0
    m_w, v_w = np.zeros(buckets), np.zeros(buckets)
    m_b = v_b = 0.0
    b1, b2, eps = 0.9, 0.999, 1e-8
    for it in range(1, iters + 1):
        g = np.zeros(buckets)
        bg = 0.0
        for y, xi, xv in feats:
            p = 1 / (1 + math.exp(-(bias + float(w[xi] @ xv))))
            e = p - y
            np.add.at(g, xi, e * xv)
            bg += e
        g /= len(feats)
        bg /= len(feats)
        m_w = b1 * m_w + (1 - b1) * g
        v_w = b2 * v_w + (1 - b2) * g * g
        m_b = b1 * m_b + (1 - b1) * bg
        v_b = b2 * v_b + (1 - b2) * bg * bg
        w = w - lr * (m_w / (1 - b1**it)) / (np.sqrt(v_w / (1 - b2**it)) + eps)
        bias = bias - lr * (m_b / (1 - b1**it)) / (
            math.sqrt(v_b / (1 - b2**it)) + eps
        )

    assert abs(m["bias"] - bias) < 1e-6
    w_m = np.zeros(buckets)
    for b, v in m["weights"].items():
        w_m[int(b)] = v
    assert float(np.max(np.abs(w_m - w))) < 1e-6


def test_pos_label_and_null_semantics(spark, model):
    td = ensure_tibble(
        spark.createDataFrame(
            [("careful research", "keep"), ("spam spam", "drop"), (None, "keep")],
            "text string, verdict string",
        )
    )
    m = quality_classifier_train(
        ensure_tibble(
            spark.createDataFrame(
                _corpus(n=40, seed=1), "text string, label int"
            ).selectExpr(
                "text", "CASE WHEN label = 1 THEN 'keep' ELSE 'drop' END AS verdict"
            )
        ),
        "text",
        "verdict",
        pos_label="keep",
        buckets=1 << 13,
        iters=15,
    )
    rows = quality_classifier_predict(td, m, "text").df.collect()
    probs = {r["verdict"]: r["quality_prob"] for r in rows if r["text"] is not None}
    assert probs["keep"] > 0.5 and probs["drop"] < 0.5
    assert [r["quality_prob"] for r in rows if r["text"] is None] == [None]


def test_no_usable_rows_raises(spark):
    td = ensure_tibble(
        spark.createDataFrame([("", 1), (None, 0)], "text string, label int")
    )
    with pytest.raises(ValueError, match="no usable labeled rows"):
        quality_classifier_train(td, "text", "label", iters=1, buckets=64)


def test_persistence_roundtrip(spark, model, tmp_path):
    path = str(tmp_path / "qclf.json")
    quality_classifier_write(spark, model, path)
    loaded = quality_classifier_read(spark, path)
    assert loaded["bias"] == model["bias"]
    assert loaded["weights"] == model["weights"]
    with pytest.raises(ValueError, match="not a quality classifier"):
        from datar_polars_spark.scale import lang_id_train_seed, lang_id_write

        lid = str(tmp_path / "lid.json")
        lang_id_write(spark, lang_id_train_seed(spark), lid)
        quality_classifier_read(spark, lid)


def test_predict_plan_no_shuffle(spark, model, corpus):
    scored = quality_classifier_predict(corpus, model, "text")
    plan = (
        scored.df._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_predict_rejects_existing_column_and_bad_model(corpus, model):
    with pytest.raises(ValueError, match="already exists"):
        quality_classifier_predict(corpus, model, "text", out_col="text")
    with pytest.raises(ValueError, match="must be a"):
        quality_classifier_predict(corpus, {"format": "nope"}, "text")


# ---------------------------------------------------------------------------
# class weighting + evaluation


def _imbalanced(n=200, pos_frac=0.05, seed=11):
    rng = random.Random(seed)
    rows = []
    n_pos = int(n * pos_frac)
    for i in range(n):
        good = i < n_pos
        words = GOOD_WORDS if good else BAD_WORDS
        # overlap: minority docs also carry majority words, so an
        # unweighted fit profits from predicting the majority
        mix = words + (BAD_WORDS[:6] if good else [])
        rows.append((" ".join(rng.choice(mix) for _ in range(25)), int(good)))
    return rows


def test_balanced_class_weight_recovers_minority(spark):
    td = ensure_tibble(
        spark.createDataFrame(_imbalanced(), "text string, label int")
    )
    kwargs = dict(buckets=1 << 13, iters=12, lr=0.25)
    plain = quality_classifier_train(td, "text", "label", **kwargs)
    bal = quality_classifier_train(
        td, "text", "label", class_weight="balanced", **kwargs
    )
    assert bal["class_weight"] is not None and plain["class_weight"] is None
    w0, w1 = bal["class_weight"]
    assert w1 > w0  # minority positives upweighted

    def recall(model):
        rows = quality_classifier_predict(td, model, "text").df.where(
            "label = 1"
        ).collect()
        return sum(r["quality_prob"] >= 0.5 for r in rows) / len(rows)

    assert recall(bal) >= recall(plain)
    assert recall(bal) == 1.0  # separable vocab: balanced gets them all


def test_explicit_class_weight_dict_and_validation(spark, corpus):
    m = quality_classifier_train(
        corpus, "text", "label", buckets=1 << 12, iters=3,
        class_weight={0: 1.0, 1: 2.0},
    )
    assert m["class_weight"] == [1.0, 2.0]
    with pytest.raises(ValueError, match="class_weight must be"):
        quality_classifier_train(
            corpus, "text", "label", iters=1, class_weight="bogus"
        )


def test_eval_metrics_match_local_reference(spark, model, corpus):
    from datar_polars_spark.scale import quality_classifier_eval

    ev = quality_classifier_eval(corpus, model, "text", "label")
    assert ev["n"] == 160 and ev["n_pos"] == 80
    assert ev["accuracy"] == 1.0

    # local exact twin from the same predictions
    rows = quality_classifier_predict(corpus, model, "text").df.select(
        "label", "quality_prob"
    ).collect()
    ps = [(r["label"], min(max(r["quality_prob"], 1e-12), 1 - 1e-12)) for r in rows]
    ll = -sum(
        y * math.log(p) + (1 - y) * math.log(1 - p) for y, p in ps
    ) / len(ps)
    assert abs(ev["log_loss"] - ll) < 1e-6
    # exact pairwise AUC (160 rows — fine locally)
    pos = [p for y, p in ps if y == 1]
    neg = [p for y, p in ps if y == 0]
    pairs = sum(
        1.0 if pp > pn else (0.5 if pp == pn else 0.0)
        for pp in pos for pn in neg
    )
    auc_exact = pairs / (len(pos) * len(neg))
    assert abs(ev["auc"] - auc_exact) < 1.0 / ev["auc_buckets"] + 1e-9


def test_eval_degenerate_and_empty(spark, model):
    from datar_polars_spark.scale import quality_classifier_eval

    one_class = ensure_tibble(
        spark.createDataFrame(
            [("careful analysis", 1), ("measured evidence", 1)],
            "text string, label int",
        )
    )
    ev = quality_classifier_eval(one_class, model, "text", "label")
    assert ev["auc"] is None and ev["n_pos"] == ev["n"]
    empty = ensure_tibble(
        spark.createDataFrame([], "text string, label int")
    )
    with pytest.raises(ValueError, match="no usable labeled rows"):
        quality_classifier_eval(empty, model, "text", "label")


def test_early_stopping_tol(spark, corpus):
    m = quality_classifier_train(
        corpus, "text", "label", buckets=1 << 12, iters=40, tol=5e-3
    )
    # converges long before 40 full-corpus scans; tol cuts the run
    assert len(m["loss_history"]) < 40
    # and the stopped model still separates perfectly
    rows = quality_classifier_predict(corpus, m, "text").df.collect()
    assert all(
        (r["quality_prob"] >= 0.5) == (r["label"] == 1) for r in rows
    )


def test_char_analyzer_cjk_classification(spark):
    """Char-gram mode separates unsegmented CJK classes that word
    tokenization cannot (every doc is one unique token there); the
    analyzer rides in the model so predict follows automatically."""
    good = ["这篇研究论文提供了详细的证据和分析", "作者用仔细的方法检验了每个结果",
            "报告的结构清晰并且引用了大量文献", "研究方法严谨证据充分结论可靠"]
    bad = ["点击这里赢取免费大奖马上购买", "便宜药品限时折扣立即订购",
           "恭喜中奖请点击领取彩票奖金", "免费赌场奖金注册就送现金"]
    rows = [(t, 1) for t in good] * 6 + [(t, 0) for t in bad] * 6
    td = ensure_tibble(spark.createDataFrame(rows, "text string, label int"))
    m = quality_classifier_train(
        td, "text", "label", analyzer="char", n_lo=2, n_hi=3,
        buckets=1 << 13, iters=20,
    )
    assert m["analyzer"] == "char"
    held = ensure_tibble(
        spark.createDataFrame(
            [("研究提供了清晰的分析和证据", 1), ("点击购买免费彩票大奖", 0)],
            "text string, label int",
        )
    )
    probs = {
        r["label"]: r["quality_prob"]
        for r in quality_classifier_predict(held, m, "text").df.collect()
    }
    assert probs[1] > 0.6 and probs[0] < 0.4
    with pytest.raises(ValueError, match="analyzer must be"):
        quality_classifier_train(td, "text", "label", analyzer="x", iters=1)
