"""Differential locks for the r15 vectorized lang_id scoring kernel.

The kernel replaces per-gram Python slice+encode+crc32 with a byte-
matrix table CRC and a segmented W-gather. Locks: (a) the numpy CRC
table reproduces zlib.crc32 bit-for-bit on every gram the old loop
would hash (unicode, multi-byte, boundary pads included); (b) the full
predict output (labels AND confidences) matches the retired per-row
loop on adversarial docs.
"""

from __future__ import annotations

import math
import re
import zlib

import numpy as np
import pytest

from datar_polars_spark.scale.langid import (
    _PAD,
    _crc_tab,
    lang_id_predict,
    lang_id_train_seed,
)
from datar_polars_spark.tibble import Tibble

DOCS = [
    (0, "The weather was cold this morning and the streets were quiet."),
    (1, "le train est parti en retard mais nous sommes arrivés à l'heure"),
    (2, "这是一段没有空格的中文文本用来测试字符切分"),
    (3, None),
    (4, ""),
    (5, "   "),
    (6, "a"),
    (7, "123 456 789"),  # digits collapse to pads
    (8, "naïve café résumé ☃ über straße" * 5),
    (9, "Съешь же ещё этих мягких французских булок"),
]


def test_crc_table_matches_zlib():
    tab = _crc_tab()
    rng = np.random.default_rng(7)
    for blob in [b"", b"a", b"ab", "é中".encode(), _PAD.encode() * 3] + [
        bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        for n in (1, 2, 3, 7, 12)
    ]:
        crc = np.uint32(0xFFFFFFFF)
        for byte in blob:
            crc = tab[(crc ^ np.uint32(byte)) & np.uint32(0xFF)] ^ (
                crc >> np.uint32(8)
            )
        assert int(crc ^ np.uint32(0xFFFFFFFF)) == zlib.crc32(blob)


def _old_score(texts, model):
    """The retired r14 per-row loop, verbatim."""
    langs = list(model["langs"])
    buckets = int(model["buckets"])
    n_lo, n_hi = int(model["n_lo"]), int(model["n_hi"])
    weights = {
        lang: {int(b): lp for b, lp in model["weights"][lang].items()}
        for lang in langs
    }
    W = np.empty((buckets, len(langs)))
    for j, lang in enumerate(langs):
        W[:, j] = model["default_logp"][lang]
        wl = weights[lang]
        if wl:
            idx = np.fromiter(wl.keys(), dtype=np.int64, count=len(wl))
            W[idx, j] = np.fromiter(wl.values(), dtype=np.float64, count=len(wl))
    prior = np.array([model["log_prior"][lang] for lang in langs])
    pat = re.compile(r"[\s0-9]+")
    out = []
    for v in texts:
        if v is None or not str(v).strip():
            out.append((None, None))
            continue
        t = _PAD + pat.sub(_PAD, str(v).lower()) + _PAD
        hs = [
            zlib.crc32(t[i : i + n].encode("utf-8")) % buckets
            for n in range(n_lo, n_hi + 1)
            for i in range(len(t) - n + 1)
        ]
        if not hs:
            out.append((None, None))
            continue
        idx = np.fromiter(hs, dtype=np.int64, count=len(hs))
        scores = prior + W[idx].sum(axis=0)
        best = int(np.argmax(scores))
        norm = scores / len(hs)
        m = float(norm.max())
        z = float(np.exp(norm - m).sum())
        out.append((langs[best], math.exp(float(norm[best]) - m) / z))
    return out


def test_predict_matches_retired_loop(spark):
    model = lang_id_train_seed(spark)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["lang_pred"], r["lang_conf"])
        for r in lang_id_predict(Tibble(df), model, text="text")
        .df.collect()
    }
    want = dict(zip([d for d, _ in DOCS], _old_score([t for _, t in DOCS], model)))
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], (d, got[d], want[d])
        if want[d][1] is None:
            assert got[d][1] is None
        else:
            assert got[d][1] == pytest.approx(want[d][1], rel=1e-9, abs=1e-12)
