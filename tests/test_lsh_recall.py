"""Analytic LSH recall calculators (scale/dedup.py): closed forms,
edge/validation behavior, and a Monte-Carlo cross-check against an
actual MinHash banding simulation."""

import math
import random

import pytest

from datar_polars_spark.scale import hyperplane_recall, minhash_recall


def test_minhash_recall_closed_form():
    assert minhash_recall(1.0, 32, 2) == 1.0
    assert minhash_recall(0.0, 32, 2) == 0.0
    # the documented default-config figure: j>=0.8 under 32x2
    assert 1.0 - minhash_recall(0.8, 32, 2) == pytest.approx(
        (1 - 0.8**2) ** 32, rel=1e-9
    )
    assert minhash_recall(0.8, 32, 2) > 1 - 1e-13
    # monotone in j, b; anti-monotone in r
    assert minhash_recall(0.6, 16, 2) < minhash_recall(0.8, 16, 2)
    assert minhash_recall(0.5, 8, 2) < minhash_recall(0.5, 16, 2)
    assert minhash_recall(0.5, 16, 4) < minhash_recall(0.5, 16, 2)


def test_hyperplane_recall_closed_form():
    assert hyperplane_recall(1.0, 32, 8) == 1.0
    # per-plane agreement at cosine 0 is exactly 1/2
    assert hyperplane_recall(0.0, 1, 1) == pytest.approx(0.5)
    # the documented embedding_join default: 0.95 cosine under 32x8
    miss = 1.0 - hyperplane_recall(0.95, 32, 8)
    p = 1 - math.acos(0.95) / math.pi
    assert miss == pytest.approx((1 - p**8) ** 32, rel=1e-9)
    assert miss < 1e-7
    # low-cosine pairs still surface as candidates at a meaningful
    # rate (~19% at cosine 0.1 under 32x8) — exactly why the exact
    # cosine verify after candidate generation is not optional
    assert 0.1 < hyperplane_recall(0.1, 32, 8) < 0.3


def test_validation():
    with pytest.raises(ValueError, match="jaccard"):
        minhash_recall(1.5, 32, 2)
    with pytest.raises(ValueError, match=">= 1"):
        minhash_recall(0.5, 0, 2)
    with pytest.raises(ValueError, match="cosine"):
        hyperplane_recall(2.0, 32, 8)
    with pytest.raises(ValueError, match=">= 1"):
        hyperplane_recall(0.5, 32, 0)


def test_minhash_monte_carlo_crosscheck():
    """Simulate real banding: two sets with known Jaccard j, num_perm
    independent min-hashes, banded b x r — the empirical candidate
    rate must match the analytic curve within MC noise."""
    rng = random.Random(7)
    j, b, r = 0.5, 8, 2
    # |A∩B| = 50, |A∪B| = 100 -> j = 0.5
    union = list(range(100))
    a = set(range(75))           # 75 elems
    bb = set(range(25, 100))     # 75 elems, intersection 50 -> j=0.5
    assert len(a & bb) / len(a | bb) == j
    trials, hits = 400, 0
    for _ in range(trials):
        sigs_a, sigs_b = [], []
        for _p in range(b * r):
            # a TRUE random permutation of the universe (min-wise
            # independent by construction; Python's builtin hash has
            # measurable structural bias on small ints)
            perm = rng.sample(range(100), 100)
            sigs_a.append(min(perm[x] for x in a))
            sigs_b.append(min(perm[x] for x in bb))
        for band in range(b):
            s = slice(band * r, (band + 1) * r)
            if sigs_a[s] == sigs_b[s]:
                hits += 1
                break
    want = minhash_recall(j, b, r)
    got = hits / trials
    # binomial std at p~0.9, n=400 is ~0.015; allow 4 sigma
    assert abs(got - want) < 0.07, (got, want)
