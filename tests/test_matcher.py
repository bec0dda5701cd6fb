"""Matcher capability tests vs scipy."""

import numpy as np
from scipy.optimize import linear_sum_assignment

from reftr_tpu.models.matcher import (
    hungarian_match,
    match_cost,
    one_to_all_match,
)


def random_boxes(rng, n):
    c = rng.uniform(0.2, 0.8, size=(n, 2))
    wh = rng.uniform(0.05, 0.3, size=(n, 2))
    return np.concatenate([c, wh], axis=1).astype(np.float32)


def test_hungarian_vs_scipy(rng):
    pred = random_boxes(rng, 8)
    tgt = random_boxes(rng, 5)
    cost = np.asarray(match_cost(pred, tgt))
    rows, cols = hungarian_match(cost)
    srows, scols = linear_sum_assignment(cost)
    np.testing.assert_allclose(
        cost[rows, cols].sum(), cost[srows, scols].sum(), rtol=1e-6)
    assert len(set(zip(rows.tolist(), cols.tolist()))) == 5


def test_match_cost_prefers_identical_box(rng):
    tgt = random_boxes(rng, 1)
    pred = np.concatenate([random_boxes(rng, 4), tgt], axis=0)
    cost = np.asarray(match_cost(pred, tgt))
    rows, cols = hungarian_match(cost)
    assert rows[0] == 4  # the identical box wins


def test_one_to_all_topk(rng):
    cost = np.array([[3.0], [1.0], [2.0], [0.5]])
    idx = one_to_all_match(cost, topk=2)
    np.testing.assert_array_equal(idx, [3, 1])


def test_match_cost_with_class(rng):
    pred = random_boxes(rng, 6)
    tgt = random_boxes(rng, 3)
    logits = rng.normal(size=(6, 4)).astype(np.float32)
    ids = np.array([0, 2, 1])
    cost = np.asarray(match_cost(pred, tgt, logits, ids))
    assert cost.shape == (6, 3)
    assert np.isfinite(cost).all()
