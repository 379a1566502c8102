"""Jittable Hungarian solver vs scipy.optimize.linear_sum_assignment."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from boxer_tpu.nn.matcher import HungarianMatcher, hungarian


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize(
    "n,m",
    [(1, 5), (4, 10), (10, 10), (25, 60), (100, 300),
     # column-pruned fast path (NQ > 4*NT), incl. encoder-matching scale
     (10, 200), (20, 2000), (3, 50)])
def test_hungarian_matches_scipy_cost(seed, n, m):
    rng = np.random.RandomState(seed)
    cost = rng.randn(n, m).astype(np.float32) * 10

    col4row = np.asarray(hungarian(jnp.asarray(cost)[None], jnp.ones((1, n), bool)))[0]
    # assignment must be a permutation (distinct columns)
    assert len(set(col4row.tolist())) == n

    rows, cols = linear_sum_assignment(cost)
    ref_total = cost[rows, cols].sum()
    ours_total = cost[np.arange(n), col4row].sum()
    np.testing.assert_allclose(ours_total, ref_total, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("m", [40, 2000])
def test_hungarian_padded_rows(m):
    rng = np.random.RandomState(1)
    n, nv = 20, 7
    cost = rng.randn(n, m).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[:nv] = True

    col4row = np.asarray(
        hungarian(jnp.asarray(cost)[None], jnp.asarray(valid)[None])
    )[0]
    # valid sub-assignment must equal scipy on the valid rows alone
    rows, cols = linear_sum_assignment(cost[:nv])
    ref_total = cost[rows, cols].sum()
    ours_total = cost[np.arange(nv), col4row[:nv]].sum()
    np.testing.assert_allclose(ours_total, ref_total, rtol=1e-5, atol=1e-4)
    assert len(set(col4row.tolist())) == n  # still a valid permutation overall


def test_matcher_end_to_end_vs_scipy():
    """Full focal-cost matcher parity against a scipy reference pipeline."""
    rng = np.random.RandomState(0)
    b, nq, nt, ncls = 3, 50, 12, 9
    logits = rng.randn(b, nq, ncls).astype(np.float32)
    boxes = rng.rand(b, nq, 4).astype(np.float32) * 0.5 + 0.25
    tgt_labels = rng.randint(0, ncls, (b, nt))
    tgt_boxes = rng.rand(b, nt, 4).astype(np.float32) * 0.5 + 0.25
    valid = np.ones((b, nt), bool)
    valid[1, 8:] = False

    matcher = HungarianMatcher(cost_class=2, cost_bbox=5, cost_giou=2,
                               focal_label=True)
    outputs = {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)}
    targets = {
        "labels": jnp.asarray(tgt_labels),
        "boxes": jnp.asarray(tgt_boxes),
        "valid": jnp.asarray(valid),
    }
    col4row, vmask = matcher(outputs, targets)
    cost = np.asarray(matcher.cost_matrix(outputs, targets))  # (B, NQ, NT)

    for i in range(b):
        nv = int(valid[i].sum())
        rows, cols = linear_sum_assignment(cost[i][:, :nv].T)
        ref_total = cost[i][:, :nv].T[rows, cols].sum()
        ours = np.asarray(col4row[i][:nv])
        ours_total = cost[i][:, :nv].T[np.arange(nv), ours].sum()
        np.testing.assert_allclose(ours_total, ref_total, rtol=1e-4, atol=1e-3)


def test_match_layers_equals_per_layer_calls():
    """Stacked multi-layer matching (criterion/losses.py:match_layers) must
    reproduce the per-layer matcher calls exactly."""
    from boxer_tpu.criterion.losses import match_layers

    rng = np.random.RandomState(7)
    b, nq, nt, ncls, nl = 2, 40, 6, 5, 4
    targets = {
        "labels": jnp.asarray(rng.randint(0, ncls, (b, nt))),
        "boxes": jnp.asarray(rng.rand(b, nt, 4).astype(np.float32) * 0.5
                             + 0.25),
        "valid": jnp.asarray(np.array([[True] * nt,
                                       [True] * 3 + [False] * (nt - 3)])),
    }
    matcher = HungarianMatcher(cost_class=2, cost_bbox=5, cost_giou=2,
                               focal_label=True)
    layer_outputs = [
        {"pred_logits": jnp.asarray(rng.randn(b, nq, ncls).astype(np.float32)),
         "pred_boxes": jnp.asarray(rng.rand(b, nq, 4).astype(np.float32)
                                   * 0.5 + 0.25)}
        for _ in range(nl)
    ]
    qis, valids = match_layers(matcher, layer_outputs, targets)
    assert len(qis) == nl
    for i, out in enumerate(layer_outputs):
        qi_ref, valid_ref = matcher(out, targets)
        np.testing.assert_array_equal(np.asarray(qis[i]), np.asarray(qi_ref))
        np.testing.assert_array_equal(np.asarray(valids[i]),
                                      np.asarray(valid_ref))
