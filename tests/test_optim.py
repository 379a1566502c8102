"""Schedules (warmup/multi-step/cosine), param grouping, DETR criterion."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_multi_step_schedule():
    from boxer_tpu.optim import build_schedule

    sched = build_schedule(
        {"type": "multi_step",
         "params": {"lr_steps": [100, 200], "lr_ratio": 0.1,
                    "use_warmup": True, "warmup_iterations": 10,
                    "warmup_factor": 0.001}},
        base_lr=1e-3)
    # warmup: linear from warmup_factor to 1
    assert float(sched(0)) == pytest.approx(0.001)
    assert float(sched(5)) == pytest.approx(0.001 * 0.5 + 0.5, rel=1e-3)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(50)) == pytest.approx(1.0)
    assert float(sched(150)) == pytest.approx(0.1)
    assert float(sched(250)) == pytest.approx(0.01)


def test_multi_step_schedule_epoch_mode():
    """Epoch-clock parity (reference `lr_scheduler.py:108-144` step_epoch):
    decay thresholds count epochs; warmup stays on the iter clock."""
    from boxer_tpu.optim import build_schedule

    sched = build_schedule(
        {"type": "multi_step",
         "params": {"lr_steps": [2, 4], "lr_ratio": 0.1, "mode": "epoch",
                    "_steps_per_epoch": 50, "use_warmup": True,
                    "warmup_iterations": 10, "warmup_factor": 0.001}},
        base_lr=1e-3)
    assert float(sched(0)) == pytest.approx(0.001)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(99)) == pytest.approx(1.0)    # epoch 1
    assert float(sched(149)) == pytest.approx(0.1)   # epoch 2 (> 2? no: 2 not >2)
    assert float(sched(249)) == pytest.approx(0.01)  # epoch 4
    sched_it = build_schedule(
        {"type": "step",
         "params": {"step_size": 3, "lr_ratio": 0.1, "mode": "epoch",
                    "_steps_per_epoch": 10}},
        base_lr=1e-3)
    assert float(sched_it(29)) == pytest.approx(1.0)   # epoch 2
    assert float(sched_it(30)) == pytest.approx(0.1)   # epoch 3


def test_cosine_schedule():
    from boxer_tpu.optim import build_schedule

    sched = build_schedule(
        {"type": "cosine_annealing",
         "params": {"T_max": 1000, "eta_min": 1e-5, "use_warmup": True,
                    "warmup_iterations": 100, "warmup_factor": 0.001}},
        base_lr=1e-3)
    assert float(sched(100)) == pytest.approx(1.0, rel=1e-4)
    # midpoint of cosine: factor ~ (1 + eta_ratio) / 2
    mid = float(sched(100 + 450))
    assert 0.4 < mid < 0.6
    end = float(sched(1000))
    assert end == pytest.approx(1e-5 / 1e-3, rel=1e-2)


def test_step_schedule():
    from boxer_tpu.optim import build_schedule

    sched = build_schedule(
        {"type": "step", "params": {"step_size": 100, "lr_ratio": 0.5,
                                    "use_warmup": False}},
        base_lr=1e-3)
    assert float(sched(50)) == pytest.approx(1.0)
    assert float(sched(150)) == pytest.approx(0.5)
    assert float(sched(350)) == pytest.approx(0.125)


def test_param_labels():
    from boxer_tpu.optim import label_params

    params = {
        "backbone": {"trunk": {"conv1": {"kernel": jnp.zeros((1,))}}},
        "transformer": {
            "encoder_layers": {"self_attn": {
                "linear_box": {"kernel": jnp.zeros((1,))},
                "value_proj": {"kernel": jnp.zeros((1,))},
            }}},
    }
    labels = label_params(params)
    assert labels["backbone"]["trunk"]["conv1"]["kernel"] == "backbone"
    enc = labels["transformer"]["encoder_layers"]["self_attn"]
    assert enc["linear_box"]["kernel"] == "deform"
    assert enc["value_proj"]["kernel"] == "transformer"


def test_detr_criterion():
    from boxer_tpu.criterion.losses import DETRCriterion
    from boxer_tpu.nn.matcher import HungarianMatcher

    rng = np.random.RandomState(0)
    b, nq, nt, ncls = 2, 12, 4, 5
    outputs = {
        "pred_logits": jnp.asarray(rng.randn(b, nq, ncls + 1), jnp.float32),
        "pred_boxes": jnp.asarray(
            rng.rand(b, nq, 4) * 0.5 + 0.25, jnp.float32),
        "aux_outputs": [{
            "pred_logits": jnp.asarray(rng.randn(b, nq, ncls + 1), jnp.float32),
            "pred_boxes": jnp.asarray(
                rng.rand(b, nq, 4) * 0.5 + 0.25, jnp.float32),
        }],
    }
    targets = {
        "labels": jnp.asarray(rng.randint(0, ncls, (b, nt)), jnp.int32),
        "boxes": jnp.asarray(rng.rand(b, nt, 4) * 0.5 + 0.25, jnp.float32),
        "valid": jnp.ones((b, nt), bool),
    }
    crit = DETRCriterion(
        ncls, HungarianMatcher(1, 5, 2, focal_label=False),
        {"loss_ce": 1.0, "loss_bbox": 5.0, "loss_giou": 2.0},
        ["boxes", "labels"], eos_coef=0.1)
    losses = crit(outputs, targets)
    for k in ("loss_ce", "loss_bbox", "loss_giou",
              "loss_ce_0", "loss_bbox_0", "loss_giou_0"):
        assert k in losses, sorted(losses)
        assert np.isfinite(float(losses[k]))
    # perfect predictions drive box losses to ~0
    perfect = dict(outputs)
    logits = np.full((b, nq, ncls + 1), -8.0, np.float32)
    boxes = np.full((b, nq, 4), 0.5, np.float32)
    for i in range(b):
        for t in range(nt):
            logits[i, t, int(targets["labels"][i, t])] = 8.0
            boxes[i, t] = np.asarray(targets["boxes"][i, t])
    logits[..., ncls] += 4.0  # background for unmatched
    for i in range(b):
        for t in range(nt):
            logits[i, t, ncls] = -8.0
    perfect = {"pred_logits": jnp.asarray(logits),
               "pred_boxes": jnp.asarray(boxes)}
    losses_p = crit(perfect, targets)
    assert float(losses_p["loss_bbox"]) < 1e-4
    assert float(losses_p["loss_ce"]) < 0.05
