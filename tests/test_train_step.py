"""Train-step smoke tests: loss decreases, NaN-skip works, multi-device
sharded step compiles and runs on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boxer_tpu.criterion.losses import Boxer2DCriterion
from boxer_tpu.dataset.synthetic import synthetic_batch
from boxer_tpu.models.boxer2d import BoxeR2D
from boxer_tpu.nn.matcher import HungarianMatcher
from boxer_tpu.optim import build_optimizer, build_schedule
from boxer_tpu.parallel.steps import TrainState, create_train_state, make_train_step

pytestmark = pytest.mark.slow

WEIGHTS = {"loss_ce": 2.0, "loss_bbox": 5.0, "loss_giou": 2.0}


def _tiny_setup(num_classes=7, batch=2, hw=64, use_mask=False):
    model = BoxeR2D(
        num_classes=num_classes, hidden_dim=32, nhead=4, num_level=4,
        enc_layers=1, dec_layers=2, dim_feedforward=64, num_queries=16,
        use_mask=use_mask,
    )
    matcher = HungarianMatcher(2, 5, 2, focal_label=True)
    losses = ["boxes", "focal_labels"] + (["masks"] if use_mask else [])
    wd = dict(WEIGHTS)
    if use_mask:
        wd.update({"loss_mask": 1.0, "loss_dice": 1.0})
    criterion = Boxer2DCriterion(num_classes, matcher, wd, losses)

    batch_np = synthetic_batch(batch, hw, hw, num_targets=6,
                               num_classes=num_classes, with_masks=use_mask,
                               iter_per_update=1)
    image = jnp.asarray(batch_np["image"][0])
    mask = jnp.asarray(batch_np["mask"][0])
    variables = model.init(jax.random.PRNGKey(0), image, mask, train=False)
    params = variables["params"]
    constants = variables.get("constants")

    schedule = build_schedule(
        {"type": "multi_step",
         "params": {"lr_steps": [1000], "lr_ratio": 0.1, "use_warmup": False}},
        base_lr=1e-3,
    )
    tx, _ = build_optimizer(
        {"type": "adamw", "params": {"lr": 1e-3, "lr_backbone": 1e-4,
                                     "weight_decay": 1e-4}},
        params, schedule)
    state = create_train_state(params, constants, tx)
    step_fn = make_train_step(model, criterion, tx, max_norm=0.1)
    return model, criterion, state, step_fn, batch_np


def test_train_step_loss_decreases():
    _, _, state, step_fn, batch_np = _tiny_setup()
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
    step_jit = jax.jit(step_fn)

    losses = []
    rng = jax.random.PRNGKey(42)
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, stats = step_jit(state, batch, sub)
        losses.append(float(stats["total_loss"]))
        assert np.isfinite(losses[-1])
    assert int(state.step) == 8
    # overfitting a fixed batch must reduce the loss
    assert losses[-1] < losses[0], losses


def test_train_step_nan_skip():
    _, _, state, step_fn, batch_np = _tiny_setup()
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
    # poison the image to produce NaN loss/grads
    batch["image"] = batch["image"].at[0, 0, 0, 0].set(jnp.nan)
    step_jit = jax.jit(step_fn)
    old_params = state.params
    state, stats = step_jit(state, batch, jax.random.PRNGKey(0))
    assert float(stats["skipped"]) == 1.0
    assert int(state.step) == 0
    # params unchanged
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), old_params, state.params)
    assert max(jax.tree_util.tree_leaves(diff)) == 0.0


def test_train_step_sharded_8dev():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from boxer_tpu.parallel.mesh import create_mesh
    from boxer_tpu.parallel.sharding import (
        batch_sharding, optimizer_state_shardings, param_shardings)

    assert len(jax.devices()) == 8
    mesh = create_mesh(dp=4, mp=2)

    _, _, state, step_fn, batch_np = _tiny_setup(batch=4)
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)

    p_sh = param_shardings(mesh, state.params)
    c_sh = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), state.constants)
    o_sh = optimizer_state_shardings(mesh, state.opt_state, zero1=True)
    state_sh = TrainState(
        step=NamedSharding(mesh, P()), params=p_sh, constants=c_sh,
        opt_state=o_sh)

    state = jax.device_put(state, state_sh)
    b_sh = batch_sharding(mesh)
    batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(None, "dp"))), batch)

    step_jit = jax.jit(step_fn, out_shardings=(state_sh, None))
    state, stats = step_jit(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(stats["total_loss"]))
    assert int(state.step) == 1
