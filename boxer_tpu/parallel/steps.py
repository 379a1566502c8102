"""SPMD train / eval steps.

The single jitted `train_step` is the TPU-native equivalent of the
reference's engine hot loop (`trainer/engine.py:146-242`): forward +
criterion (matching on-device), backward, grad clip, NaN-skip, optimizer
update — one XLA program, gradients all-reduced over the ``dp`` mesh axis
implicitly by sharding propagation (replaces DDP hooks), optimizer state
sharded dp-wise (replaces OSS/ZeRO-1).

Gradient accumulation (`iter_per_update`, reference `collate_fn.py:93-111` +
`engine.py:153-169`) is a `lax.scan` over a leading microbatch dim with a
shared global num_boxes, matching the reference's shared normalizer.
"""

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from boxer_tpu.criterion.losses import weighted_total
from boxer_tpu.optim import clip_by_global_norm


class TrainState(NamedTuple):
    step: jnp.ndarray          # int32 scalar — completed updates
    params: Any
    constants: Any             # FrozenBN statistics etc. (non-trainable)
    opt_state: Any


def apply_model(model, variables, batch, train: bool, inference: bool,
                rngs=None, static=None):
    """Uniform model invocation over the two batch families:
    2D (image/mask) and 3D (voxels/coordinates/...).

    `static`: dict of trace-time constants for the 3D path
    ({"grid_shape": (nx, ny), "batch_size": B}) — these must NOT ride the
    traced batch pytree (shapes must stay static under jit)."""
    if "voxels" in batch:
        static = static or {}
        grid_shape = tuple(static.get("grid_shape")
                           or batch["grid_shape"])
        batch_size = int(static.get("batch_size")
                         or batch["batch_size"])
        return model.apply(
            variables, batch["voxels"], batch["coordinates"],
            batch["num_points_per_voxel"], grid_shape, batch_size,
            train=train, inference=inference, rngs=rngs)
    return model.apply(variables, batch["image"], batch.get("mask"),
                       train=train, inference=inference, rngs=rngs)


def create_train_state(params, constants, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        constants=constants,
        opt_state=tx.init(params),
    )


def make_train_step(
    model,
    criterion,
    tx,
    max_norm: float = 0.0,
    iter_per_update: int = 1,
    compute_dtype=jnp.float32,
    static=None,
    metrics=None,
    debug_grads: bool = False,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, stats).

    batch = {"image": (A, B, H, W, 3), "mask": (A, B, H, W) or None,
             "targets": {labels (A,B,NT), boxes (A,B,NT,4), valid (A,B,NT),
                          [instance_masks]}}
    where A = iter_per_update microbatches (A=1 common case).
    """
    weight_dict = criterion.expanded_weight_dict(num_aux=16, num_enc=2)

    def microbatch_loss(params, constants, mb, num_boxes, rng):
        variables = {"params": params}
        if constants is not None:
            variables["constants"] = constants
        out = apply_model(model, variables, mb, train=True, inference=False,
                          rngs={"dropout": rng}, static=static)
        losses = criterion(out, mb["targets"], num_boxes=num_boxes)
        total, stats = weighted_total(losses, weight_dict)
        if metrics:
            from boxer_tpu.criterion.metrics import compute_metrics

            final = {k: v for k, v in out.items()
                     if k not in ("aux_outputs", "enc_outputs")}
            stats = dict(stats)
            stats.update(compute_metrics(metrics, final, mb["targets"],
                                         losses))
        return total, stats

    grad_fn = jax.value_and_grad(microbatch_loss, has_aux=True)

    def train_step(state: TrainState, batch, rng):
        targets = batch["targets"]
        # global num_boxes over the full update (all microbatches, all devices)
        num_boxes = jnp.clip(
            targets["valid"].astype(jnp.float32).sum(), 1.0, None
        )

        a = targets["valid"].shape[0]  # microbatches
        rngs = jax.random.split(rng, a)

        def one_micro(carry, xs):
            grads_acc, loss_acc, stats_acc = carry
            mb, mrng = xs
            (loss, stats), grads = grad_fn(
                state.params, state.constants, mb, num_boxes, mrng)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            loss_acc = loss_acc + loss
            stats_acc = jax.tree_util.tree_map(jnp.add, stats_acc, stats)
            return (grads_acc, loss_acc, stats_acc), None

        if a == 1:
            mb = jax.tree_util.tree_map(lambda x: x[0], batch)
            (loss, stats), grads = grad_fn(
                state.params, state.constants, mb, num_boxes, rngs[0])
        else:
            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p), state.params)
            # trace one microbatch to get stats structure
            mb0 = jax.tree_util.tree_map(lambda x: x[0], batch)
            (l0, s0), g0 = grad_fn(
                state.params, state.constants, mb0, num_boxes, rngs[0])
            rest = jax.tree_util.tree_map(lambda x: x[1:], batch)
            (grads, loss, stats), _ = jax.lax.scan(
                one_micro, (g0, l0, s0), (rest, rngs[1:]))

        raw_grads = grads if debug_grads else None
        grads, grad_norm = clip_by_global_norm(grads, max_norm)

        # NaN/Inf-skip parity (reference `engine.py:224-242`)
        ok = jnp.isfinite(grad_norm)
        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, new_opt_state = tx.update(
            safe_grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        def keep_old(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, old)

        new_params = keep_old(new_params, state.params)
        new_opt_state = keep_old(new_opt_state, state.opt_state)

        new_state = TrainState(
            step=state.step + ok.astype(jnp.int32),
            params=new_params,
            constants=state.constants,
            opt_state=new_opt_state,
        )
        stats = dict(stats)
        stats["total_loss"] = loss
        stats["grad_norm"] = grad_norm
        stats["num_boxes"] = num_boxes
        stats["skipped"] = (~ok).astype(jnp.float32)
        if debug_grads:
            # pre-clip accumulated grads: the sharded==unsharded equivalence
            # checks compare these directly — AdamW's step-1 update is
            # magnitude-invariant, so a wrong dp psum normalization is
            # visible only here, not in the updated params
            stats["_grads"] = raw_grads
        return new_state, stats

    return train_step


def make_eval_step(model, criterion=None, static=None) -> Callable:
    """eval_step(state, batch) -> (outputs, losses|None). Runs the model in
    val mode (full aux outputs, no dropout)."""

    def eval_step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.constants is not None:
            variables["constants"] = state.constants
        out = apply_model(model, variables, batch, train=False,
                          inference=False, static=static)
        losses = None
        if criterion is not None and "targets" in batch:
            losses = criterion(out, batch["targets"])
            losses = {k: v for k, v in losses.items() if not k.startswith("_")}
        return out, losses

    return eval_step


def make_inference_step(model, static=None) -> Callable:
    """inference_step(state, batch) -> outputs (test-mode topology)."""

    def inference_step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.constants is not None:
            variables["constants"] = state.constants
        return apply_model(model, variables, batch, train=False,
                           inference=True, static=static)

    return inference_step
