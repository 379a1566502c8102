"""Optimizers and LR schedules (optax).

Parity targets:
- reference `e2edet/optim/__init__.py:15-86` — sgd/adamw registry with
  two-group learning rates (backbone vs transformer) and `lr_multi` on
  deformable `linear_box` parameters
- reference `e2edet/optim/scheduler/` — step / multi_step / cosine_annealing
  schedules with linear warmup (per-iter clock)
- reference `e2edet/optim/oss.py` (ZeRO-1) — realized as optimizer-state
  sharding over the data mesh axis in `boxer_tpu/parallel` instead of a
  wrapper class (the TPU-native equivalent)

Design: one optax GradientTransformation; per-group LRs via
`optax.multi_transform` over path-derived labels; schedules are pure
functions of the update step so the whole train step stays jittable.
"""

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from boxer_tpu.utils.registry import OPTIM_REGISTRY, SCHEDULER_REGISTRY


# ---------------------------------------------------------------------------
# Schedules (multiplicative factor; per-group base LR applied separately)
# ---------------------------------------------------------------------------

def _warmup_factor(step, warmup_iterations, warmup_factor):
    alpha = step / jnp.maximum(warmup_iterations, 1)
    return warmup_factor * (1.0 - alpha) + alpha


@SCHEDULER_REGISTRY.register("multi_step")
def multi_step_schedule(config) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Parity: reference `multi_step_scheduler.py:5-41`, both clocks.

    `mode: epoch` re-creates the reference's dual per-epoch clock
    (`lr_scheduler.py:108-144` `step_epoch`): decay thresholds count epochs,
    converted here from the update index via `_steps_per_epoch` (injected by
    the trainer); warmup stays on the iteration clock, matching the
    reference's `get_iter_lr` in epoch mode."""
    lr_steps = tuple(config["lr_steps"])
    lr_ratio = config["lr_ratio"]
    use_warmup = config.get("use_warmup", False)
    warmup_iterations = config.get("warmup_iterations", 0)
    wf = config.get("warmup_factor", 1.0)
    epoch_mode = config.get("mode", "iter") == "epoch"
    spe = max(1, int(config.get("_steps_per_epoch", 1)))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        clock = jnp.floor(step / spe) if epoch_mode else step
        # bisect_right semantics: decay applies AT the threshold
        # (reference `multi_step_scheduler.py:19-37`)
        n_passed = sum(jnp.where(clock >= s, 1.0, 0.0) for s in lr_steps)
        factor = lr_ratio ** n_passed
        if use_warmup and warmup_iterations > 0:
            factor = jnp.where(
                step <= warmup_iterations,
                _warmup_factor(step, warmup_iterations, wf),
                factor,
            )
        return factor

    return schedule


@SCHEDULER_REGISTRY.register("step")
def step_schedule(config):
    """Parity: reference `step_scheduler.py:5-38`, both clocks (see
    multi_step_schedule for the epoch-mode convention)."""
    step_size = config["step_size"]
    lr_ratio = config.get("lr_ratio", 0.1)
    use_warmup = config.get("use_warmup", False)
    warmup_iterations = config.get("warmup_iterations", 0)
    wf = config.get("warmup_factor", 1.0)
    epoch_mode = config.get("mode", "iter") == "epoch"
    spe = max(1, int(config.get("_steps_per_epoch", 1)))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        clock = jnp.floor(step / spe) if epoch_mode else step
        factor = lr_ratio ** jnp.floor(clock / step_size)
        if use_warmup and warmup_iterations > 0:
            factor = jnp.where(
                step <= warmup_iterations,
                _warmup_factor(step, warmup_iterations, wf),
                factor,
            )
        return factor

    return schedule


@SCHEDULER_REGISTRY.register("cosine_annealing")
def cosine_schedule(config):
    """Parity: reference `cosine_scheduler.py:7-41`. The per-group
    `eta_min` scaling (eta_min_i = lr_i/max_lr * eta_min) reduces to a shared
    *factor* floor: factor = eta_ratio + (1-eta_ratio)*cos_term where
    eta_ratio = eta_min / max_lr."""
    eta_min = config.get("eta_min", 0.0)
    t_max = config["T_max"]
    use_warmup = config.get("use_warmup", False)
    warmup_iterations = (config.get("warmup_iterations", 0) if use_warmup else 0)
    wf = config.get("warmup_factor", 1.0)
    max_lr = config["_max_base_lr"]
    eta_ratio = eta_min / max_lr if max_lr > 0 else 0.0
    t_eff = t_max - warmup_iterations

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cos_term = (1.0 + jnp.cos(
            math.pi * (step - warmup_iterations) / t_eff)) / 2.0
        factor = eta_ratio + (1.0 - eta_ratio) * cos_term
        if use_warmup and warmup_iterations > 0:
            factor = jnp.where(
                step <= warmup_iterations,
                _warmup_factor(step, warmup_iterations, wf),
                factor,
            )
        return factor

    return schedule


def build_schedule(config, base_lr: float):
    cfg = dict(config["params"]) if "params" in config else dict(config)
    cfg["_max_base_lr"] = base_lr
    return SCHEDULER_REGISTRY.get(config["type"])(cfg)


# ---------------------------------------------------------------------------
# Param grouping (backbone / transformer / deform)
# ---------------------------------------------------------------------------

def label_params(params) -> Any:
    """Path-based param groups (reference `boxer2d.py:35-50` +
    `utils/modeling.py:4-32`):
      - 'backbone'  : anything under a module path containing "backbone"
      - 'deform'    : `linear_box` parameters outside the backbone (lr_multi)
      - 'transformer': everything else
    """

    def label_one(path) -> str:
        keys = [getattr(p, "key", str(p)) for p in path]
        if any("backbone" in str(k) for k in keys):
            return "backbone"
        if any("linear_box" in str(k) for k in keys):
            return "deform"
        return "transformer"

    return jax.tree_util.tree_map_with_path(lambda p, _: label_one(p), params)


def build_optimizer(config, params, schedule: Optional[Callable] = None):
    """Build the optax chain. `config` is the reference optimizer node:
    {type: adamw|sgd, params: {lr, lr_backbone, weight_decay, ...,
     deform_lr_multi via model config}}.

    Returns (tx, labels). Clip-norm handling (max_norm) lives in the train
    step (reference `engine.py:224-242`: skip update on non-finite norm).
    """
    opt_type = config["type"]
    p = config["params"]
    lr = p["lr"]
    lr_backbone = p.get("lr_backbone", lr)
    deform_lr_multi = p.get("deform_lr_multi", 1.0)
    weight_decay = p.get("weight_decay", 1e-4)
    if schedule is None:
        schedule = lambda step: jnp.asarray(1.0)

    def scaled(base):
        def lr_fn(step):
            return base * schedule(step)

        if opt_type == "adamw":
            return optax.adamw(
                learning_rate=lr_fn,
                b1=p.get("betas", (0.9, 0.999))[0],
                b2=p.get("betas", (0.9, 0.999))[1],
                eps=p.get("eps", 1e-8),
                weight_decay=weight_decay,
            )
        if opt_type == "sgd":
            return optax.sgd(
                learning_rate=lr_fn,
                momentum=p.get("momentum", 0.9),
                nesterov=p.get("nesterov", False),
            )
        raise ValueError(f"Unsupported optimizer: {opt_type}")

    labels = label_params(params)
    tx = optax.multi_transform(
        {
            "backbone": scaled(lr_backbone),
            "transformer": scaled(lr),
            "deform": scaled(lr * deform_lr_multi),
        },
        labels,
    )
    return tx, labels


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                        for l in leaves))


def clip_by_global_norm(tree, max_norm: float):
    """Returns (clipped_tree, norm). max_norm <= 0 disables clipping
    (reference `optimizer.py:60-74`)."""
    norm = global_norm(tree)
    if max_norm is None or max_norm <= 0:
        return tree, norm
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda l: l * scale, tree), norm
