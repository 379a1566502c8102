"""Profile the full BoxeR-2D R50 train step on the real chip (bs=1, 800x1216).

Usage: python tools/profile_train.py [mask] [trace]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(use_mask=False, trace=True, trace_dir="/tmp/train_trace",
         h=800, w=1216, bs=1):
    from boxer_tpu.criterion.losses import Boxer2DCriterion
    from boxer_tpu.dataset.synthetic import synthetic_batch
    from boxer_tpu.models.boxer2d import BoxeR2D
    from boxer_tpu.nn.matcher import HungarianMatcher
    from boxer_tpu.optim import build_optimizer, build_schedule
    from boxer_tpu.parallel.steps import create_train_state, make_train_step

    model = BoxeR2D(
        num_classes=91, hidden_dim=256, nhead=8, num_level=4,
        enc_layers=6, dec_layers=6, dim_feedforward=1024, num_queries=300,
        use_mask=use_mask, backbone_arch="resnet50", dtype=jnp.bfloat16)

    matcher = HungarianMatcher(2, 5, 2, focal_label=True)
    wd = {"loss_ce": 2.0, "loss_bbox": 5.0, "loss_giou": 2.0}
    losses = ["boxes", "focal_labels"]
    if use_mask:
        wd.update({"loss_mask": 5.0, "loss_dice": 5.0})
        losses.append("masks")
    criterion = Boxer2DCriterion(91, matcher, wd, losses)

    batch_np = synthetic_batch(bs, h, w, num_targets=20, num_classes=91,
                               with_masks=use_mask, iter_per_update=1)
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)

    image = batch["image"][0]
    mask = batch["mask"][0]
    t0 = time.perf_counter()
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), image, mask, train=False))()
    jax.block_until_ready(variables)
    print(f"init: {time.perf_counter()-t0:.1f}s")

    schedule = build_schedule(
        {"type": "multi_step",
         "params": {"lr_steps": [10**9], "lr_ratio": 0.1,
                    "use_warmup": False}}, base_lr=2e-4)
    tx, _ = build_optimizer(
        {"type": "adamw", "params": {"lr": 2e-4, "lr_backbone": 2e-5,
                                     "weight_decay": 1e-4}},
        variables["params"], schedule)
    state = create_train_state(variables["params"],
                               variables.get("constants"), tx)
    step_fn = jax.jit(make_train_step(model, criterion, tx, max_norm=0.1))

    rng = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    state, stats = step_fn(state, batch, rng)
    jax.block_until_ready(state)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s "
          f"loss={float(stats['total_loss']):.3f}")

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, stats = step_fn(state, batch, rng)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters
    print(f"train step: {dt*1e3:.1f} ms (use_mask={use_mask}, bs={bs})")

    if trace:
        from tools.trace_utils import aggregate_trace

        os.makedirs(trace_dir, exist_ok=True)
        n = 3
        with jax.profiler.trace(trace_dir):
            for _ in range(n):
                state, stats = step_fn(state, batch, rng)
            jax.block_until_ready(state)
        aggregate_trace(trace_dir, n)


if __name__ == "__main__":
    from boxer_tpu.utils.chip_lock import chip_lock

    with chip_lock():
        main(use_mask="mask" in sys.argv[1:],
             trace="notrace" not in sys.argv[1:])
