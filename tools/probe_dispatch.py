"""Probe: where do the ~6 ms wall-vs-device go on the det train step?

Measures, on chip:
  1. per-call HOST dispatch time of the compiled train step (no blocking) —
     the tunnel/arg-marshalling cost that wall-clock timing adds on top of
     device module time;
  2. wall time of K back-to-back steps with a single block at the end
     (the engine's steady-state pattern) vs K * device module time;
  3. the same step driven as an in-graph lax.scan over K pre-staged batches
     (pure device throughput, zero per-step host work) — the upper bound a
     deeper prefetch pipeline could reach.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(iters=16):
    from tools.mfu_bench import _model
    from boxer_tpu.criterion.losses import Boxer2DCriterion
    from boxer_tpu.dataset.synthetic import synthetic_batch
    from boxer_tpu.nn.matcher import HungarianMatcher
    from boxer_tpu.optim import build_optimizer, build_schedule
    from boxer_tpu.parallel.steps import create_train_state, make_train_step

    model = _model(False)
    matcher = HungarianMatcher(2, 5, 2, focal_label=True)
    criterion = Boxer2DCriterion(
        91, matcher,
        {"loss_ce": 2.0, "loss_bbox": 5.0, "loss_giou": 2.0},
        ["boxes", "focal_labels"])
    batch = jax.tree_util.tree_map(jnp.asarray, synthetic_batch(
        1, 800, 1216, num_targets=20, num_classes=91))
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch["image"][0][:1], batch["mask"][0][:1],
        train=False))()
    schedule = build_schedule(
        {"type": "multi_step", "params": {"lr_steps": [10 ** 9],
                                          "lr_ratio": 0.1,
                                          "use_warmup": False}},
        base_lr=2e-4)
    tx, _ = build_optimizer(
        {"type": "adamw", "params": {"lr": 2e-4, "lr_backbone": 2e-5,
                                     "weight_decay": 1e-4}},
        variables["params"], schedule)
    state = create_train_state(variables["params"],
                               variables.get("constants"), tx)
    step = jax.jit(make_train_step(model, criterion, tx, max_norm=0.1),
                   donate_argnums=(0,))
    rng = jax.random.PRNGKey(7)
    compiled = step.lower(state, batch, rng).compile()

    state, stats = compiled(state, batch, rng)
    jax.block_until_ready(stats["total_loss"])

    # 1. host dispatch time per call (async returns)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, stats = compiled(state, batch, rng)
        ts.append(time.perf_counter() - t0)
    jax.block_until_ready(stats["total_loss"])
    ts_ms = sorted(t * 1e3 for t in ts)
    print(f"host dispatch per call: median {ts_ms[len(ts_ms)//2]:.2f} ms, "
          f"min {ts_ms[0]:.2f}, max {ts_ms[-1]:.2f}")

    # 2. steady-state wall per step
    t0 = time.perf_counter()
    for _ in range(iters):
        state, stats = compiled(state, batch, rng)
    jax.block_until_ready(stats["total_loss"])
    wall = (time.perf_counter() - t0) / iters * 1e3
    print(f"steady-state wall per step: {wall:.1f} ms")

    # 3. in-graph scan over K steps (pure device throughput)
    from functools import partial
    raw_step = make_train_step(model, criterion, tx, max_norm=0.1)

    @partial(jax.jit, donate_argnums=(0,))
    def scan_steps(state, batch, rng, k=8):
        def body(carry, i):
            st, _ = carry
            st2, stats = raw_step(st, batch, jax.random.fold_in(rng, i))
            return (st2, stats["total_loss"]), None
        (st, loss), _ = jax.lax.scan(body, (state, jnp.float32(0.0)),
                                     jnp.arange(8))
        return st, loss

    state2, loss = scan_steps(state, batch, rng)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    state2, loss = scan_steps(state2, batch, rng)
    jax.block_until_ready(loss)
    scan_ms = (time.perf_counter() - t0) / 8 * 1e3
    print(f"in-graph 8-step scan: {scan_ms:.1f} ms/step")


if __name__ == "__main__":
    from boxer_tpu.utils.chip_lock import chip_lock

    with chip_lock():
        main()
