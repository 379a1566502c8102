"""Benchmark: BoxeR-2D R50 single-image inference throughput on TPU.

Mirrors the reference fps harness (`tools/analyze.py:43-86`: batch 1, half
precision autocast, warm start) — here bf16 compute on one TPU chip at a
fixed COCO-eval-like resolution. Baseline: 12.5 img/s (reference README.md:61,
BASELINE.md) for BoxeR-R50.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: first compile of the full model is minutes; the
# cache makes subsequent bench runs start in seconds.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_FPS = 12.5


def main():
    from boxer_tpu.models.boxer2d import BoxeR2D

    model = BoxeR2D(
        num_classes=91,
        hidden_dim=256,
        nhead=8,
        num_level=4,
        enc_layers=6,
        dec_layers=6,
        dim_feedforward=1024,
        num_queries=300,
        use_mask=False,
        backbone_arch="resnet50",
        dtype=jnp.bfloat16,
    )

    # COCO test processor: shortest edge 800, max 1333 -> typical 800x1216
    h, w = 800, 1216
    rng = jax.random.PRNGKey(0)
    image = jax.random.normal(rng, (1, h, w, 3), jnp.float32)
    mask = jnp.zeros((1, h, w), bool)

    variables = jax.jit(
        lambda r: model.init(r, image, mask, train=False)
    )(rng)

    @jax.jit
    def infer(image, mask):
        out = model.apply(variables, image, mask, train=False, inference=True)
        return out["pred_logits"], out["pred_boxes"]

    # warmup / compile
    logits, boxes = infer(image, mask)
    jax.block_until_ready((logits, boxes))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        logits, boxes = infer(image, mask)
    jax.block_until_ready((logits, boxes))
    dt = time.perf_counter() - t0

    fps = iters / dt
    print(json.dumps({
        "metric": "boxer2d_r50_infer_fps",
        "value": round(fps, 3),
        "unit": "img/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
