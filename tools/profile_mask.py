"""Profile BoxeR-2D use_mask inference on the real chip; aggregate trace ops."""
import functools
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(use_mask=True, trace_dir="/tmp/mask_trace", h=800, w=1216, bs=1,
         postproc=False):
    from boxer_tpu.models.boxer2d import BoxeR2D

    model = BoxeR2D(
        num_classes=91, hidden_dim=256, nhead=8, num_level=4,
        enc_layers=6, dec_layers=6, dim_feedforward=1024, num_queries=300,
        use_mask=use_mask, backbone_arch="resnet50", dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    image = jax.random.normal(rng, (bs, h, w, 3), jnp.float32)
    mask = jnp.zeros((bs, h, w), bool)
    variables = jax.jit(
        lambda r: model.init(r, image[:1], mask[:1], train=False))(rng)

    opts = ({"xla_tpu_scoped_vmem_limit_kib": "65536"}
            if jax.default_backend() == "tpu" else None)

    @functools.partial(jax.jit, compiler_options=opts)
    def infer(image, mask):
        if postproc and use_mask:
            return model.apply(variables, image, mask, train=False,
                               inference=True,
                               postprocess={"canvas_hw": (h, w), "topk": 100})
        out = model.apply(variables, image, mask, train=False, inference=True)
        if postproc:
            from boxer_tpu.evaluate.postprocess import coco_postprocess

            return coco_postprocess(
                out["pred_logits"], out["pred_boxes"],
                out.get("pred_masks") if use_mask else None,
                canvas_hw=(h, w), topk=100)
        if use_mask:
            return out["pred_logits"], out["pred_boxes"], out["pred_masks"]
        return out["pred_logits"], out["pred_boxes"]

    out = infer(image, mask)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(image, mask)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"use_mask={use_mask}: {iters/dt:.2f} img/s ({dt/iters*1e3:.1f} ms/img)")

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = infer(image, mask)
        jax.block_until_ready(out)

    # aggregate
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    paths.sort(key=os.path.getmtime)
    if not paths:
        print("no trace found")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        pid_name = ev.get("pid")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        # keep only device-side XLA ops (heuristic: ones with args.long_name or kernel-ish names)
        args = ev.get("args", {})
        if "run_id" in args or "correlation_id" in args or True:
            key = name.split(".")[0]
            agg[key] += dur
            cnt[key] += 1
            total += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    print(f"-- top ops by total time (3 iters), total {total:.1f} ms --")
    for name, ms in top:
        print(f"{ms/3:9.3f} ms/iter  x{cnt[name]:5d}  {name[:90]}")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="mask")
    ap.add_argument("--hw", default="800x1216")
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--postproc", action="store_true")
    a = ap.parse_args()
    h, w = [int(v) for v in a.hw.split("x")]
    from boxer_tpu.utils.chip_lock import chip_lock

    with chip_lock():
        main(use_mask=a.mode != "nomask", h=h, w=w, bs=a.bs,
             postproc=a.postproc)
