"""MFU and batch-scaling benchmark (VERDICT r2 #2).

Measures, on the real chip, BoxeR-2D R50 at 800x1216 bf16:
  - inference img/s at bs=1 and bs=4 (detection and instance-seg),
  - train-step time and img/s at bs=1 / 4 / 16 (reference recipe's global
    batch 16, `base_boxer2d_detection.yaml:145-168`),
  - model FLOPs from XLA cost analysis (`tools/analyze.py` approach) and
    MFU = FLOPs / time / peak (v5e bf16 peak 197 TFLOP/s).

Writes a markdown table to stdout (paste into docs/TPU_PERFORMANCE.md).

Usage: python tools/mfu_bench.py [--quick] [--segm-train]
"""

import argparse
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

PEAK_BF16 = 197e12  # TPU v5e per-chip

# Measured floor rates (docs/TPU_PERFORMANCE.md "The sampling roofline"):
# the XLA:TPU vectorized gather emitter is fetch-count-bound at ~1.27 ns per
# fetched quad row (order/packing/table-size independent), and the Pallas
# d_value scatter sits at its VMEM accumulate-chain floor of ~6 ns/tap.
GATHER_NS_PER_ROW = 1.27
SCATTER_NS_PER_TAP = 6.0


def sampling_floor_ms(h, w, *, train, use_mask, flops=float("nan"),
                      enc_layers=6, dec_layers=6, nhead=8, nlevel=4,
                      ntap=4, nq=300, inst_k=14, bs=1):
    """Analytic fetch/chain floor for one BoxeR-2D step (VERDICT r4 #8).

    floor = gather rows x emitter rate + (train) d_w recompute gathers +
    d_value scatter taps x chain rate + model FLOPs / MXU peak. Every term
    is a measured rate times a semantically-required count, so
    floor_util = floor/measured is a stable regression signal where raw MFU
    (~2%) reads as noise on this gather-bound model.
    """
    import math

    sizes = [(math.ceil(h / s), math.ceil(w / s)) for s in (8, 16, 32, 64)]
    s_tokens = sum(a * b for a, b in sizes)
    enc_rows = s_tokens * nhead * nlevel * ntap        # per encoder layer
    if use_mask:
        # segm decoder: InstanceAttention (k*k taps) in EVERY layer
        # (reference box_transformer.py:383)
        dec_rows = nq * nhead * nlevel * inst_k * inst_k
    else:
        dec_rows = nq * nhead * nlevel * ntap
    rows = bs * (enc_layers * enc_rows + dec_layers * dec_rows)
    floor_s = rows * GATHER_NS_PER_ROW * 1e-9
    if train:
        floor_s += rows * GATHER_NS_PER_ROW * 1e-9     # d_w recompute take
        floor_s += rows * SCATTER_NS_PER_TAP * 1e-9    # d_value accumulate
    if flops == flops:
        floor_s += flops / PEAK_BF16
    return floor_s * 1e3


def _model(use_mask):
    from boxer_tpu.models.boxer2d import BoxeR2D

    return BoxeR2D(num_classes=91, hidden_dim=256, nhead=8, num_level=4,
                   enc_layers=6, dec_layers=6, dim_feedforward=1024,
                   num_queries=300, use_mask=use_mask,
                   backbone_arch="resnet50", dtype=jnp.bfloat16)


def _flops(compiled):
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", float("nan"))) if cost else float("nan")


def measure_infer(use_mask, bs, h=800, w=1216, iters=20):
    # Mirrors bench.py's honest harness: ALL model outputs are consumed and
    # post-processing (top-100 + box rescale + mask paste/rescoring) runs in
    # the loop — fetching only pred_boxes lets XLA dead-code-eliminate the
    # whole mask head and understates segm cost.
    from boxer_tpu.evaluate.postprocess import coco_postprocess

    model = _model(use_mask)
    rng = jax.random.PRNGKey(0)
    image = jax.random.normal(rng, (bs, h, w, 3), jnp.float32)
    mask = jnp.zeros((bs, h, w), bool)
    variables = jax.jit(lambda r: model.init(r, image[:1], mask[:1],
                                             train=False))(rng)

    opts = ({"xla_tpu_scoped_vmem_limit_kib": "65536"}
            if jax.default_backend() == "tpu" else None)

    def _infer(i, m):
        if use_mask:
            return model.apply(variables, i, m, train=False, inference=True,
                               postprocess={"canvas_hw": (h, w), "topk": 100})
        out = model.apply(variables, i, m, train=False, inference=True)
        return coco_postprocess(
            out["pred_logits"], out["pred_boxes"], None,
            canvas_hw=(h, w), topk=100)

    fn = jax.jit(_infer, compiler_options=opts)
    compiled = fn.lower(image, mask).compile()
    flops = _flops(compiled)
    out = compiled(image, mask)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(image, mask)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    floor = sampling_floor_ms(h, w, train=False, use_mask=use_mask,
                              flops=flops, bs=bs)
    return {"ms": dt * 1e3, "img_s": bs / dt, "flops": flops,
            "mfu": flops / dt / PEAK_BF16,
            "floor_util": floor / (dt * 1e3)}


def measure_train(use_mask, bs, h=800, w=1216, iters=8, iter_per_update=1):
    """bs = GLOBAL batch per update; iter_per_update > 1 splits it into
    microbatches via the in-graph lax.scan accumulation
    (`parallel/steps.py`), matching the reference recipe semantics
    (`collate_fn.py:93-111`, `engine.py:153-169`)."""
    from boxer_tpu.criterion.losses import Boxer2DCriterion
    from boxer_tpu.dataset.synthetic import synthetic_batch
    from boxer_tpu.nn.matcher import HungarianMatcher
    from boxer_tpu.optim import build_optimizer, build_schedule
    from boxer_tpu.parallel.steps import create_train_state, make_train_step

    model = _model(use_mask)
    matcher = HungarianMatcher(2, 5, 2, focal_label=True)
    wd = {"loss_ce": 2.0, "loss_bbox": 5.0, "loss_giou": 2.0}
    losses = ["boxes", "focal_labels"]
    if use_mask:
        wd.update({"loss_mask": 5.0, "loss_dice": 5.0})
        losses.append("masks")
    criterion = Boxer2DCriterion(91, matcher, wd, losses)

    batch_np = synthetic_batch(bs, h, w, num_targets=20, num_classes=91,
                               with_masks=use_mask,
                               iter_per_update=iter_per_update)
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch["image"][0][:1], batch["mask"][0][:1],
        train=False))()

    schedule = build_schedule(
        {"type": "multi_step",
         "params": {"lr_steps": [10 ** 9], "lr_ratio": 0.1,
                    "use_warmup": False}}, base_lr=2e-4)
    tx, _ = build_optimizer(
        {"type": "adamw", "params": {"lr": 2e-4, "lr_backbone": 2e-5,
                                     "weight_decay": 1e-4}},
        variables["params"], schedule)
    state = create_train_state(variables["params"],
                               variables.get("constants"), tx)
    step = jax.jit(make_train_step(model, criterion, tx, max_norm=0.1),
                   donate_argnums=(0,))
    rng = jax.random.PRNGKey(7)
    # bs>=8 train: the backward scatter's Pallas staging exceeds the 16 MiB
    # default scoped-VMEM (measured 19.14M at bs=8 global-16 accum); raise
    # the limit like the inference tools do (profile_mask.py)
    opts = ({"xla_tpu_scoped_vmem_limit_kib": "65536"}
            if jax.default_backend() == "tpu" and bs >= 8 else None)
    compiled = step.lower(state, batch, rng).compile(compiler_options=opts)
    flops = _flops(compiled)
    state, stats = compiled(state, batch, rng)
    jax.block_until_ready(stats["total_loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, stats = compiled(state, batch, rng)
    jax.block_until_ready(stats["total_loss"])
    dt = (time.perf_counter() - t0) / iters
    floor = sampling_floor_ms(h, w, train=True, use_mask=use_mask,
                              flops=flops, bs=bs)
    return {"ms": dt * 1e3, "img_s": bs / dt, "flops": flops,
            "mfu": flops / dt / PEAK_BF16,
            "floor_util": floor / (dt * 1e3)}


def measure_boxer3d(bs=1, max_voxels=32000, iters=20):
    """BoxeR-3D inference at the reference Waymo shape (VERDICT r4 #9):
    pc_range +-75 m / 0.32 m voxels -> 468x468 BEV grid, train-processor
    voxel budget 32k (`base_boxer3d_detection.yaml:27-66,100-146`)."""
    import numpy as np

    from boxer_tpu.models.boxer3d import BoxeR3D

    nx = ny = 468
    model = BoxeR3D(
        num_classes=2, hidden_dim=256, nhead=8, num_level=2,
        enc_layers=2, dec_layers=2, dim_feedforward=1024, num_queries=300,
        dtype=jnp.bfloat16,
        backbone_cfg=tuple(sorted({
            "type": "pointpillar",
            "params.hidden_dim": 256,
            "params.position_encoding": "fixed",
            "params.ref_size": 4,
            "params.return_layers": 2,
            "params.reader.num_input_features": 5,
            "params.reader.num_filters": (64, 128),
            "params.reader.voxel_size": (0.32, 0.32, 8.0),
            "params.reader.pc_range": (-75.0, -75.0, -3.0, 75.0, 75.0, 5.0),
            "params.extractor.num_input_features": 128,
            "params.neck.num_layers": (2, 4, 2),
            "params.neck.ds_strides": (1, 2, 2),
            "params.neck.ds_filters": (256, 512, 1024),
        }.items())))

    rng = np.random.RandomState(0)
    v, p, f = max_voxels * bs, 20, 5
    voxels = rng.randn(v, p, f).astype(np.float32)
    coords = np.stack([
        rng.randint(0, bs, v), np.zeros(v, np.int64),
        rng.randint(0, ny, v), rng.randint(0, nx, v)], 1).astype(np.int32)
    num_pts = rng.randint(1, p + 1, v).astype(np.int32)
    args = (jnp.asarray(voxels), jnp.asarray(coords), jnp.asarray(num_pts))

    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), *args, (nx, ny), bs, train=False))()
    fn = jax.jit(lambda *a: model.apply(
        variables, *a, (nx, ny), bs, train=False, inference=True))
    compiled = fn.lower(*args).compile()
    flops = _flops(compiled)
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"ms": dt * 1e3, "img_s": bs / dt, "flops": flops,
            "mfu": flops / dt / PEAK_BF16, "floor_util": float("nan")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip bs=16 train and segm train")
    ap.add_argument("--segm-train", action="store_true")
    args = ap.parse_args()

    rows = []

    def add(name, fn, *a):
        try:
            r = fn(*a)
        except Exception as e:  # noqa: BLE001 — e.g. HBM OOM at bs=16
            print(f"| {name} | FAILED: {str(e)[:80]} |", flush=True)
            return
        rows.append((name, r))
        fu = r.get("floor_util", float("nan"))
        fu_s = f"{fu*100:.0f}%" if fu == fu else "-"
        print(f"| {name} | {r['ms']:.1f} | {r['img_s']:.2f} | "
              f"{r['flops']/1e9:.0f} | {r['mfu']*100:.1f}% | {fu_s} |",
              flush=True)

    print("| measurement | ms/step | img/s | GFLOP/step | MFU | floor util |")
    print("|---|---|---|---|---|---|")
    add("infer segm bs=1", measure_infer, True, 1)
    add("infer segm bs=4", measure_infer, True, 4)
    add("infer det bs=1", measure_infer, False, 1)
    add("infer det bs=4", measure_infer, False, 4)
    add("train det bs=1", measure_train, False, 1)
    add("train det bs=4", measure_train, False, 4)
    if not args.quick:
        # reference recipe is GLOBAL batch 16 (8 GPUs x bs2,
        # `base_boxer2d_detection.yaml:145-168`); bs=16 flat exceeds one
        # chip's 16G HBM (measured 21.0G program), so the single-chip recipe
        # path is bs8 x iter_per_update=2 grad accumulation
        add("train det bs=8", measure_train, False, 8)
        add("train det global16 (bs8 x2 accum)",
            lambda: measure_train(False, 16, iters=4, iter_per_update=2))
        if rows and rows[-1][0].startswith("train det global16"):
            upd_s = rows[-1][1]["ms"] / 1e3
            # 3x schedule = 270k updates (reference
            # `COCO-Detection/boxer2d_R_50_3x.yaml:4-17`)
            print(f"| -> 3x schedule (270k updates @ global 16): "
                  f"{270_000 * upd_s / 3600:.1f} h on 1 chip; "
                  f"~{270_000 * upd_s / 3600 / 8:.1f} h on 8 chips (dp8, "
                  f"bs2/chip, linear-dp projection) |")
        add("train segm bs=1", measure_train, True, 1)
        add("train segm bs=4", measure_train, True, 4)
        add("train segm global4 (bs2 x2 accum)",
            lambda: measure_train(True, 4, iters=4, iter_per_update=2))
        add("infer boxer3d waymo (468^2, 32k voxels)", measure_boxer3d)


if __name__ == "__main__":
    from boxer_tpu.utils.chip_lock import chip_lock

    with chip_lock():
        main()
