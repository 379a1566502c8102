"""Training/eval hot loops.

Parity target: reference `e2edet/trainer/engine.py` — train_epoch prefetch
loop with interval-driven checkpoint/eval (:126-192), evaluate (val:
CocoEvaluator; test: result accumulation + dump, :20-123), per-interval
meters/ups/ETA reporting (:246-299). Device work is one jitted step; stats
come back as a small dict (one host sync per log interval, not per step).
"""

import json
import os
import time
from typing import Dict

import jax
import numpy as np


def train_epoch(trainer):
    loader = trainer.loaders["train"]
    log_interval = trainer.log_interval
    t_window = time.perf_counter()
    updates_in_window = 0
    pending_stats = None
    profile = trainer.logger.logger.isEnabledFor(10)  # DEBUG
    phase_times = {}

    # optional device trace: training.jax_profile = <dir> captures steps 5-8
    profile_dir = trainer.running_config.get("jax_profile")
    profiling = False

    # mid-epoch resume: skip already-consumed batches of this epoch
    # (reference `base_trainer.py:221-233` + `engine.py:148-150`; exact
    # replay works because the sampler is epoch-seeded)
    skip = getattr(trainer, "_resume_skip_batches", 0)

    for batch_idx, batch in enumerate(loader):
        if trainer.current_update >= trainer.max_update:
            break
        if batch_idx < skip:
            continue
        t_prep = time.perf_counter()
        meta = batch.pop("meta", None)
        batch.pop("grid_shape", None)
        batch.pop("batch_size", None)
        device_batch = {k: v for k, v in batch.items()}
        if profile_dir and trainer.current_update == 5 and not profiling:
            import jax as _jax

            _jax.profiler.start_trace(profile_dir)
            profiling = True
        trainer.state, stats = trainer._train_step(
            trainer.state, device_batch, trainer.next_rng())
        if profile_dir and trainer.current_update == 8 and profiling:
            import jax as _jax

            _jax.block_until_ready(stats["total_loss"])
            _jax.profiler.stop_trace()
            profiling = False
            trainer.logger.info(f"Wrote device trace to {profile_dir}")
        if profile:
            import jax as _jax

            _jax.block_until_ready(stats["total_loss"])
            phase_times["step"] = time.perf_counter() - t_prep
            trainer.logger.debug(
                f"Step time: {phase_times['step']*1e3:.1f} ms")
        pending_stats = stats
        trainer.current_update += 1
        updates_in_window += 1

        if trainer.current_update % log_interval == 0:
            _update_info(trainer, pending_stats, updates_in_window,
                         time.perf_counter() - t_window)
            # reconcile with the in-graph NaN-skip counter (reference skips
            # its update counter on non-finite grads, `engine.py:238-242`);
            # reading state.step here costs nothing extra — _update_info just
            # synced the stats, so the device pipeline is already drained
            device_step = int(trainer.state.step)
            if device_step != trainer.current_update:
                trainer.logger.info(
                    f"{trainer.current_update - device_step} update(s) "
                    "skipped on non-finite gradients; aligning counter")
                trainer.current_update = device_step
            t_window = time.perf_counter()
            updates_in_window = 0

        if (trainer.checkpoint_interval
                and trainer.current_update % trainer.checkpoint_interval == 0):
            trainer.checkpoint.save(
                trainer.state, trainer.current_update,
                extra={"epoch": trainer.current_epoch,
                       "update": trainer.current_update})
            trainer.logger.info(
                f"Checkpoint saved @ update {trainer.current_update}")

        if (trainer.evaluation_interval and "val" in trainer.loaders
                and trainer.current_update % trainer.evaluation_interval == 0):
            evaluate("val", trainer)

        if trainer.current_update >= trainer.max_update:
            break
    trainer._resume_skip_batches = 0


def _update_info(trainer, stats, updates, window_s):
    host_stats = {k: float(v) for k, v in stats.items()
                  if np.ndim(v) == 0}
    trainer.meter.update(host_stats)
    ups = updates / max(window_s, 1e-9)
    eta = trainer.calculate_time_left(updates, window_s)
    trainer.logger.info(
        f"update {trainer.current_update}/{trainer.max_update} "
        f"loss={host_stats.get('total_loss', float('nan')):.4f} "
        f"grad_norm={host_stats.get('grad_norm', float('nan')):.3f} "
        f"ups={ups:.2f} eta={eta}")
    if trainer.writer is not None:
        trainer.writer.add_scalars(host_stats, trainer.current_update)


def evaluate(split: str, trainer):
    """val: streaming COCO eval (2D) or accumulated Waymo metrics (3D);
    test: accumulate + dump results (reference `engine.py:20-123`)."""
    loader = trainer.loaders.get(split)
    if loader is None:
        return None
    dataset = trainer.datasets[split]
    is_test = split == "test"
    if not hasattr(dataset, "coco"):
        return _evaluate_3d(split, trainer, loader, dataset, is_test)

    from boxer_tpu.evaluate.coco_eval import CocoEvaluator

    iou_types = ["bbox"]
    if getattr(dataset, "use_mask", False):
        iou_types.append("segm")
    evaluator = None if is_test else CocoEvaluator(dataset.coco, iou_types)
    accumulated = {}

    t0 = time.perf_counter()
    n_batches = 0
    for batch in loader:
        meta = batch.pop("meta", None)
        batch.pop("grid_shape", None)
        batch.pop("batch_size", None)
        squeezed = _squeeze_microbatch(batch)
        if is_test:
            out = trainer._inference_step(trainer.state, squeezed)
        else:
            out, _ = trainer._eval_step(trainer.state, squeezed)
        out_np = jax.tree_util.tree_map(np.asarray, _strip_aux(out))
        # one postprocessing pass serves both iou types: the bbox records
        # just drop the rles (the mask paste is the expensive part)
        preds = dataset.format_for_evalai(
            out_np, meta, return_rles=("segm" in iou_types))
        n_batches += 1

        if is_test:
            accumulated.update(preds)
        else:
            records = {}
            records["bbox"] = dataset.prepare_for_evaluation(
                _drop_rles(preds))
            if "segm" in iou_types:
                records["segm"] = dataset.prepare_for_evaluation(preds)
            evaluator.update(records, [m["image_id"] for m in meta])

    dt = time.perf_counter() - t0
    trainer.logger.info(f"{split} eval: {n_batches} batches in {dt:.1f}s")

    if is_test:
        out_path = os.path.join(trainer.save_dir, "test_result.json")
        records = dataset.prepare_for_evaluation(accumulated)
        if jax.process_index() == 0:
            with open(out_path, "w") as f:
                json.dump(records, f)
        trainer.logger.info(f"Wrote {out_path}")
        return out_path

    evaluator.synchronize_between_processes()
    stats = evaluator.accumulate_and_summarize()
    for k, v in stats.items():
        trainer.logger.info(f"{split} {k}: AP={v[0]:.4f} AP50={v[1]:.4f} "
                            f"AP75={v[2]:.4f}")
        if trainer.writer is not None:
            trainer.writer.add_scalars(
                {f"{split}/{k}_AP": float(v[0])}, trainer.current_update)
    return stats


def _evaluate_3d(split, trainer, loader, dataset, is_test):
    """3D (Waymo) eval: accumulate predictions, dump results.pkl, and (val)
    run the self-contained offline metrics."""
    accumulated = {}
    for batch in loader:
        meta = batch.pop("meta", None)
        batch.pop("grid_shape", None)
        batch.pop("batch_size", None)
        squeezed = _squeeze_microbatch(batch)
        out = trainer._inference_step(trainer.state, squeezed)
        out_np = jax.tree_util.tree_map(np.asarray, _strip_aux(out))
        accumulated.update(dataset.format_for_evalai(out_np, meta))

    path = dataset.prepare_for_evaluation(accumulated, trainer.save_dir)
    trainer.logger.info(f"{split}: wrote {path}")
    if is_test:
        return path

    from boxer_tpu.evaluate.waymo_eval import evaluate_results

    metrics = evaluate_results(accumulated)
    for k, v in sorted(metrics.items()):
        trainer.logger.info(f"{split} {k}: {v:.4f}")
        if trainer.writer is not None:
            trainer.writer.add_scalars({f"{split}/{k}": v},
                                       trainer.current_update)
    return metrics


def _squeeze_microbatch(batch):
    """Eval loaders keep iter_per_update=1; drop the leading microbatch dim."""

    def squeeze(x):
        return x[0] if hasattr(x, "ndim") and x.ndim > 0 else x

    out = {}
    for k, v in batch.items():
        if isinstance(v, dict):
            out[k] = {kk: squeeze(vv) for kk, vv in v.items()}
        else:
            out[k] = squeeze(v)
    return out


def _strip_aux(out):
    return {k: v for k, v in out.items()
            if k not in ("aux_outputs", "enc_outputs")}


def _drop_rles(preds):
    return {k: {kk: vv for kk, vv in v.items() if kk not in ("rles", "masks")}
            for k, v in preds.items()}
