"""Waymo 3D pipeline end-to-end: synthetic pkl infos + npz lidar →
dataset → collate → boxer3d train step → eval formatting → offline eval."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

PC_RANGE = [-5.12, -5.12, -3.0, 5.12, 5.12, 3.0]
VOXEL_SIZE = [0.32, 0.32, 6.0]


@pytest.fixture(scope="module")
def waymo_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("waymo")
    os.makedirs(root / "lidars", exist_ok=True)
    rng = np.random.RandomState(0)
    infos = []
    for i in range(4):
        n = 4000
        pts = np.concatenate([
            rng.uniform(-5, 5, (n, 2)), rng.uniform(-2, 2, (n, 1)),
            rng.rand(n, 2),
        ], axis=1).astype(np.float32)
        path = root / "lidars" / f"frame_{i}.npz"
        np.savez(path, points=pts)
        n_gt = rng.randint(1, 5)
        boxes = np.concatenate([
            rng.uniform(-4, 4, (n_gt, 2)), rng.uniform(-1, 1, (n_gt, 1)),
            rng.uniform(0.5, 2.0, (n_gt, 3)),
            rng.uniform(-np.pi, np.pi, (n_gt, 1)),
        ], axis=1).astype(np.float32)
        infos.append({
            "token": f"seg_frame_{i}",
            "path": str(path),
            "gt_boxes": boxes,
            "gt_names": rng.choice(["VEHICLE", "PEDESTRIAN"], n_gt),
            "num_points_in_gt": rng.randint(6, 50, n_gt),
            "difficulty": np.zeros(n_gt, np.int8),
        })
    with open(root / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    return root


def _task(waymo_root, split="train"):
    from boxer_tpu.dataset.waymo import WaymoDetection

    config = {
        "nsweeps": 1,
        "normalize_angle": "sigmoid",
        "max_boxes": 10,
        "pc_range": PC_RANGE,
        "voxel_size": VOXEL_SIZE,
        "min_points": 0,
        "classes": ["VEHICLE", "PEDESTRIAN"],
        "processors": {
            ("train_processor" if split == "train" else "test_processor"): {
                "type": "compose",
                "params": {"preprocessors": [
                    {"type": "random_flip", "params": {}},
                    {"type": "global_scale",
                     "params": {"min_scale": 0.95, "max_scale": 1.05}},
                    {"type": "filter_by_range",
                     "params": {"pc_range": PC_RANGE}},
                    {"type": "voxelize", "params": {
                        "voxel_size": VOXEL_SIZE, "pc_range": PC_RANGE,
                        "max_points_per_voxel": 8, "max_voxel_num": 512}},
                    {"type": "normalize3d", "params": {
                        "pc_range": PC_RANGE, "normalize_angle": "sigmoid"}},
                ]},
            },
        },
    }
    imdb = {"root_path": str(waymo_root / "lidars"),
            "info_path": str(waymo_root / "infos.pkl"), "load_interval": 1}
    return WaymoDetection(config, split, imdb)


def test_waymo_train_step(waymo_root):
    from boxer_tpu.criterion.losses import Boxer3DCriterion
    from boxer_tpu.models.boxer3d import BoxeR3D
    from boxer_tpu.nn.matcher import HungarianMatcher3d
    from boxer_tpu.optim import build_optimizer
    from boxer_tpu.parallel.steps import (apply_model, create_train_state,
                                          make_train_step)

    task = _task(waymo_root)
    assert len(task) == 4
    rng = np.random.RandomState(0)
    items = [task.load(i, rng) for i in range(2)]
    batch = task.collate(items)
    assert batch["voxels"].shape[0] == 2 * 512
    assert batch["targets"]["boxes"].shape == (2, 10, 7)
    assert (batch["targets"]["boxes"] >= 0).all()
    assert (batch["targets"]["boxes"] <= 1).all()

    model = BoxeR3D(
        num_classes=5, hidden_dim=32, nhead=8, num_level=2,
        enc_layers=1, dec_layers=1, dim_feedforward=64, num_queries=16,
        backbone_cfg=tuple(sorted({
            "type": "pointpillar",
            "params.hidden_dim": 32,
            "params.position_encoding": "fixed",
            "params.ref_size": 4,
            "params.return_layers": 2,
            "params.reader.num_input_features": 5,
            "params.reader.num_filters": (16, 32),
            "params.reader.voxel_size": tuple(VOXEL_SIZE),
            "params.reader.pc_range": tuple(PC_RANGE),
            "params.extractor.num_input_features": 32,
            "params.neck.num_layers": (1, 1, 1),
            "params.neck.ds_strides": (1, 2, 2),
            "params.neck.ds_filters": (32, 64, 64),
        }.items())))
    grid = task.grid_shape
    static = {"grid_shape": grid, "batch_size": 2}

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["voxels"]),
        jnp.asarray(batch["coordinates"]),
        jnp.asarray(batch["num_points_per_voxel"]), grid, 2, train=False)

    matcher = HungarianMatcher3d(2, 5, 2, 4)
    criterion = Boxer3DCriterion(
        5, matcher,
        {"loss_ce": 2.0, "loss_bbox": 5.0, "loss_giou": 2.0, "loss_rad": 4.0},
        ["boxes", "focal_labels"])
    tx, _ = build_optimizer(
        {"type": "adamw", "params": {"lr": 1e-4, "weight_decay": 1e-4}},
        variables["params"])
    state = create_train_state(variables["params"],
                               variables.get("constants"), tx)
    step = jax.jit(make_train_step(model, criterion, tx, max_norm=1.0,
                                   static=static))

    device_batch = {
        "voxels": jnp.asarray(batch["voxels"])[None],
        "coordinates": jnp.asarray(batch["coordinates"])[None],
        "num_points_per_voxel": jnp.asarray(batch["num_points_per_voxel"])[None],
        "targets": jax.tree_util.tree_map(
            lambda x: jnp.asarray(x)[None], batch["targets"]),
    }
    losses = []
    for i in range(3):
        state, stats = step(state, device_batch, jax.random.PRNGKey(i))
        losses.append(float(stats["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3

    # inference + eval formatting + offline eval roundtrip
    out = apply_model(model, {"params": state.params}, {
        "voxels": device_batch["voxels"][0],
        "coordinates": device_batch["coordinates"][0],
        "num_points_per_voxel": device_batch["num_points_per_voxel"][0],
    }, train=False, inference=True, static=static)
    out_np = {k: np.asarray(v) for k, v in out.items()
              if k in ("pred_logits", "pred_boxes")}
    preds = task.format_for_evalai(out_np, batch["meta"], topk=20)
    assert len(preds) == 2
    first = next(iter(preds.values()))
    assert first["pred_boxes3d"].shape == (20, 7)
    # boxes denormalized into metric pc_range
    assert np.abs(first["pred_boxes3d"][:, 0]).max() <= 5.2

    from boxer_tpu.evaluate.waymo_eval import evaluate_results

    metrics = evaluate_results(preds)
    assert any("VEHICLE" in k or "PEDESTRIAN" in k for k in metrics)
    for v in metrics.values():
        assert 0.0 <= v <= 1.0


def test_waymo_offline_eval_perfect_predictions(waymo_root):
    """GT echoed back as predictions -> AP 1.0 per class/level present."""
    from boxer_tpu.evaluate.waymo_eval import evaluate_results

    task = _task(waymo_root, split="val")
    results = {}
    for info in task.infos:
        boxes = info["gt_boxes"][:, :7].astype(np.float32)
        labels = np.asarray(
            [{"VEHICLE": 1, "PEDESTRIAN": 2}[n] for n in info["gt_names"]])
        results[info["token"]] = {
            "pred_boxes3d": boxes,
            "pred_scores": np.ones(len(boxes), np.float32),
            "pred_labels": labels,
            "boxes3d": boxes,
            "labels": labels,
            "difficulty": np.zeros(len(boxes), np.int64),
            "num_points_in_gt": info["num_points_in_gt"],
        }
    # envelope AP mode: all scores are 1.0, so the official cutoff
    # integrator sees a single operating point and (correctly) caps the one
    # recall jump at desired_recall_delta; the envelope estimator verifies
    # the matching plumbing round-trips to AP 1.0
    metrics = evaluate_results(results, ap_mode="envelope")
    assert metrics, "no metrics computed"
    for k, v in metrics.items():
        assert v == pytest.approx(1.0, abs=1e-6), (k, v)


def test_waymo_trainer_end_to_end(waymo_root, tmp_path):
    """Full 3D trainer: config -> train 2 updates -> engine val eval (Waymo
    metrics path) -> results.pkl written."""
    import yaml

    from boxer_tpu.trainer import build_trainer
    from boxer_tpu.utils.config import Configuration

    save = str(tmp_path / "save3d")
    proc = {"type": "compose", "params": {"preprocessors": [
        {"type": "filter_by_range", "params": {"pc_range": PC_RANGE}},
        {"type": "voxelize", "params": {
            "voxel_size": VOXEL_SIZE, "pc_range": PC_RANGE,
            "max_points_per_voxel": 8, "max_voxel_num": 512}},
        {"type": "normalize3d", "params": {
            "pc_range": PC_RANGE, "normalize_angle": "sigmoid"}},
    ]}}
    cfg = {
        "training": {"batch_size": 2, "max_update": 2,
                     "checkpoint_interval": 10000,
                     "evaluation_interval": 100000, "log_interval": 1,
                     "run_type": "train_val", "save_dir": save, "seed": 1,
                     "num_workers": 1, "mixed_precision": "none",
                     "max_norm": 1.0},
        "dataset_config": {"detection3d": {
            "nsweeps": 1, "normalize_angle": "sigmoid", "max_boxes": 10,
            "pc_range": PC_RANGE, "voxel_size": VOXEL_SIZE, "min_points": 0,
            "classes": ["VEHICLE", "PEDESTRIAN"],
            "imdb_files": {
                "train": {"root_path": str(waymo_root / "lidars"),
                          "info_path": str(waymo_root / "infos.pkl"),
                          "load_interval": 1},
                "val": {"root_path": str(waymo_root / "lidars"),
                        "info_path": str(waymo_root / "infos.pkl"),
                        "load_interval": 1}},
            "processors": {"train_processor": proc,
                           "test_processor": proc}}},
        "model_config": {"boxer3d": {
            "type": "boxer3d", "hidden_dim": 32, "aux_loss": True,
            "deform_lr_multi": 0.1, "ref_size": 4,
            "loss": {"type": "boxer3d", "params": {
                "bbox_loss_coef": 5, "giou_loss_coef": 2,
                "class_loss_coef": 2, "rad_loss_coef": 4,
                "matcher": {"type": "hungarian3d", "params": {
                    "class_weight": 2, "bbox_weight": 5, "giou_weight": 2,
                    "rad_weight": 4}}}},
            "backbone": {"type": "pointpillar", "params": {
                "hidden_dim": 32, "position_encoding": "fixed",
                "ref_size": 4, "return_layers": 2,
                "reader": {"num_input_features": 5, "num_filters": [16, 32],
                           "voxel_size": VOXEL_SIZE, "pc_range": PC_RANGE},
                "extractor": {"num_input_features": 32},
                "neck": {"num_input_features": 32, "num_layers": [1, 1, 1],
                         "ds_strides": [1, 2, 2],
                         "ds_filters": [32, 64, 64]}}},
            "transformer": {"type": "box3d_transformer", "params": {
                "hidden_dim": 32, "nhead": 8, "nlevel": 2, "enc_layers": 1,
                "dec_layers": 1, "dim_feedforward": 64, "dropout": 0,
                "num_queries": 16, "ref_size": 4}}}},
        "optimizer": {"type": "adamw", "params": {
            "lr": 1.0e-4, "lr_backbone": 1.0e-4, "weight_decay": 1.0e-4}},
        "scheduler": {"type": "cosine_annealing", "params": {
            "T_max": 100, "eta_min": 1.0e-6, "use_warmup": False}},
        "distributed": {"dp": None, "mp": 1, "zero1": True},
        "task": "detection3d", "model": "boxer3d",
    }
    cfg_path = tmp_path / "cfg3d.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    trainer = build_trainer(Configuration(config_path=str(cfg_path)))
    trainer.load()
    assert trainer.num_classes == 5
    trainer.train()
    assert trainer.current_update == 2
    assert os.path.exists(os.path.join(save, "results.pkl"))


def test_waymo_grad_accum_step(waymo_root):
    """iter_per_update=2 voxel microbatch split (VERDICT r2 #6): the loader
    reshapes the fixed per-sample voxel capacity into (A, MB*MV, ...) with
    within-microbatch batch prefixes, and the scan train step consumes it.
    Reference split: `collate_fn.py:115-196`."""
    from boxer_tpu.criterion.losses import Boxer3DCriterion
    from boxer_tpu.dataset.helper.loader import DataLoader
    from boxer_tpu.models.boxer3d import BoxeR3D
    from boxer_tpu.nn.matcher import HungarianMatcher3d
    from boxer_tpu.optim import build_optimizer
    from boxer_tpu.parallel.steps import create_train_state, make_train_step

    task = _task(waymo_root)
    rng = np.random.RandomState(0)
    items = [task.load(i, rng) for i in range(2)]
    batch = task.collate(items)

    dl = DataLoader(task, sampler=None, batch_size=2, iter_per_update=2)
    split = dl._reshape_microbatches(dict(batch))
    mv = 512
    assert split["voxels"].shape[:2] == (2, mv)
    assert split["coordinates"].shape[:2] == (2, mv)
    # each microbatch's live coords are renumbered to batch index 0
    for a in range(2):
        live = split["coordinates"][a][:, 0] >= 0
        assert live.any()
        assert (split["coordinates"][a][live, 0] == 0).all()
    assert split["targets"]["boxes"].shape == (2, 1, 10, 7)

    model = BoxeR3D(
        num_classes=5, hidden_dim=32, nhead=8, num_level=2,
        enc_layers=1, dec_layers=1, dim_feedforward=64, num_queries=16,
        backbone_cfg=tuple(sorted({
            "type": "pointpillar",
            "params.hidden_dim": 32,
            "params.position_encoding": "fixed",
            "params.ref_size": 4,
            "params.return_layers": 2,
            "params.reader.num_input_features": 5,
            "params.reader.num_filters": (16, 32),
            "params.reader.voxel_size": tuple(VOXEL_SIZE),
            "params.reader.pc_range": tuple(PC_RANGE),
            "params.extractor.num_input_features": 32,
            "params.neck.num_layers": (1, 1, 1),
            "params.neck.ds_strides": (1, 2, 2),
            "params.neck.ds_filters": (32, 64, 64),
        }.items())))
    grid = task.grid_shape
    static = {"grid_shape": grid, "batch_size": 1}  # 1 sample/microbatch

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(split["voxels"][0]),
        jnp.asarray(split["coordinates"][0]),
        jnp.asarray(split["num_points_per_voxel"][0]), grid, 1, train=False)

    matcher = HungarianMatcher3d(2, 5, 2, 4)
    criterion = Boxer3DCriterion(
        5, matcher,
        {"loss_ce": 2.0, "loss_bbox": 5.0, "loss_giou": 2.0, "loss_rad": 4.0},
        ["boxes", "focal_labels"])
    tx, _ = build_optimizer(
        {"type": "adamw", "params": {"lr": 1e-4, "weight_decay": 1e-4}},
        variables["params"])
    state = create_train_state(variables["params"],
                               variables.get("constants"), tx)
    step = jax.jit(make_train_step(model, criterion, tx, max_norm=1.0,
                                   iter_per_update=2, static=static))

    device_batch = {
        "voxels": jnp.asarray(split["voxels"]),
        "coordinates": jnp.asarray(split["coordinates"]),
        "num_points_per_voxel": jnp.asarray(split["num_points_per_voxel"]),
        "targets": jax.tree_util.tree_map(jnp.asarray, split["targets"]),
    }
    for i in range(2):
        state, stats = step(state, device_batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(stats["total_loss"]))
    assert int(state.step) == 2
