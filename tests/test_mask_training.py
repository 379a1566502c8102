"""Instance-segmentation training path: mask model + mask/dice losses through
a full train step (loss decreases), and LSJ processor pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def test_mask_train_step_loss_decreases():
    from boxer_tpu.criterion.losses import Boxer2DCriterion
    from boxer_tpu.dataset.synthetic import synthetic_batch
    from boxer_tpu.models.boxer2d import BoxeR2D
    from boxer_tpu.nn.matcher import HungarianMatcher
    from boxer_tpu.optim import build_optimizer
    from boxer_tpu.parallel.steps import create_train_state, make_train_step

    num_classes = 5
    model = BoxeR2D(
        num_classes=num_classes, hidden_dim=32, nhead=4, num_level=4,
        enc_layers=1, dec_layers=2, dim_feedforward=64, num_queries=12,
        use_mask=True,
    )
    matcher = HungarianMatcher(2, 5, 2, focal_label=True)
    criterion = Boxer2DCriterion(
        num_classes, matcher,
        {"loss_ce": 2.0, "loss_bbox": 5.0, "loss_giou": 2.0,
         "loss_mask": 5.0, "loss_dice": 5.0},
        ["boxes", "focal_labels", "masks"])

    batch_np = synthetic_batch(2, 64, 64, num_targets=4,
                               num_classes=num_classes, with_masks=True,
                               iter_per_update=1)
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)

    variables = model.init(jax.random.PRNGKey(0), batch["image"][0],
                           batch["mask"][0], train=False)
    tx, _ = build_optimizer(
        {"type": "adamw", "params": {"lr": 1e-3, "lr_backbone": 1e-4,
                                     "weight_decay": 1e-4}},
        variables["params"])
    state = create_train_state(variables["params"],
                               variables.get("constants"), tx)
    step = jax.jit(make_train_step(model, criterion, tx, max_norm=0.1))

    losses = []
    for i in range(6):
        state, stats = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(stats["total_loss"]))
        # the mask losses must be present and finite
        mask_keys = [k for k in stats if k.startswith("loss_mask")
                     or k.startswith("loss_dice")]
        assert mask_keys, sorted(stats)
        assert all(np.isfinite(float(stats[k])) for k in mask_keys)
    assert losses[-1] < losses[0], losses


def test_lsj_processor_pipeline():
    """LSJ = resize_scale(0.4-2.0 @ canvas) + fixed_size_crop: output is the
    exact canvas size with boxes clipped + masks aligned (reference
    `functional.py:22-74`)."""
    from PIL import Image

    from boxer_tpu.dataset.processor.processors import build_processor

    rng = np.random.RandomState(0)
    img = Image.fromarray((rng.rand(120, 160, 3) * 255).astype(np.uint8))
    boxes = np.array([[20, 30, 80, 90], [100, 10, 150, 100]], np.float32)
    masks = np.zeros((2, 120, 160), bool)
    masks[0, 30:90, 20:80] = True
    masks[1, 10:100, 100:150] = True
    target = {"boxes": boxes, "labels": np.array([1, 2]),
              "area": np.array([3600.0, 4500.0]),
              "iscrowd": np.array([0, 0]), "masks": masks,
              "orig_size": np.array([120, 160]), "size": np.array([120, 160]),
              "image_id": 1}

    proc = build_processor({
        "type": "compose",
        "params": {"preprocessors": [
            {"type": "resize_scale",
             "params": {"min_scale": 0.4, "max_scale": 2.0,
                        "target_height": 96, "target_width": 96}},
            {"type": "fixed_size_crop",
             "params": {"crop_height": 96, "crop_width": 96}},
            {"type": "to_tensor", "params": {}},
            {"type": "normalize",
             "params": {"mean": [0.485, 0.456, 0.406],
                        "std": [0.229, 0.224, 0.225]}},
        ]}})

    for seed in range(5):
        s, t = proc({"image": img}, dict(target), np.random.RandomState(seed))
        assert s["image"].shape == (96, 96, 3)
        if len(t["boxes"]):
            assert t["boxes"].min() >= 0.0 and t["boxes"].max() <= 1.0
            assert t["masks"].shape[1:] == (96, 96)
            assert len(t["masks"]) == len(t["boxes"])


def test_distributed_helpers_single_process():
    from boxer_tpu.parallel.distributed import (
        all_gather, broadcast_scalar, get_rank, get_world_size, is_master,
        reduce_dict, shared_random_seed)

    assert get_world_size() == 1 and get_rank() == 0 and is_master()
    assert all_gather({"a": 1}) == [{"a": 1}]
    assert broadcast_scalar(42) == 42
    assert reduce_dict({"x": 2.0}) == {"x": 2.0}
    s = shared_random_seed()
    assert 0 <= s < 2 ** 31
