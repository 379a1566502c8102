"""End-to-end learning-signal test: overfit a tiny BoxeR-2D on 4 synthetic
images with bright-rectangle objects; the full stack (data -> augmentation ->
model -> on-device matcher -> losses -> optimizer -> COCO eval) must reach a
high train-set AP. (Validation run reached AP=1.0 at 150 steps.)"""

import json
import os

import numpy as np
import pytest
import yaml
from PIL import Image

pytestmark = pytest.mark.slow


def test_overfit_reaches_ap(tmp_path):
    root = tmp_path / "data"
    os.makedirs(root / "images", exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, 5):
        h, w = 96, 96
        arr = np.zeros((h, w, 3), np.uint8) + 40
        boxes = []
        for _ in range(2):
            x, y = rng.randint(0, 50), rng.randint(0, 50)
            bw, bh = rng.randint(20, 40), rng.randint(20, 40)
            x2, y2 = min(x + bw, w), min(y + bh, h)
            arr[y:y2, x:x2] = rng.randint(150, 255, 3)
            boxes.append([float(x), float(y), float(x2 - x), float(y2 - y)])
        Image.fromarray(arr).save(root / "images" / f"{img_id}.jpg")
        images.append({"id": img_id, "height": h, "width": w,
                       "file_name": f"{img_id}.jpg"})
        for b in boxes:
            annotations.append({"id": ann_id, "image_id": img_id,
                                "category_id": 1, "bbox": b,
                                "area": b[2] * b[3], "iscrowd": 0})
            ann_id += 1
    with open(root / "anno.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "obj"}]}, f)

    save = str(tmp_path / "save")
    proc = {"type": "compose", "params": {"preprocessors": [
        {"type": "to_tensor", "params": {}},
        {"type": "normalize", "params": {"mean": [0.485, 0.456, 0.406],
                                         "std": [0.229, 0.224, 0.225]}}]}}
    cfg = {
        "training": {"batch_size": 4, "max_update": 150,
                     "checkpoint_interval": 100000,
                     "evaluation_interval": 1000000, "log_interval": 50,
                     "run_type": "train_val", "save_dir": save, "seed": 5,
                     "num_workers": 1, "mixed_precision": "none",
                     "max_norm": 0.1},
        "dataset_config": {"detection": {
            "use_mask": False, "max_boxes": 6, "canvas_size": [96, 96],
            "imdb_files": {
                "train": {"anno_file": str(root / "anno.json"),
                          "image_folder": str(root / "images")},
                "val": {"anno_file": str(root / "anno.json"),
                        "image_folder": str(root / "images")}},
            "processors": {"image_train_processor": proc,
                           "image_test_processor": proc}}},
        "model_config": {"boxer2d": {
            "type": "boxer2d", "hidden_dim": 64, "aux_loss": True,
            "deform_lr_multi": 0.1, "use_mask": False, "ref_size": 4,
            "loss": {"type": "boxer2d", "params": {
                "bbox_loss_coef": 5, "giou_loss_coef": 2,
                "class_loss_coef": 2, "use_mask": False,
                "matcher": {"type": "hungarian", "params": {
                    "class_weight": 2, "bbox_weight": 5, "giou_weight": 2,
                    "focal_label": True}}}},
            "backbone": {"type": "resnet50", "params": {
                "pretrained": False, "position_encoding": "fixed_box",
                "return_interm_layers": ["layer2", "layer3", "layer4"],
                "hidden_dim": 64, "ref_size": 4}},
            "transformer": {"type": "box_transformer", "params": {
                "hidden_dim": 64, "nhead": 4, "nlevel": 4, "enc_layers": 2,
                "dec_layers": 2, "dim_feedforward": 128, "dropout": 0,
                "num_queries": 12, "use_mask": False, "ref_size": 4,
                "residual_mode": "v1"}}}},
        "optimizer": {"type": "adamw", "params": {
            "lr": 5.0e-4, "lr_backbone": 5.0e-4, "weight_decay": 1.0e-4}},
        "scheduler": {"type": "multi_step", "params": {
            "lr_steps": [100000], "lr_ratio": 0.1, "use_warmup": False,
            "mode": "iter"}},
        "distributed": {"dp": None, "mp": 1, "zero1": True},
        "task": "detection", "model": "boxer2d",
    }
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from boxer_tpu.trainer import build_trainer
    from boxer_tpu.trainer.engine import evaluate, train_epoch
    from boxer_tpu.utils.config import Configuration

    trainer = build_trainer(Configuration(config_path=str(cfg_path)))
    trainer.load()
    epoch = 0
    while trainer.current_update < trainer.max_update:
        trainer.loaders["train"].sampler.set_epoch(epoch)
        train_epoch(trainer)
        epoch += 1
    stats = evaluate("val", trainer)
    ap50 = float(stats["coco_eval_bbox"][1])
    assert ap50 > 0.5, f"learning signal too weak: AP50={ap50}"
