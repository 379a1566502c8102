"""End-to-end trainer test on a synthetic on-disk COCO dataset:
config → build_trainer → load → short train → val eval → checkpoint/resume.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_coco")
    img_dir = root / "images"
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(1)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, 9):
        h, w = 96, 128
        Image.fromarray(
            (rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            img_dir / f"{img_id}.jpg")
        images.append({"id": img_id, "height": h, "width": w,
                       "file_name": f"{img_id}.jpg"})
        for _ in range(2):
            x, y = float(rng.randint(0, 60)), float(rng.randint(0, 40))
            bw, bh = float(rng.randint(20, 50)), float(rng.randint(20, 40))
            annotations.append({
                "id": ann_id, "image_id": img_id,
                "category_id": int(rng.choice([1, 2])),
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1
    anno = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]}
    for split in ("train", "val"):
        with open(root / f"{split}.json", "w") as f:
            json.dump(anno, f)
    return root


def _write_config(root, tmp_path, save_dir):
    cfg = f"""
training:
    batch_size: 2
    max_update: 3
    checkpoint_interval: 3
    evaluation_interval: 1000000
    log_interval: 1
    max_norm: 0.1
    run_type: train_val
    save_dir: {save_dir}
    seed: 7
    num_workers: 1
    mixed_precision: none

dataset_config:
    detection:
        use_mask: false
        max_boxes: 8
        canvas_size: [128, 128]
        imdb_files:
            train:
                anno_file: {root}/train.json
                image_folder: {root}/images
            val:
                anno_file: {root}/val.json
                image_folder: {root}/images
        processors:
            image_train_processor:
                type: compose
                params:
                    preprocessors:
                        - type: random_horizontal_flip
                          params: {{prob: 0.5}}
                        - type: random_resize
                          params: {{min_size: 96, max_size: 128}}
                        - type: to_tensor
                          params: {{}}
                        - type: normalize
                          params:
                              mean: [0.485, 0.456, 0.406]
                              std: [0.229, 0.224, 0.225]
            image_test_processor:
                type: compose
                params:
                    preprocessors:
                        - type: random_resize
                          params: {{min_size: 96, max_size: 128}}
                        - type: to_tensor
                          params: {{}}
                        - type: normalize
                          params:
                              mean: [0.485, 0.456, 0.406]
                              std: [0.229, 0.224, 0.225]

model_config:
    boxer2d:
        type: boxer2d
        hidden_dim: 32
        aux_loss: true
        deform_lr_multi: 0.1
        use_mask: false
        ref_size: 4
        loss:
            type: boxer2d
            params:
                bbox_loss_coef: 5
                giou_loss_coef: 2
                class_loss_coef: 2
                use_mask: false
                matcher:
                    type: hungarian
                    params:
                        class_weight: 2
                        bbox_weight: 5
                        giou_weight: 2
                        focal_label: true
        backbone:
            type: resnet50
            params:
                pretrained: false
                pretrained_path: null
                position_encoding: fixed_box
                return_interm_layers: [layer2, layer3, layer4]
                hidden_dim: 32
                ref_size: 4
        transformer:
            type: box_transformer
            params:
                hidden_dim: 32
                nhead: 4
                nlevel: 4
                enc_layers: 1
                dec_layers: 2
                dim_feedforward: 64
                dropout: 0
                num_queries: 12
                use_mask: false
                ref_size: 4
                residual_mode: v1

optimizer:
    type: adamw
    params:
        lr: 1.0e-4
        lr_backbone: 1.0e-5
        weight_decay: 1.0e-4

scheduler:
    type: multi_step
    params:
        use_warmup: false
        lr_steps: [1000]
        lr_ratio: 0.1
        mode: iter

distributed:
    dp: null
    mp: 1
    zero1: true
"""
    path = tmp_path / "exp.yaml"
    path.write_text(cfg)
    return str(path)


def test_trainer_end_to_end(tiny_coco_root, tmp_path):
    from boxer_tpu.trainer import build_trainer
    from boxer_tpu.utils.config import Configuration

    save_dir = str(tmp_path / "save")
    cfg_path = _write_config(tiny_coco_root, tmp_path, save_dir)
    configuration = Configuration(
        config_path=cfg_path,
        extra={"task": "detection", "model": "boxer2d"})
    trainer = build_trainer(configuration)
    trainer.load()
    assert trainer.num_classes == 2
    trainer.train()
    assert trainer.current_update == 3

    # checkpoint written + final export
    assert trainer.checkpoint.latest_step() == 3
    assert os.path.exists(os.path.join(save_dir, "model_final"))
    assert os.path.exists(os.path.join(save_dir, "config.yaml"))

    # resume path: fresh trainer restores update counter
    configuration2 = Configuration(
        config_path=cfg_path,
        opts=["training.resume=true", "training.max_update=4"],
        extra={"task": "detection", "model": "boxer2d"})
    trainer2 = build_trainer(configuration2)
    trainer2.load()
    assert trainer2.current_update == 3


def test_trainer_sp2_loads_and_trains(tiny_coco_root, tmp_path):
    """Regression: `expect_sequence_parallel(True)` used to be declared
    BEFORE model init, whose jit traces outside the mesh context — every
    sp>1 trainer crashed at startup with the strict seq_constraint error.
    The declaration now happens after init; steps stay mesh-wrapped."""
    from boxer_tpu.parallel import sharding
    from boxer_tpu.trainer import build_trainer
    from boxer_tpu.utils.config import Configuration

    save_dir = str(tmp_path / "save_sp2")
    cfg_path = _write_config(tiny_coco_root, tmp_path, save_dir)
    configuration = Configuration(
        config_path=cfg_path,
        opts=["distributed.sp=2", "training.max_update=1",
              "training.checkpoint_interval=1000"],
        extra={"task": "detection", "model": "boxer2d"})
    trainer = build_trainer(configuration)
    try:
        trainer.load()          # <- crashed here before the fix
        assert trainer.seq_shard
        trainer.train()
        assert trainer.current_update == 1
    finally:
        sharding.expect_sequence_parallel(False)
