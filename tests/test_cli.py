"""CLI surface: tools/run.py end-to-end as a subprocess on synthetic COCO."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cli_coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_coco")
    os.makedirs(root / "images", exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for img_id in range(1, 5):
        h, w = 96, 128
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            root / "images" / f"{img_id}.jpg")
        images.append({"id": img_id, "height": h, "width": w,
                       "file_name": f"{img_id}.jpg"})
        annotations.append({
            "id": img_id, "image_id": img_id, "category_id": 1,
            "bbox": [10.0, 10.0, 40.0, 40.0], "area": 1600.0, "iscrowd": 0})
    anno = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "a"}]}
    with open(root / "anno.json", "w") as f:
        json.dump(anno, f)
    return root


def test_run_cli(cli_coco_root, tmp_path):
    cfg = f"""
training:
    batch_size: 2
    max_update: 2
    checkpoint_interval: 1000
    evaluation_interval: 1000
    log_interval: 1
    run_type: train
    save_dir: {tmp_path}/save
    seed: 3
    num_workers: 1
    mixed_precision: none
dataset_config:
    detection:
        use_mask: false
        max_boxes: 4
        canvas_size: [96, 128]
        imdb_files:
            train:
                anno_file: {cli_coco_root}/anno.json
                image_folder: {cli_coco_root}/images
        processors:
            image_train_processor:
                type: compose
                params:
                    preprocessors:
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
        aux_loss: false
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
                    params: {{class_weight: 2, bbox_weight: 5, giou_weight: 2, focal_label: true}}
        backbone:
            type: resnet50
            params:
                pretrained: false
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
                dec_layers: 1
                dim_feedforward: 64
                dropout: 0
                num_queries: 8
                use_mask: false
                ref_size: 4
                residual_mode: v1
optimizer:
    type: adamw
    params: {{lr: 1.0e-4, lr_backbone: 1.0e-5, weight_decay: 1.0e-4}}
scheduler:
    type: multi_step
    params: {{lr_steps: [1000], lr_ratio: 0.1, use_warmup: false, mode: iter}}
"""
    cfg_path = tmp_path / "cli.yaml"
    cfg_path.write_text(cfg)

    env = dict(os.environ)
    env.update({"JAX_PLATFORM_NAME": "cpu", "JAX_PLATFORMS": "cpu"})
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run.py"),
         "--config", str(cfg_path), "--task", "detection",
         "--model", "boxer2d", "training.log_interval=1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=560)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert os.path.exists(tmp_path / "save" / "config.yaml")
    assert os.path.exists(tmp_path / "save" / "model_final")
