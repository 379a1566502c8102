"""Inference visualization (replaces the reference's demo notebook
`tools/visualization/BoxeR_2d_segmentation.ipynb`).

Runs a trained BoxeR-2D on an image (or a random tensor when no image is
given), draws predicted boxes (+ masks when the model has them) and writes a
PNG.

Usage:
  python tools/visualize.py --config <yaml> --model boxer2d \
      [--weights <save_dir>/model_final] [--image photo.jpg] [--out viz.png]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--task", type=str, default="detection")
    parser.add_argument("--model", type=str, default="boxer2d")
    parser.add_argument("--weights", type=str, default=None,
                        help="orbax weights-only export (model_final)")
    parser.add_argument("--image", type=str, default=None)
    parser.add_argument("--out", type=str, default="viz.png")
    parser.add_argument("--num-classes", type=int, default=91)
    parser.add_argument("--threshold", type=float, default=0.4)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from boxer_tpu.models import build_model
    from boxer_tpu.utils.config import Configuration
    from boxer_tpu.utils.visualization import draw_boxes, draw_masks

    configuration = Configuration(
        config_path=args.config, opts=args.opts,
        extra={"task": args.task, "model": args.model})
    config = configuration.get_config()
    model_cfg = config.model_config[args.model]
    model = build_model(model_cfg, args.num_classes, dtype=jnp.bfloat16)

    if args.image:
        pil = Image.open(args.image).convert("RGB")
        w, h = pil.size
        scale = 800 / min(w, h)
        if max(w, h) * scale > 1333:
            scale = 1333 / max(w, h)
        pil = pil.resize((int(w * scale), int(h * scale)), Image.BILINEAR)
        raw = np.asarray(pil, np.float32) / 255.0
    else:
        raw = np.random.RandomState(0).rand(800, 1216, 3).astype(np.float32)

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    normed = (raw - mean) / std
    h, w = normed.shape[:2]
    ph = -(-h // 64) * 64
    pw = -(-w // 64) * 64
    image = np.zeros((1, ph, pw, 3), np.float32)
    image[0, :h, :w] = normed
    mask = np.ones((1, ph, pw), bool)
    mask[0, :h, :w] = False

    variables = jax.jit(
        lambda r: model.init(r, jnp.asarray(image), jnp.asarray(mask),
                             train=False))(jax.random.PRNGKey(0))
    if args.weights:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore(os.path.abspath(args.weights),
                               target=variables["params"])
        variables = dict(variables)
        variables["params"] = params
        print(f"loaded weights from {args.weights}")

    out = jax.jit(lambda i, m: model.apply(variables, i, m, train=False,
                                           inference=True))(
        jnp.asarray(image), jnp.asarray(mask))

    logits = np.asarray(out["pred_logits"][0], np.float32)
    boxes = np.asarray(out["pred_boxes"][0], np.float32)
    prob = 1 / (1 + np.exp(-logits))
    scores = prob.max(-1)
    labels = prob.argmax(-1)
    keep = scores > args.threshold

    xyxy = np.concatenate([boxes[:, :2] - boxes[:, 2:] / 2,
                           boxes[:, :2] + boxes[:, 2:] / 2], -1)
    xyxy = xyxy * np.array([pw, ph, pw, ph], np.float32)

    canvas = (raw * 255).astype(np.uint8)
    img = draw_boxes(
        np.pad(canvas, ((0, ph - h), (0, pw - w), (0, 0))),
        xyxy[keep], labels[keep], scores[keep])
    if "pred_masks" in out:
        from boxer_tpu.dataset.coco import _paste_masks_np

        m = 1 / (1 + np.exp(-np.asarray(out["pred_masks"][0], np.float32)))
        pasted = _paste_masks_np(m[keep], xyxy[keep], (ph, pw)) >= 0.5
        img = draw_masks(img, pasted, labels[keep])
    Image.fromarray(img[:h, :w]).save(args.out)
    print(f"wrote {args.out} ({int(keep.sum())} detections)")


if __name__ == "__main__":
    main()
