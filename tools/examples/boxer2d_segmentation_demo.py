"""Worked example: BoxeR-2D instance segmentation, end to end.

Script equivalent of the reference demo notebook
(`/root/reference/tools/visualization/BoxeR_2d_segmentation.ipynb`): build
the instance-segmentation model, run one image through preprocessing →
inference → on-device postprocessing (top-k selection, box rescale, mask
paste + rescoring), and write an overlay PNG.

Runs anywhere (CPU included) and needs no checkpoint — pass --weights to
see real predictions, otherwise random-init weights demonstrate the full
pipeline mechanically.

  python tools/examples/boxer2d_segmentation_demo.py \
      [--image photo.jpg] [--weights save/model_final] [--out demo.png]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=None, help="input photo (else synthetic)")
    ap.add_argument("--weights", default=None,
                    help="orbax weights-only export (tools/run.py model_final)")
    ap.add_argument("--out", default="demo.png")
    ap.add_argument("--threshold", type=float, default=0.3)
    ap.add_argument("--size", type=int, default=512, help="short-side resize")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from boxer_tpu.models.boxer2d import BoxeR2D
    from boxer_tpu.utils.visualization import draw_boxes, draw_masks

    # --- 1. the image, resized + ImageNet-normalized (processor semantics,
    #        `dataset/processor/transforms_2d.py`) -------------------------
    if args.image:
        from PIL import Image

        pil = Image.open(args.image).convert("RGB")
        scale = args.size / min(pil.size)
        pil = pil.resize((int(pil.width * scale), int(pil.height * scale)))
        img = np.asarray(pil, np.float32) / 255.0
    else:  # synthetic blobs so the demo is self-contained
        rng = np.random.default_rng(0)
        img = np.full((args.size, args.size, 3), 0.35, np.float32)
        for _ in range(4):
            cy, cx = rng.integers(60, args.size - 60, 2)
            r = int(rng.integers(24, 56))
            yy, xx = np.ogrid[:args.size, :args.size]
            img[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = rng.random(3)
    h, w = img.shape[:2]
    mean = np.array([0.485, 0.456, 0.406]); std = np.array([0.229, 0.224, 0.225])
    x = jnp.asarray((img - mean) / std, jnp.float32)[None]
    pad_mask = jnp.zeros((1, h, w), bool)  # single image: no padding

    # --- 2. the model, with the deferred top-k mask decode + on-device
    #        postprocess exactly like the fps harness (`bench.py`) ---------
    model = BoxeR2D(num_classes=91, hidden_dim=256, nhead=8, num_level=4,
                    enc_layers=6, dec_layers=6, dim_feedforward=1024,
                    num_queries=300, use_mask=True,
                    backbone_arch="resnet50", dtype=jnp.bfloat16)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), x, pad_mask, train=False))()
    if args.weights:
        from boxer_tpu.utils.checkpoint import Checkpoint

        ckpt = Checkpoint(os.path.dirname(args.weights) or ".")
        variables = dict(variables)
        variables["params"] = ckpt.load_weights(
            args.weights, variables["params"])

    post = {"canvas_hw": (h, w), "topk": 50}
    out = jax.jit(lambda v, i, m: model.apply(
        v, i, m, train=False, inference=True,
        postprocess=post))(variables, x, pad_mask)

    # --- 3. overlay: scores/labels/boxes/masks are already final ----------
    scores = np.asarray(out["scores"][0])
    keep = scores > args.threshold
    print(f"{keep.sum()} instances above {args.threshold:.2f} "
          f"(top score {scores.max():.3f})")
    canvas = (img * 255).astype(np.uint8)
    if keep.any():
        canvas = draw_masks(canvas, np.asarray(out["masks"][0])[keep] > 0.5,
                            labels=np.asarray(out["labels"][0])[keep])
        canvas = draw_boxes(canvas, np.asarray(out["boxes"][0])[keep],
                            labels=np.asarray(out["labels"][0])[keep],
                            scores=scores[keep])
    from PIL import Image

    Image.fromarray(canvas).save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
