"""Parity tests for the on-device (jittable) COCO postprocessor.

`evaluate/postprocess.py` re-expresses the reference GPU postprocessing
(`e2edet/dataset/coco.py:126-177`, `e2edet/utils/general.py:223-246`) as one
XLA program with the mask paste as two MXU matmuls. These tests pin it to the
host-side references already in the repo: `utils.general.paste_grid`
(grid_sample formulation) and `CocoDetectionTask.format_for_evalai` (numpy).
"""

import numpy as np
import jax.numpy as jnp

from boxer_tpu.evaluate.postprocess import paste_masks_mxu, coco_postprocess
from boxer_tpu.utils.general import paste_grid


def test_paste_masks_mxu_matches_grid_sample():
    rng = np.random.RandomState(0)
    n, s, h, w = 7, 28, 64, 96
    masks = rng.rand(n, s, s).astype(np.float32)
    x1 = rng.uniform(0, w * 0.6, n)
    y1 = rng.uniform(0, h * 0.6, n)
    boxes = np.stack([x1, y1,
                      x1 + rng.uniform(2, w * 0.4, n),
                      y1 + rng.uniform(2, h * 0.4, n)], -1).astype(np.float32)

    got = np.asarray(paste_masks_mxu(jnp.asarray(masks), jnp.asarray(boxes),
                                     (h, w)))
    want = np.asarray(paste_grid(jnp.asarray(masks), jnp.asarray(boxes),
                                 (h, w)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_paste_masks_mxu_degenerate_box_is_zero():
    masks = jnp.ones((1, 14, 14), jnp.float32)
    boxes = jnp.asarray([[10.0, 10.0, 10.0, 10.0]])  # zero-area
    out = np.asarray(paste_masks_mxu(masks, boxes, (32, 32)))
    assert np.isfinite(out).all()


def test_coco_postprocess_matches_host_format_for_evalai():
    from boxer_tpu.dataset.coco import COCODetection

    rng = np.random.RandomState(1)
    b, nq, c, s = 2, 40, 5, 28
    h, w = 48, 72
    logits = rng.randn(b, nq, c).astype(np.float32)
    cx = rng.uniform(0.2, 0.8, (b, nq))
    cy = rng.uniform(0.2, 0.8, (b, nq))
    boxes = np.stack([cx, cy,
                      rng.uniform(0.05, 0.3, (b, nq)),
                      rng.uniform(0.05, 0.3, (b, nq))], -1).astype(np.float32)
    mask_logits = rng.randn(b, nq, s, s).astype(np.float32)

    out = coco_postprocess(jnp.asarray(logits), jnp.asarray(boxes),
                           jnp.asarray(mask_logits), canvas_hw=(h, w),
                           topk=10)

    # host reference: canvas == size == orig_size so the scale factor is (w,h)
    task = COCODetection.__new__(COCODetection)
    task.canvas = (h, w)
    metas = [{"image_id": i, "orig_size": (h, w), "size": (h, w)}
             for i in range(b)]
    want = task.format_for_evalai(
        {"pred_logits": logits, "pred_boxes": boxes,
         "pred_masks": mask_logits}, metas, topk=10)

    for i in range(b):
        ref = want[i]
        order_ref = np.argsort(-np.asarray(ref["scores"]))
        order_got = np.argsort(-np.asarray(out["scores"][i]))
        np.testing.assert_allclose(
            np.asarray(out["scores"][i])[order_got],
            np.asarray(ref["scores"])[order_ref], rtol=1e-4, atol=1e-5)
        assert (np.asarray(out["labels"][i])[order_got]
                == np.asarray(ref["labels"])[order_ref]).all()
        np.testing.assert_allclose(
            np.asarray(out["boxes"][i])[order_got],
            np.asarray(ref["boxes"])[order_ref], rtol=1e-4, atol=1e-3)
        got_masks = np.asarray(out["masks"][i])[order_got]
        ref_masks = np.asarray(ref["masks"])[order_ref]
        # binary masks: identical up to boundary-pixel rounding
        diff = np.mean(got_masks != ref_masks)
        assert diff < 1e-3, diff
