"""Deferred top-k mask decode parity.

The inference fast path (`BoxeR2D(..., postprocess=...)`) selects the top-k
(query, class) pairs from the detector logits FIRST and then runs the mask
RoI tail (`DecoderLayer.decode_roi`: out_proj, norms, FFN residual, mask
head, paste) only on the selected queries. Every deferred op is per-query,
so the result must equal running the full forward (all-query RoI tail) and
`coco_postprocess` afterwards — the reference's select-then-paste semantics
(`e2edet/dataset/coco.py:126-160`). This pins that equality in f32 on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boxer_tpu.evaluate.postprocess import coco_postprocess
from boxer_tpu.models.boxer2d import BoxeR2D


@pytest.mark.parametrize("residual_mode", ["v1", "v2"])
def test_deferred_topk_mask_decode_matches_full_path(residual_mode):
    h, w = 64, 96
    num_classes = 7
    model = BoxeR2D(
        num_classes=num_classes, hidden_dim=32, nhead=4, num_level=4,
        enc_layers=1, dec_layers=2, dim_feedforward=64, num_queries=16,
        use_mask=True, residual_mode=residual_mode,
    )
    rng = jax.random.PRNGKey(0)
    image = jax.random.normal(rng, (1, h, w, 3), jnp.float32)
    mask = jnp.zeros((1, h, w), bool)
    variables = model.init(rng, image, mask, train=False)

    # full path: all-query RoI tail + standalone postprocess
    full = model.apply(variables, image, mask, train=False, inference=True)
    want = coco_postprocess(full["pred_logits"], full["pred_boxes"],
                            full["pred_masks"], canvas_hw=(h, w), topk=10)

    got = model.apply(variables, image, mask, train=False, inference=True,
                      postprocess={"canvas_hw": (h, w), "topk": 10})

    np.testing.assert_allclose(np.asarray(got["scores"]),
                               np.asarray(want["scores"]),
                               rtol=1e-5, atol=1e-6)
    assert (np.asarray(got["labels"]) == np.asarray(want["labels"])).all()
    np.testing.assert_allclose(np.asarray(got["boxes"]),
                               np.asarray(want["boxes"]),
                               rtol=1e-5, atol=1e-4)
    # binary masks: identical up to float-associativity boundary pixels
    diff = np.mean(np.asarray(got["masks"]) != np.asarray(want["masks"]))
    assert diff < 1e-4, diff


def test_deferred_decode_with_scale_and_jit():
    """scale plumbs through and the fast path is jittable."""
    h, w = 64, 64
    model = BoxeR2D(
        num_classes=5, hidden_dim=32, nhead=4, num_level=4,
        enc_layers=1, dec_layers=1, dim_feedforward=64, num_queries=12,
        use_mask=True,
    )
    rng = jax.random.PRNGKey(1)
    image = jax.random.normal(rng, (1, h, w, 3), jnp.float32)
    mask = jnp.zeros((1, h, w), bool)
    variables = model.init(rng, image, mask, train=False)

    scale = jnp.asarray([[w, h, w, h]], jnp.float32) * 0.5

    @jax.jit
    def run(img, msk):
        return model.apply(variables, img, msk, train=False, inference=True,
                           postprocess={"canvas_hw": (h, w), "topk": 8,
                                        "scale": scale})

    out = run(image, mask)
    full = model.apply(variables, image, mask, train=False, inference=True)
    want = coco_postprocess(full["pred_logits"], full["pred_boxes"],
                            full["pred_masks"], canvas_hw=(h, w), topk=8,
                            scale=scale)
    np.testing.assert_allclose(np.asarray(out["boxes"]),
                               np.asarray(want["boxes"]), rtol=1e-5,
                               atol=1e-4)
    assert out["masks"].shape == (1, 8, h, w)
