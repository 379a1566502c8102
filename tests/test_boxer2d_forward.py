"""Smoke tests: BoxeR2D forward pass shapes in train/val/inference modes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_model():
    from boxer_tpu.models.boxer2d import BoxeR2D

    model = BoxeR2D(
        num_classes=7,
        hidden_dim=32,
        nhead=4,
        num_level=4,
        enc_layers=2,
        dec_layers=2,
        dim_feedforward=64,
        num_queries=20,
        use_mask=False,
    )
    rng = jax.random.PRNGKey(0)
    image = jnp.zeros((2, 64, 96, 3), jnp.float32)
    mask = jnp.zeros((2, 64, 96), bool).at[0, :, 64:].set(True)
    variables = model.init(rng, image, mask, train=False)
    return model, variables, image, mask


def test_forward_train_shapes(tiny_model):
    model, variables, image, mask = tiny_model
    out = model.apply(variables, image, mask, train=True, inference=False,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    assert out["pred_logits"].shape == (2, 20, 7)
    assert out["pred_boxes"].shape == (2, 20, 4)
    assert len(out["aux_outputs"]) == 1
    assert len(out["enc_outputs"]) == 1
    # feature pyramid: 64x96 -> /8, /16, /32, /64
    s = (8 * 12) + (4 * 6) + (2 * 3) + (1 * 2)
    assert out["enc_outputs"][0]["pred_logits"].shape == (2, s, 1)
    assert np.all(np.isfinite(np.asarray(out["pred_boxes"])))
    boxes = np.asarray(out["pred_boxes"])
    assert boxes.min() >= 0.0 and boxes.max() <= 1.0


def test_forward_inference_shapes(tiny_model):
    model, variables, image, mask = tiny_model
    out = model.apply(variables, image, mask, train=False, inference=True)
    assert out["pred_logits"].shape == (2, 20, 7)
    assert "enc_outputs" not in out
    assert len(out["aux_outputs"]) == 0


def test_forward_mask_model():
    from boxer_tpu.models.boxer2d import BoxeR2D

    model = BoxeR2D(
        num_classes=5,
        hidden_dim=32,
        nhead=4,
        num_level=4,
        enc_layers=1,
        dec_layers=2,
        dim_feedforward=64,
        num_queries=10,
        use_mask=True,
    )
    rng = jax.random.PRNGKey(0)
    image = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(rng, image, None, train=False)
    out = model.apply(variables, image, None, train=True, inference=False,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    assert out["pred_masks"].shape == (1, 10, 28, 28)
    out_inf = model.apply(variables, image, None, train=False, inference=True)
    assert out_inf["pred_masks"].shape == (1, 10, 28, 28)
