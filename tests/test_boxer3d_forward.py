"""BoxeR-3D + DETR forward smoke tests (tiny shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def test_boxer3d_forward_shapes():
    from boxer_tpu.models.boxer3d import BoxeR3D

    model = BoxeR3D(
        num_classes=2, hidden_dim=32, nhead=8, num_level=2,
        enc_layers=1, dec_layers=2, dim_feedforward=64, num_queries=16,
        backbone_cfg=tuple(sorted({
            "type": "pointpillar",
            "params.hidden_dim": 32,
            "params.position_encoding": "fixed",
            "params.ref_size": 4,
            "params.return_layers": 2,
            "params.reader.num_input_features": 5,
            "params.reader.num_filters": (16, 32),
            "params.reader.voxel_size": (0.32, 0.32, 6.0),
            "params.reader.pc_range": (-5.12, -5.12, -3.0, 5.12, 5.12, 3.0),
            "params.extractor.num_input_features": 32,
            "params.neck.num_layers": (1, 1, 1),
            "params.neck.ds_strides": (1, 2, 2),
            "params.neck.ds_filters": (32, 64, 64),
        }.items())),
    )

    rng = np.random.RandomState(0)
    v, p, f = 64, 8, 5
    nx = ny = 32  # grid 10.24m / 0.32
    voxels = rng.randn(v, p, f).astype(np.float32)
    coords = np.stack([
        rng.randint(0, 2, v),               # batch idx
        np.zeros(v, np.int64),              # z
        rng.randint(0, ny, v),              # y
        rng.randint(0, nx, v),              # x
    ], axis=1).astype(np.int32)
    coords[-8:, 0] = -1  # padding voxels
    num_pts = rng.randint(1, p + 1, v).astype(np.int32)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(voxels), jnp.asarray(coords),
        jnp.asarray(num_pts), (nx, ny), 2, train=False)
    out = model.apply(
        variables, jnp.asarray(voxels), jnp.asarray(coords),
        jnp.asarray(num_pts), (nx, ny), 2, train=True, inference=False,
        rngs={"dropout": jax.random.PRNGKey(1)})

    assert out["pred_logits"].shape == (2, 16, 2)
    assert out["pred_boxes"].shape == (2, 16, 7)
    assert len(out["aux_outputs"]) == 1
    assert "enc_outputs" in out
    b = np.asarray(out["pred_boxes"])
    assert np.isfinite(b).all() and b.min() >= 0 and b.max() <= 1

    out_inf = model.apply(
        variables, jnp.asarray(voxels), jnp.asarray(coords),
        jnp.asarray(num_pts), (nx, ny), 2, train=False, inference=True)
    assert "enc_outputs" not in out_inf


def test_detr_forward_shapes():
    from boxer_tpu.models.detr import DETR

    model = DETR(num_classes=5, hidden_dim=32, nhead=4, enc_layers=1,
                 dec_layers=2, dim_feedforward=64, num_queries=10,
                 dropout=0.0)
    image = jnp.zeros((2, 64, 64, 3), jnp.float32)
    mask = jnp.zeros((2, 64, 64), bool)
    variables = model.init(jax.random.PRNGKey(0), image, mask, train=False)
    out = model.apply(variables, image, mask, train=True,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    assert out["pred_logits"].shape == (2, 10, 6)  # num_classes + 1
    assert out["pred_boxes"].shape == (2, 10, 4)
    assert len(out["aux_outputs"]) == 1
