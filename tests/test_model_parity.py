"""End-to-end numerical parity: flax BoxeR-2D vs the reference torch model.

The keystone cross-check (VERDICT round-1 #4): the reference model runs on
CPU with its own pure-PyTorch Plain* sampling oracles
(`/root/reference/tests/box_attn_test.py:9-42`), identical weights are
ported into the flax model (`utils/torch_port.py port_boxer2d_state_dict`),
and pred_logits / pred_boxes must agree on a random image. This is the AP
parity proxy available without COCO data.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "helpers"))

from reference_torch import reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(),
                       reason="reference repo not present"),
]


@pytest.fixture(scope="module")
def torch_and_flax():
    import torch
    from reference_torch import build_reference_boxer2d

    torch.manual_seed(7)
    kw = dict(num_classes=7, hidden_dim=64, nhead=4, enc_layers=2,
              dec_layers=2, dim_feedforward=128, num_queries=20)
    tm = build_reference_boxer2d(**kw)
    tm.eval()

    import jax
    import jax.numpy as jnp
    from boxer_tpu.models.boxer2d import BoxeR2D
    from boxer_tpu.utils.torch_port import apply_boxer2d_weights

    fm = BoxeR2D(num_classes=7, hidden_dim=64, nhead=4, num_level=4,
                 enc_layers=2, dec_layers=2, dim_feedforward=128,
                 num_queries=20, use_mask=False, backbone_arch="resnet50")
    img = jnp.zeros((1, 96, 128, 3))
    mask = jnp.zeros((1, 96, 128), bool)
    variables = fm.init(jax.random.PRNGKey(0), img, mask, train=False)
    variables, unmatched = apply_boxer2d_weights(
        variables, tm.state_dict(), enc_layers=2)
    assert not unmatched, f"unported keys: {unmatched}"
    return tm, fm, variables


def _align_queries(f_boxes, t_boxes):
    """Match flax query rows to torch query rows by box identity.

    The two sides select the SAME top-num_queries encoder proposals but in a
    different order (torch `topk(sorted=False)` vs jax sorted `lax.top_k`) —
    a pure permutation, and the decoder is permutation-equivariant over
    queries. Returns perm such that f[perm] aligns with t."""
    perm = []
    used = set()
    for tb in t_boxes:
        d = np.abs(f_boxes - tb).sum(-1)
        for j in np.argsort(d):
            if j not in used:
                used.add(int(j))
                perm.append(int(j))
                break
    return np.asarray(perm)


def test_full_model_logits_parity(torch_and_flax):
    import torch
    import jax.numpy as jnp

    tm, fm, variables = torch_and_flax
    rng = np.random.RandomState(3)
    img = rng.randn(1, 96, 128, 3).astype(np.float32)
    mask = np.zeros((1, 96, 128), bool)

    with torch.no_grad():
        t_out = tm({"image": torch.from_numpy(img.transpose(0, 3, 1, 2)),
                    "mask": torch.from_numpy(mask)})

    f_out = fm.apply(variables, jnp.asarray(img), jnp.asarray(mask),
                     train=False, inference=True)

    t_logits = t_out["pred_logits"].numpy()
    t_boxes = t_out["pred_boxes"].numpy()
    f_logits = np.asarray(f_out["pred_logits"], np.float32)
    f_boxes = np.asarray(f_out["pred_boxes"], np.float32)

    assert t_logits.shape == f_logits.shape
    assert t_boxes.shape == f_boxes.shape
    for b in range(t_logits.shape[0]):
        perm = _align_queries(f_boxes[b], t_boxes[b])
        assert len(set(perm.tolist())) == len(perm)
        np.testing.assert_allclose(f_logits[b][perm], t_logits[b],
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(f_boxes[b][perm], t_boxes[b],
                                   rtol=1e-3, atol=2e-3)


@pytest.fixture(scope="module")
def torch_and_flax_mask():
    """use_mask=True pair: the flagship (instance-seg) configuration.
    The torch side runs the reference's own PlainInstanceAttnFunction oracle
    (`/root/reference/tests/instance_attn_test.py:11-63`)."""
    import torch
    from reference_torch import build_reference_boxer2d

    torch.manual_seed(11)
    kw = dict(num_classes=7, hidden_dim=64, nhead=4, enc_layers=2,
              dec_layers=2, dim_feedforward=128, num_queries=20,
              use_mask=True)
    tm = build_reference_boxer2d(**kw)
    tm.eval()

    import jax
    import jax.numpy as jnp
    from boxer_tpu.models.boxer2d import BoxeR2D
    from boxer_tpu.utils.torch_port import apply_boxer2d_weights

    fm = BoxeR2D(num_classes=7, hidden_dim=64, nhead=4, num_level=4,
                 enc_layers=2, dec_layers=2, dim_feedforward=128,
                 num_queries=20, use_mask=True, backbone_arch="resnet50")
    img = jnp.zeros((1, 96, 128, 3))
    mask = jnp.zeros((1, 96, 128), bool)
    variables = fm.init(jax.random.PRNGKey(0), img, mask, train=False)
    variables, unmatched = apply_boxer2d_weights(
        variables, tm.state_dict(), enc_layers=2)
    assert not unmatched, f"unported keys: {unmatched}"
    return tm, fm, variables


def test_full_model_mask_parity(torch_and_flax_mask):
    """pred_masks (and rescored logits/boxes) parity for the use_mask model —
    the AP-parity proxy for the flagship segm configuration (VERDICT r2 #3)."""
    import torch
    import jax.numpy as jnp

    tm, fm, variables = torch_and_flax_mask
    rng = np.random.RandomState(5)
    img = rng.randn(1, 96, 128, 3).astype(np.float32)
    mask = np.zeros((1, 96, 128), bool)

    with torch.no_grad():
        t_out = tm({"image": torch.from_numpy(img.transpose(0, 3, 1, 2)),
                    "mask": torch.from_numpy(mask)})

    f_out = fm.apply(variables, jnp.asarray(img), jnp.asarray(mask),
                     train=False, inference=True)

    t_logits = t_out["pred_logits"].numpy()
    t_boxes = t_out["pred_boxes"].numpy()
    t_masks = t_out["pred_masks"].numpy()
    f_logits = np.asarray(f_out["pred_logits"], np.float32)
    f_boxes = np.asarray(f_out["pred_boxes"], np.float32)
    f_masks = np.asarray(f_out["pred_masks"], np.float32)

    assert "pred_masks" in f_out and t_masks.shape == f_masks.shape, \
        (t_masks.shape, f_masks.shape)
    for b in range(t_logits.shape[0]):
        perm = _align_queries(f_boxes[b], t_boxes[b])
        assert len(set(perm.tolist())) == len(perm)
        np.testing.assert_allclose(f_logits[b][perm], t_logits[b],
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(f_boxes[b][perm], t_boxes[b],
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(f_masks[b][perm], t_masks[b],
                                   rtol=1e-3, atol=5e-3)
