"""InstanceAttention weight math: the compact-quadrant softmax with
multiplicity correction must equal the reference's repeat_interleave-then-
softmax (`box_attention.py:94-110`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _reference_weights(attn_quad, k):
    """attn_quad: (B, L1, H, L, 2, 2) logits -> (spatial, level) each
    (B, L1, H, L, k, k), computed the reference way: expand then softmax."""
    b, l1, h, l = attn_quad.shape[:4]
    a = np.repeat(attn_quad, k // 2, axis=-1)
    a = np.repeat(a, k // 2, axis=-2)  # (B, L1, H, L, k, k)

    flat = a.reshape(b, l1, h, -1)
    e = np.exp(flat - flat.max(-1, keepdims=True))
    spatial = (e / e.sum(-1, keepdims=True)).reshape(b, l1, h, l, k, k)

    e2 = np.exp(a - a.max(axis=3, keepdims=True))
    level = e2 / e2.sum(axis=3, keepdims=True)
    return spatial, level


@pytest.mark.parametrize("k", [4, 14])
def test_quadrant_softmax_equivalence(k):
    from boxer_tpu.nn.attention import InstanceAttention

    rng = np.random.RandomState(0)
    b, l1, h, l = 2, 3, 4, 2
    attn_quad = rng.randn(b, l1, h, l, 2, 2).astype(np.float32)

    # module math (mirrors InstanceAttention.__call__): query-minor compact
    # softmax with multiplicity correction, then quadrant expansion
    attn_q = jnp.asarray(attn_quad).transpose(0, 2, 3, 4, 5, 1)  # (B,H,L,2,2,L1)
    mult = (k // 2) ** 2
    flat = attn_q.reshape(b, h, l * 4, l1)
    m = flat.max(axis=2, keepdims=True)
    e = jnp.exp(flat - m)
    denom = e.sum(axis=2, keepdims=True) * mult
    spatial_c = (e / denom).reshape(b, h, l, 2, 2, l1)

    module = InstanceAttention(d_model=32, num_level=l, num_head=h,
                               kernel_size=k)
    spatial = module._expand_quadrant_weights(spatial_c)  # (B,H,L,k*k,L1)

    level_c = jax.nn.softmax(attn_q, axis=2)
    level = module._expand_quadrant_weights(level_c)

    ref_spatial, ref_level = _reference_weights(attn_quad, k)
    # module is (B, H, L, k*k, L1); reference is (B, L1, H, L, k, k)
    got_spatial = np.asarray(spatial).reshape(b, h, l, k, k, l1)
    got_spatial = got_spatial.transpose(0, 5, 1, 2, 3, 4)
    got_level = np.asarray(level).reshape(b, h, l, k, k, l1)
    got_level = got_level.transpose(0, 5, 1, 2, 3, 4)

    np.testing.assert_allclose(got_spatial, ref_spatial, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_level, ref_level, rtol=1e-5, atol=1e-6)
    # spatial sums to 1 over (L, k, k)
    np.testing.assert_allclose(
        got_spatial.sum(axis=(3, 4, 5)), np.ones((b, l1, h)), rtol=1e-5)
