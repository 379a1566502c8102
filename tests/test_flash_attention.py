"""Pallas flash attention vs jnp oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("lq,lkv,d", [(128, 128, 32), (300, 300, 32),
                                      (100, 260, 64)])
def test_flash_matches_reference(lq, lkv, d, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    from boxer_tpu.ops.pallas import flash_attention as fa

    rng = np.random.RandomState(0)
    bh = 4
    q = jnp.asarray(rng.randn(bh, lq, d), jnp.float32) * 0.1
    k = jnp.asarray(rng.randn(bh, lkv, d), jnp.float32) * 0.1
    v = jnp.asarray(rng.randn(bh, lkv, d), jnp.float32) * 0.1
    mask = jnp.where(
        jnp.asarray(rng.rand(bh, lkv)) < 0.2, fa.NEG_INF, 0.0)

    ref = fa.flash_attention_ref(q, k, v, mask)
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_no_mask(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    from boxer_tpu.ops.pallas import flash_attention as fa

    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(2, 64, 32), jnp.float32) * 0.1
    k = jnp.asarray(rng.randn(2, 192, 32), jnp.float32) * 0.1
    v = jnp.asarray(rng.randn(2, 192, 32), jnp.float32) * 0.1
    ref = fa.flash_attention_ref(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
