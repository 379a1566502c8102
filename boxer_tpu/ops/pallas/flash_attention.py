"""Pallas TPU flash attention (forward).

Fused online-softmax attention for the framework's *dense* attention sites —
decoder self-attention (300 queries, `box_transformer.py` parity of the
reference's nn.MultiheadAttention, `box_transformer.py:417-424`) and the DETR
transformer's dense encoder/decoder. The deformable box-attention hot path
does NOT use this (it is gather-bound; see ops/box_attention.py and
docs/TPU_PERFORMANCE.md) — this kernel covers the O(L²) sites where tiling +
online softmax is the right TPU pattern.

Standard flash tiling: grid (B*H, Lq/block_q, Lkv/block_k); fp32 running
max/sum/accumulator scratch in VMEM; optional additive key-padding mask.
Falls back to plain XLA attention under vmap/AD (custom differentiation is
unnecessary at these sizes).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                  m_scratch, l_scratch, acc_scratch, *,
                  sm_scale: float, kv_blocks: int):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0].astype(jnp.float32)          # (block_q, d)
    k = k_ref[0].astype(jnp.float32)          # (block_k, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale   # (block_q, block_k)
    s = s + mask_ref[0]                       # additive key mask (1, bk)

    m_prev = m_scratch[:]                     # (block_q, 1)
    l_prev = l_scratch[:]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    m_scratch[:] = m_next
    l_scratch[:] = l_next

    v = v_ref[0].astype(jnp.float32)
    acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot(
        p, v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == kv_blocks - 1)
    def _store():
        l = l_scratch[:]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scratch[:] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "sm_scale"))
def flash_attention(q, k, v, mask: Optional[jnp.ndarray] = None,
                    block_q: int = 128, block_k: int = 128,
                    sm_scale: Optional[float] = None):
    """q: (BH, Lq, D); k, v: (BH, Lkv, D); mask: (BH, Lkv) additive fp32
    (0 = attend, NEG_INF = masked) or None. Returns (BH, Lq, D)."""
    bh, lq, d = q.shape
    lkv = k.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)

    # pad sequence dims to block multiples
    lq_p = -(-lq // block_q) * block_q
    lkv_p = -(-lkv // block_k) * block_k
    qp = jnp.pad(q, ((0, 0), (0, lq_p - lq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, lkv_p - lkv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, lkv_p - lkv), (0, 0)))
    if mask is None:
        mask = jnp.zeros((bh, lkv), jnp.float32)
    maskp = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, lkv_p - lkv)),
                    constant_values=NEG_INF)[:, None, :]

    kv_blocks = lkv_p // block_k
    grid = (bh, lq_p // block_q, kv_blocks)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, sm_scale=sm_scale,
                          kv_blocks=kv_blocks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(qp, kp, vp, maskp)
    return out[:, :lq]


def flash_attention_ref(q, k, v, mask=None, sm_scale=None):
    """Pure-jnp oracle used by tests and as the AD/vmap fallback."""
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    if mask is not None:
        s = s + mask[:, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(q.dtype)


# ---------------------------------------------------------------------------
# Differentiable / backend-dispatching wrapper
# ---------------------------------------------------------------------------

@jax.custom_vjp
def attention(q, k, v, mask=None):
    """Backend-dispatching fused attention: Pallas kernel on TPU, jnp oracle
    elsewhere; backward always via the oracle's AD (these dense sites are
    tiny — 300-1k tokens — so oracle backward is cheap and exact)."""
    return _attention_fwd_impl(q, k, v, mask)


def _attention_fwd_impl(q, k, v, mask):
    if jax.default_backend() == "tpu":
        return flash_attention(q, k, v, mask)
    return flash_attention_ref(q, k, v, mask)


def _attention_fwd(q, k, v, mask):
    return _attention_fwd_impl(q, k, v, mask), (q, k, v, mask)


def _attention_bwd(res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(lambda q, k, v: flash_attention_ref(q, k, v, mask),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


attention.defvjp(_attention_fwd, _attention_bwd)
