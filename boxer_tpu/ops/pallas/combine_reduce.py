"""Pallas TPU fused bilinear-combine + P-tap reduce for box attention.

Forward-only companion to the folded quad-table gather
(`ops/box_attention.py:_box_attention_qminor_folded`). The XLA formulation
materializes the per-tap corner combination as a (P*M, Ch) tensor and tree-
reduces it over P (the reference instead accumulates in CUDA registers,
`e2edet/module/ops/src/box_attn/box_attn_kernel.cuh:60-101`). On TPU that
costs one full HBM round-trip of the tap tensor plus log2(P) reduce passes.

This kernel consumes the gather output in its native (P*M, 4*Ch) layout and
keeps the P-accumulation in a VMEM f32 scratch across the P grid dimension:

- grid (m-chunks, P); per step, the (CB, 4*Ch) payload block is weighted by
  its per-tap scalar w[p, c, m] broadcast to the c-th corner's lane slice.
  The broadcast is an MXU trick: wf = w_block.T @ sel with sel the (4, 4*Ch)
  corner-selector 0/1 matrix — a free transpose of the lane-major weights;
- acc += g * wf runs full-width (CB, 4*Ch) f32 in VMEM; only after the last
  P step are the four corner slices collapsed and the (CB, Ch) block written
  once. No tap tensor, no tree reduce, 4x smaller output relayouts.

Measured (v5e, encoder scale P=4, M=8*18071, Ch=32): 1.418 ms vs 1.668 ms
for the XLA take+combine+reduce chain per (layer, level) call — the win is
~6 ms per model forward over the encoder's 24 calls.

FORWARD ONLY: pallas_call has no AD rule here; callers gate on the model's
inference flag (`fold=True` paths) — the training backward keeps the XLA
formulation whose cotangent scatter is the Pallas kernel in scatter_accum.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# taps (rows) per grid block: payload VMEM block = CB * 4*Ch * 4 B
_CB = 4096


@functools.lru_cache(maxsize=None)
def _build_call(p: int, m: int, ch: int, pay_dtype: str):
    nmc = pl.cdiv(m, _CB)

    def kernel(g_ref, w_ref, o_ref, acc):
        pi = pl.program_id(1)

        @pl.when(pi == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        g = g_ref[0].astype(jnp.float32)                  # (CB, 4ch)
        w = w_ref[0]                                      # (4, CB) f32
        # corner-selector matmul broadcasts each tap's 4 scalar weights to
        # their corner lane slices (and transposes lane-major w for free)
        cc = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 1) // ch
        sel = (cc == jj).astype(jnp.float32)              # (4, 4ch)
        wf = jax.lax.dot_general(w, sel, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc[:] = acc[:] + g * wf                          # (CB, 4ch) f32

        @pl.when(pi == p - 1)
        def _():
            a = acc[:]
            o_ref[...] = (a[:, 0 * ch:1 * ch] + a[:, 1 * ch:2 * ch]
                          + a[:, 2 * ch:3 * ch] + a[:, 3 * ch:4 * ch])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, ch), jnp.float32),
        grid=(nmc, p),
        in_specs=[
            pl.BlockSpec((1, _CB, 4 * ch), lambda mc, pi: (pi, mc, 0)),
            pl.BlockSpec((1, 4, _CB), lambda mc, pi: (pi, 0, mc)),
        ],
        out_specs=pl.BlockSpec((_CB, ch), lambda mc, pi: (mc, 0)),
        scratch_shapes=[pltpu.VMEM((_CB, 4 * ch), jnp.float32)],
    )


def pallas_combine_supported(ch: int) -> bool:
    """TPU backend and one full (8, 128) lane tile per quad row (head_dim
    32, the model's only configuration); anything else uses the XLA chain."""
    return jax.default_backend() == "tpu" and 4 * ch == 128


def fused_combine_reduce(g, w, p: int, m: int):
    """out[m] = sum_p sum_c w[p, c, m] * g[p*m_stride + m, c*ch:(c+1)*ch].

    g: (P*M, 4*Ch) gather output, rows p-major (any float dtype)
    w: (P, 4, M) f32 per-tap corner weights (bilinear * attention * valid)
    returns (M, Ch) f32 — the taps summed over P and corners.

    Forward-only (no AD rule); see module docstring.
    """
    n, ch4 = g.shape
    assert n == p * m and ch4 % 4 == 0
    ch = ch4 // 4
    g3 = g.reshape(p, m, ch4)                             # free reshape
    return _build_call(p, m, ch, jnp.dtype(g.dtype).name)(g3, w)
