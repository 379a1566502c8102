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
# small-P single-pass block (all P payload chunks per grid step)
_CB_ONEPASS = 2048
_ONEPASS_MAX_P = 8


@functools.lru_cache(maxsize=None)
def _build_call_onepass(p: int, m: int, ch: int, cb: int):
    """Single-pass small-P variant (round 5): the grid runs over m-chunks
    only and each step loads ALL P payload chunks of the block, accumulates
    locally, and writes the output once — no f32 scratch carried across grid
    steps. Per-grid-step overhead (~1.4 us) dominates the carry kernel at
    encoder scale; trace-measured 0.337 vs 0.369 ms/call at P=4 M=8*20197
    (tools/bench_combine3.py)."""
    nmc = pl.cdiv(m, cb)

    def kernel(g_ref, w_ref, o_ref):
        cc = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 1) // ch
        sel = (cc == jj).astype(jnp.float32)              # (4, 4ch)
        acc = jnp.zeros((cb, 4 * ch), jnp.float32)
        for pi in range(p):
            g = g_ref[pi].astype(jnp.float32)             # (CB, 4ch)
            w = w_ref[pi]                                 # (4, CB) f32
            wf = jax.lax.dot_general(w, sel, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc = acc + g * wf
        o_ref[...] = (acc[:, 0 * ch:1 * ch] + acc[:, 1 * ch:2 * ch]
                      + acc[:, 2 * ch:3 * ch] + acc[:, 3 * ch:4 * ch])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, ch), jnp.float32),
        grid=(nmc,),
        in_specs=[
            pl.BlockSpec((p, cb, 4 * ch), lambda mc: (0, mc, 0)),
            pl.BlockSpec((p, 4, cb), lambda mc: (0, 0, mc)),
        ],
        out_specs=pl.BlockSpec((cb, ch), lambda mc: (mc, 0)),
    )


@functools.lru_cache(maxsize=None)
def _build_call_onepass_raw(p: int, m: int, ch: int, cb: int):
    """onepass variant taking RAW per-tap row vectors lx/ly/wt (P, M) and
    forming the 4 bilinear corner weights in-kernel — deletes the XLA-side
    (P, 4, M) jnp.stack the other kernels consume (and its HBM round trip)."""
    nmc = pl.cdiv(m, cb)

    def kernel(g_ref, lx_ref, ly_ref, wt_ref, o_ref):
        cc = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 1) // ch
        sel = (cc == jj).astype(jnp.float32)              # (4, 4ch)
        acc = jnp.zeros((cb, 4 * ch), jnp.float32)
        for pi in range(p):
            g = g_ref[pi].astype(jnp.float32)             # (CB, 4ch)
            lx = lx_ref[pi:pi + 1, :]                     # (1, CB) f32
            ly = ly_ref[pi:pi + 1, :]
            wt = wt_ref[pi:pi + 1, :]
            w4 = jnp.concatenate([
                (1.0 - lx) * (1.0 - ly) * wt,
                lx * (1.0 - ly) * wt,
                (1.0 - lx) * ly * wt,
                lx * ly * wt,
            ], axis=0)                                    # (4, CB)
            wf = jax.lax.dot_general(w4, sel, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc = acc + g * wf
        o_ref[...] = (acc[:, 0 * ch:1 * ch] + acc[:, 1 * ch:2 * ch]
                      + acc[:, 2 * ch:3 * ch] + acc[:, 3 * ch:4 * ch])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, ch), jnp.float32),
        grid=(nmc,),
        in_specs=[
            pl.BlockSpec((p, cb, 4 * ch), lambda mc: (0, mc, 0)),
            pl.BlockSpec((p, cb), lambda mc: (0, mc)),
            pl.BlockSpec((p, cb), lambda mc: (0, mc)),
            pl.BlockSpec((p, cb), lambda mc: (0, mc)),
        ],
        out_specs=pl.BlockSpec((cb, ch), lambda mc: (mc, 0)),
    )


def fused_combine_reduce_raw(g, lx, ly, wt, p: int, m: int):
    """out[m] = sum_p sum_c corner(lx,ly)[c] * wt * g[p-major rows].

    g: (P*M, 4*Ch) gather output, rows p-major; lx/ly/wt: (P, M) f32 raw
    bilinear fractions and the (attention-weight x validity) factor. The 4
    corner products are formed in-kernel (no (P, 4, M) stack).
    Small P only (payload block holds all P chunks). Forward-only.
    """
    n, ch4 = g.shape
    assert n == p * m and ch4 % 4 == 0 and lx.shape == (p, m)
    assert p <= _ONEPASS_MAX_P
    g3 = g.reshape(p, m, ch4)
    return _build_call_onepass_raw(p, m, ch4 // 4, _CB_ONEPASS)(
        g3, lx, ly, wt)


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


@functools.lru_cache(maxsize=None)
def _build_mmajor_call(p: int, m: int, ch: int, kk: int):
    """m-major streaming combine (round-5 flagship work): rows ordered
    (m, p) so each block of kk*p rows holds kk COMPLETE outputs — one pure
    read-reduce-write stream, no accumulator carried across grid steps, one
    output write per block. The 4 bilinear corner weights are computed
    IN-KERNEL from raw (lx, ly, w) row vectors, removing the XLA-side
    (P, 4, M) stack/reshape formatting (~2.6 ms/step at encoder scale) that
    fed the p-major kernel.

    Partial tail blocks are safe: block boundaries sit at multiples of kk
    outputs = kk*p payload rows, so OOB-padded rows only reach output rows
    >= m, whose writes Pallas masks.
    """
    cb = kk * p
    nmc = pl.cdiv(m, kk)

    def kernel(g_ref, lx_ref, ly_ref, wt_ref, o_ref):
        g = g_ref[...].astype(jnp.float32)               # (CB, 4ch)
        lx = lx_ref[...]                                 # (1, CB) f32
        ly = ly_ref[...]
        wt = wt_ref[...]
        w4 = jnp.concatenate([
            (1.0 - lx) * (1.0 - ly) * wt,
            lx * (1.0 - ly) * wt,
            (1.0 - lx) * ly * wt,
            lx * ly * wt,
        ], axis=0)                                       # (4, CB)
        cc = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 1) // ch
        sel = (cc == jj).astype(jnp.float32)             # (4, 4ch)
        # one MXU dot broadcasts each row's 4 corner scalars onto their
        # corner lane slices (free transpose of the lane-major weights)
        wf = jax.lax.dot_general(w4, sel, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        prod = g * wf                                    # (CB, 4ch)
        s = prod.reshape(kk, p, 4 * ch).sum(axis=1)      # (kk, 4ch)
        o_ref[...] = (s[:, 0 * ch:1 * ch] + s[:, 1 * ch:2 * ch]
                      + s[:, 2 * ch:3 * ch] + s[:, 3 * ch:4 * ch])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, ch), jnp.float32),
        grid=(nmc,),
        in_specs=[
            pl.BlockSpec((cb, 4 * ch), lambda mc: (mc, 0)),
            pl.BlockSpec((1, cb), lambda mc: (0, mc)),
            pl.BlockSpec((1, cb), lambda mc: (0, mc)),
            pl.BlockSpec((1, cb), lambda mc: (0, mc)),
        ],
        out_specs=pl.BlockSpec((kk, ch), lambda mc: (mc, 0)),
    )


def _mmajor_kk(p: int) -> int:
    """Outputs per block: ~4k payload rows, output sublanes a multiple of 8
    where possible."""
    if p >= 512:
        return 1
    kk = max(1, 4096 // p)
    return max(8, kk // 8 * 8) if kk >= 8 else kk


def fused_combine_reduce_mmajor(g, lx, ly, wt, p: int, m: int):
    """out[m] = sum_p sum_c corner_w(lx,ly,wt)[p,c,m] * g[m*P+p, c*ch:...].

    g: (P*M, 4*Ch) gather output, rows M-MAJOR ((m, p) order — note this is
       the transpose of `fused_combine_reduce`'s p-major row order)
    lx/ly/wt: (1, P*M) f32 row vectors in the same m-major order — raw
       bilinear fractions and the (attention-weight x validity) factor;
       the 4 corner products are formed in-kernel.
    returns (M, Ch) f32. Forward-only (no AD rule).
    """
    n, ch4 = g.shape
    assert n == p * m and ch4 % 4 == 0 and lx.shape == (1, n)
    return _build_mmajor_call(p, m, ch4 // 4, _mmajor_kk(p))(g, lx, ly, wt)


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
    if p <= _ONEPASS_MAX_P:
        return _build_call_onepass(p, m, ch, _CB_ONEPASS)(g3, w)
    return _build_call(p, m, ch, jnp.dtype(g.dtype).name)(g3, w)
