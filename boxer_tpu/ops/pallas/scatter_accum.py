"""Pallas TPU scatter-accumulate kernel for deformable-sampling backward.

The d_value gradient of the quad-table gather is a duplicate-heavy
scatter-add (the reference resolves it with CUDA `atomicAdd`,
`box_attn_kernel.cuh:147-177`). XLA:TPU lowers such scatters to a sort-based
path measured at ~13.3 ns/row regardless of batching (row-count-bound, ~7x
above the HBM streaming floor). This kernel instead keeps (rows, lanes) f32
accumulator slices resident in VMEM per batch*head table slice, streams
payload chunks through VMEM and indices through SMEM, and serially
accumulates, DMA-ing each finished slice back to HBM.

Design notes (all measured on v5e):
- encoder tap indices are spatially sequential (row-major queries ->
  consecutive taps hit the same or adjacent table rows), so a naive
  accumulate chain serializes on read-after-write; the unrolled slots
  process STRIDED tap positions (t, t+C/4, ...) so in-flight accumulates
  touch distant rows, and small tables additionally get 4 independent
  accumulator copies (summed at the end);
- payload keeps the caller's dtype (bf16 in training): Mosaic cannot prove
  sublane alignment for dynamic-offset (1, 128) bf16 loads ((16, 128)
  tiling), so each iteration loads one ALIGNED (8, CH) block and extracts
  the 8 rows statically in registers — halving the payload relayout traffic
  and removing the separate f32 conversion pass;
- payload is NOT padded (the pad's dynamic-update-slice materialized an
  extra full copy); instead only the small idx array is padded, with padded
  taps routed to a sacrificial dump row past the live table rows, and the
  partial final payload block relies on Pallas' masked block reads.

Layout contract: taps grouped by bh slice; `idx` is RELATIVE to its slice.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# taps per kernel grid step; SMEM block = 4*CHUNK bytes, VMEM payload block =
# CHUNK*lanes*4 bytes
_CHUNK = 4096
_UNROLL = 4
# 4 accumulator copies when the table slice fits 4x in VMEM
_MULTI_ACC_MAX_ROWS = 4096
# f32 accumulator budget (bytes) across all copies + scratch; the 16 MiB
# scoped VMEM also holds the double-buffered payload/weight/out blocks.
# Overflow is a Mosaic compile error, observed at the reference-spec test
# widths (acc lanes 256/4096 x rb_pad ~3.9k rows x 4 copies).
_ACC_BUDGET = 12 * 1024 * 1024


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _acc_bytes(rb_pad: int, lanes: int) -> int:
    return (rb_pad + 8) * lanes * 4


def _pick_n_acc(rb_pad: int, lanes: int, extra_scratch: int = 0) -> int:
    """Accumulator copies: 4 when the striped copies fit the VMEM budget
    (RAW-hazard avoidance), else 1; caller must pre-check that even one
    copy fits (`pallas_scatter_supported(..., rb=...)`)."""
    if (rb_pad <= _MULTI_ACC_MAX_ROWS
            and _UNROLL * _acc_bytes(rb_pad, lanes) + extra_scratch
            <= _ACC_BUDGET):
        return _UNROLL
    return 1


def _make_kernel(nch: int, tpb: int, idx_at, payload_at):
    """Shared kernel body over `tpb` taps per grid block (a 32-multiple);
    `idx_at`/`payload_at` adapt ref indexing to the block rank of the chosen
    layout."""

    def kernel(idx_ref, payload_ref, out_ref, *accs_and_sem):
        accs = accs_and_sem[:-1]
        sem = accs_and_sem[-1]
        b = pl.program_id(0)
        c = pl.program_id(1)
        n_acc = len(accs)
        stride = tpb // _UNROLL

        @pl.when(c == 0)
        def _():
            for a in accs:
                a[:] = jnp.zeros_like(a)

        def body(i, _):
            # one ALIGNED (8, CH) payload block per iteration: bf16 rows
            # cannot be loaded at arbitrary sublane offsets ((16,128)
            # tiling), but an 8-row block at a provably-8-multiple offset
            # can; rows are then extracted statically in registers.
            # Slots stay strided so in-flight read-modify-writes touch rows
            # ~C/4 taps apart (and distinct accumulators when multi).
            for k in range(_UNROLL):
                base_t = pl.multiple_of(k * stride + i * 8, 8)
                block = payload_at(payload_ref, base_t).astype(jnp.float32)
                a = accs[k % n_acc]
                for r in range(8):
                    j = idx_at(idx_ref, base_t + r, b)
                    a[pl.ds(j, 1), :] = (a[pl.ds(j, 1), :]
                                         + block[r:r + 1, :])
            return 0

        jax.lax.fori_loop(0, stride // 8, body, 0)

        @pl.when(c == nch - 1)
        def _():
            if n_acc > 1:
                accs[0][:] = (accs[0][:] + accs[1][:]
                              + accs[2][:] + accs[3][:])
            dma = pltpu.make_async_copy(accs[0], out_ref.at[b], sem)
            dma.start()
            dma.wait()

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(bh: int, nt: int, rb_pad: int, ch: int,
                pay_dtype: str = "float32"):
    nch = pl.cdiv(nt, _CHUNK)
    acc_rows = rb_pad + 8          # last 8 rows = dump for padded taps
    n_acc = _pick_n_acc(rb_pad, ch)

    kernel = _make_kernel(
        nch, _CHUNK,
        idx_at=lambda ref, t, b: ref[t],
        payload_at=lambda ref, t: ref[0, pl.ds(t, 8), :])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, acc_rows, ch), jnp.float32),
        grid=(bh, nch),
        in_specs=[
            pl.BlockSpec((_CHUNK,), lambda b, c: (b * nch + c,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _CHUNK, ch), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((acc_rows, ch), jnp.float32)] * n_acc
        + [pltpu.SemaphoreType.DMA],
    )


def _pmajor_tpb(lq: int) -> int:
    """Taps per block for the p-major layout: whole lq rounded to a
    128-multiple when small (rank-1 SMEM blocks must be 128-multiples;
    decoder LQ=300 -> 384, 21.9% dump overhead) else _CHUNK."""
    return min(_CHUNK, _round_up(lq, 128))


@functools.lru_cache(maxsize=None)
def _build_call_pmajor(bh: int, p: int, lq: int, rb_pad: int, ch: int,
                       pay_dtype: str = "float32"):
    """p-major layout: idx (P, BH, LQ_pad) and payload (P, BH, LQ, CH), the
    folded-gather cotangent's NATIVE row order — the BlockSpec index maps walk
    (p, lq-chunk) per bh so no bh-grouping transpose of the (P*BH*LQ, CH)
    cotangent is ever materialized (measured ~17 ms/train-step of pure
    relayout copies at instance-attention scale)."""
    tpb = _pmajor_tpb(lq)
    nlc = pl.cdiv(lq, tpb)
    nch = p * nlc
    acc_rows = rb_pad + 8
    n_acc = _pick_n_acc(rb_pad, ch)

    # idx SMEM layout: Mosaic constrains blocks like VMEM tiles — a
    # (1, 1, tpb) block over (P, BH, LQ_pad) violates the sublane rule at
    # BH=8, and rank-1 flat blocks must match XLA's T(1024) tiling. So:
    # 1024-multiple tpb (big lq) -> flat 1-D blocks in grid order; small
    # tpb (decoder lq=300 -> 384) -> rank-3 (1, BH, tpb) full-bh block,
    # which satisfies the (8, 128) int32 tiling, and the kernel picks its
    # bh row via program_id.
    if tpb % 1024 == 0:
        idx_spec = pl.BlockSpec(
            (tpb,),
            lambda b, c: (((c // nlc) * bh + b) * nlc + c % nlc,),
            memory_space=pltpu.SMEM)
        idx_at = lambda ref, t, b: ref[t]
    else:
        idx_spec = pl.BlockSpec(
            (1, bh, tpb), lambda b, c: (c // nlc, 0, c % nlc),
            memory_space=pltpu.SMEM)
        idx_at = lambda ref, t, b: ref[0, b, t]

    kernel = _make_kernel(
        nch, tpb, idx_at=idx_at,
        payload_at=lambda ref, t: ref[0, 0, pl.ds(t, 8), :])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, acc_rows, ch), jnp.float32),
        grid=(bh, nch),
        in_specs=[
            idx_spec,
            pl.BlockSpec((1, 1, tpb, ch),
                         lambda b, c: (c // nlc, b, c % nlc, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((acc_rows, ch), jnp.float32)] * n_acc
        + [pltpu.SemaphoreType.DMA],
    )


def scatter_add_rows_pmajor(idx, payload, rb: int):
    """acc[b, idx[p, b, t]] += payload[p, b, t] with f32 accumulation, taps in
    the folded gather's native p-major order (no bh-grouping transpose).

    idx:     (P, BH, LQ) int32, entries RELATIVE to the bh slice, in [0, rb)
    payload: (P, BH, LQ, CH) float
    returns  (BH, rb, CH) f32
    """
    p, bh, lq = idx.shape
    ch = payload.shape[-1]
    tpb = _pmajor_tpb(lq)
    lq_pad = _round_up(lq, tpb)
    rb_pad = _round_up(rb, 8)

    idx_p = jnp.full((p, bh, lq_pad), rb_pad, jnp.int32)
    idx_p = jax.lax.dynamic_update_slice(idx_p, idx, (0, 0, 0))
    if tpb % 1024 == 0:
        idx_p = idx_p.reshape(-1)
    out = _build_call_pmajor(bh, p, lq, rb_pad, ch,
                             jnp.dtype(payload.dtype).name)(idx_p, payload)
    return out[:, :rb]


def _make_weighted_kernel(nch: int, tpb: int, ch: int,
                          idx_at=lambda ref, t, b: ref[t],
                          blk_at=lambda ref: ref[0]):
    """Weighted variant: the payload is the layer's SHARED (tpb, ch) d_out
    block plus a (4, tpb) corner-weight block; the 4*ch-lane quad-row
    cotangent [w0*g | w1*g | w2*g | w3*g] is expanded in VMEM — the host
    never materializes it (at encoder scale the (N, 4*ch) tensor comes out
    of XLA's combine column-major and costs ~24 ms/step of relayout copies
    feeding the plain kernel).

    Expansion trick (same as ops/pallas/combine_reduce.py): one MXU
    dot_general per chunk turns the lane-major (4, tpb) weights into a
    (tpb, 4*ch) corner-slice broadcast E, contracting over the 4-dim — a
    free transpose; the body then tiles each aligned 8-row g block across
    the 4 corner slices in registers and multiplies by E's rows.

    `idx_at(ref, t, b)` / `blk_at(ref)` abstract the block shapes so the flat
    and p-major builders share this body (their BlockSpecs differ only in
    leading singleton dims and the SMEM idx layout)."""

    def kernel(idx_ref, g_ref, w_ref, out_ref, *scratch):
        accs = scratch[:-2]
        p_scr = scratch[-2]
        sem = scratch[-1]
        b = pl.program_id(0)
        c = pl.program_id(1)
        n_acc = len(accs)
        stride = tpb // _UNROLL

        @pl.when(c == 0)
        def _():
            for a in accs:
                a[:] = jnp.zeros_like(a)

        # expand the whole chunk's quad-row payload ONCE into VMEM scratch:
        # E[t, c*ch+i] = w[c, t] via one MXU dot_general (contraction over
        # the leading 4 = free transpose of the lane-major weights), payload
        # = tiled g * E. Doing this per 8-row block instead serializes into
        # the accumulate chain (measured 97 vs 54 ms/step at encoder scale).
        cc = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 1) // ch
        sel = (cc == jj).astype(jnp.float32)
        e = jax.lax.dot_general(
            blk_at(w_ref), sel, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (tpb, 4ch)
        g = blk_at(g_ref).astype(jnp.float32)                 # (tpb, ch)
        p_scr[:] = jnp.concatenate([g, g, g, g], axis=1) * e

        def body(i, _):
            for k in range(_UNROLL):
                base_t = pl.multiple_of(k * stride + i * 8, 8)
                row = p_scr[pl.ds(base_t, 8), :]
                a = accs[k % n_acc]
                for r in range(8):
                    j = idx_at(idx_ref, base_t + r, b)
                    a[pl.ds(j, 1), :] = (a[pl.ds(j, 1), :] + row[r:r + 1, :])
            return 0

        jax.lax.fori_loop(0, stride // 8, body, 0)

        @pl.when(c == nch - 1)
        def _():
            if n_acc > 1:
                accs[0][:] = (accs[0][:] + accs[1][:]
                              + accs[2][:] + accs[3][:])
            dma = pltpu.make_async_copy(accs[0], out_ref.at[b], sem)
            dma.start()
            dma.wait()

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call_weighted(bh: int, nt: int, rb_pad: int, ch: int,
                         pay_dtype: str = "float32"):
    nch = pl.cdiv(nt, _CHUNK)
    acc_rows = rb_pad + 8
    n_acc = _pick_n_acc(rb_pad, 4 * ch, extra_scratch=_CHUNK * 4 * ch * 4)

    kernel = _make_weighted_kernel(nch, _CHUNK, ch)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, acc_rows, 4 * ch), jnp.float32),
        grid=(bh, nch),
        in_specs=[
            pl.BlockSpec((_CHUNK,), lambda b, c: (b * nch + c,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _CHUNK, ch), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, _CHUNK), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((acc_rows, 4 * ch), jnp.float32)] * n_acc
        + [pltpu.VMEM((_CHUNK, 4 * ch), jnp.float32),
           pltpu.SemaphoreType.DMA],
    )


def scatter_add_rows_weighted(idx, g, w4, rb: int):
    """acc[b, idx[b, t]] += concat_c(w4[b, c, t] * g[b, t]) with f32
    accumulation — the quad-row cotangent scatter with the corner expansion
    fused into the kernel.

    idx: (BH, NT) int32, entries RELATIVE to the bh slice, in [0, rb)
    g:   (BH, NT, CH) float — the shared tap cotangent rows
    w4:  (BH, 4, NT) f32 — per-corner weights
    returns (BH, rb, 4*CH) f32
    """
    bh, nt = idx.shape
    ch = g.shape[-1]
    nt_pad = _round_up(nt, _CHUNK)
    rb_pad = _round_up(rb, 8)

    idx_p = jnp.full((bh, nt_pad), rb_pad, jnp.int32)
    idx_p = jax.lax.dynamic_update_slice(idx_p, idx, (0, 0)).reshape(-1)
    # weights for padded taps are garbage-read from the masked tail block
    # into the dump rows; sliced off below (same contract as the plain call)
    out = _build_call_weighted(bh, nt, rb_pad, ch,
                               jnp.dtype(g.dtype).name)(idx_p, g, w4)
    return out[:, :rb]


@functools.lru_cache(maxsize=None)
def _build_call_pmajor_weighted(bh: int, p: int, lq: int, rb_pad: int,
                                ch: int, pay_dtype: str = "float32"):
    """p-major + weighted: idx (P, BH, LQ_pad), payload g (P, BH, LQ, CH)
    in the folded gather's native row order, weights (P, BH, 4, LQ); the
    4*ch quad-row cotangent is expanded in VMEM per chunk (see
    `_make_weighted_kernel`)."""
    tpb = _pmajor_tpb(lq)
    nlc = pl.cdiv(lq, tpb)
    nch = p * nlc
    acc_rows = rb_pad + 8
    n_acc = _pick_n_acc(rb_pad, 4 * ch, extra_scratch=tpb * 4 * ch * 4)

    if tpb % 1024 == 0:
        idx_spec = pl.BlockSpec(
            (tpb,),
            lambda b, c: (((c // nlc) * bh + b) * nlc + c % nlc,),
            memory_space=pltpu.SMEM)
        idx_at = lambda ref, t, b: ref[t]
    else:
        idx_spec = pl.BlockSpec(
            (1, bh, tpb), lambda b, c: (c // nlc, 0, c % nlc),
            memory_space=pltpu.SMEM)
        idx_at = lambda ref, t, b: ref[0, b, t]

    kernel = _make_weighted_kernel(nch, tpb, ch, idx_at=idx_at,
                                   blk_at=lambda ref: ref[0, 0])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, acc_rows, 4 * ch), jnp.float32),
        grid=(bh, nch),
        in_specs=[
            idx_spec,
            pl.BlockSpec((1, 1, tpb, ch),
                         lambda b, c: (c // nlc, b, c % nlc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, tpb),
                         lambda b, c: (c // nlc, b, 0, c % nlc),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((acc_rows, 4 * ch), jnp.float32)] * n_acc
        + [pltpu.VMEM((tpb, 4 * ch), jnp.float32),
           pltpu.SemaphoreType.DMA],
    )


def scatter_add_rows_pmajor_weighted(idx, g, w4, rb: int):
    """acc[b, idx[p, b, t]] += concat_c(w4[p, b, c, t] * g[p, b, t]), taps in
    the folded gather's native p-major order with in-kernel corner expansion.

    idx: (P, BH, LQ) int32, entries RELATIVE to the bh slice, in [0, rb)
    g:   (P, BH, LQ, CH) float — shared tap cotangent rows
    w4:  (P, BH, 4, LQ) f32 — per-corner bilinear weights
    returns (BH, rb, 4*CH) f32
    """
    p, bh, lq = idx.shape
    ch = g.shape[-1]
    tpb = _pmajor_tpb(lq)
    lq_pad = _round_up(lq, tpb)
    rb_pad = _round_up(rb, 8)

    # only idx is padded (padded taps -> dump rows); the payload/weight tail
    # blocks rely on Pallas' masked partial reads — garbage rows expand into
    # p_scr but their taps route to the dump rows and are sliced off
    idx_p = jnp.full((p, bh, lq_pad), rb_pad, jnp.int32)
    idx_p = jax.lax.dynamic_update_slice(idx_p, idx, (0, 0, 0))
    if tpb % 1024 == 0:
        idx_p = idx_p.reshape(-1)
    out = _build_call_pmajor_weighted(bh, p, lq, rb_pad, ch,
                                      jnp.dtype(g.dtype).name)(idx_p, g, w4)
    return out[:, :rb]


def scatter_add_rows(idx, payload, rb: int):
    """acc[b, idx[b, t]] += payload[b, t] with f32 accumulation.

    idx:     (BH, NT) int32, entries in [0, rb)
    payload: (BH, NT, CH) float
    returns  (BH, rb, CH) f32
    """
    bh, nt = idx.shape
    ch = payload.shape[-1]
    nt_pad = _round_up(nt, _CHUNK)
    rb_pad = _round_up(rb, 8)

    # padded taps -> dump row (accumulate whatever the masked tail block
    # reads into rows >= rb_pad, sliced off below)
    idx_p = jnp.full((bh, nt_pad), rb_pad, jnp.int32)
    idx_p = jax.lax.dynamic_update_slice(idx_p, idx, (0, 0)).reshape(-1)

    out = _build_call(bh, nt, rb_pad, ch,
                      jnp.dtype(payload.dtype).name)(idx_p, payload)
    return out[:, :rb]


# below this many taps per bh slice the kernel is overhead-bound (accumulator
# zero + DMA-out dominate; decoder-scale 2.4k-tap calls measured 33 ns/tap in
# Pallas vs ~13 ns XLA) — keep the XLA scatter there
_MIN_TAPS = 8192


def pallas_scatter_supported(ch: int, nt: int = 1 << 30,
                             rb: int = 0) -> bool:
    """The kernel needs the TPU backend, a 128-multiple lane count (quad
    rows at head_dim 32), enough taps to amortize per-call overhead, and —
    when the caller passes the table-slice row count `rb` — a single f32
    accumulator copy that fits the VMEM budget (wide-channel sweeps at
    reference-spec ch overflow the 16 MiB scoped VMEM as a Mosaic compile
    error). Everything else uses the XLA scatter.

    `ch` is the ACCUMULATOR lane count (the payload lanes for the plain
    kernels, 4x the payload lanes for the weighted/corner-expanding ones —
    call sites pass the expanded width).

    BOXER_FORCE_PALLAS_SCATTER=1 (tests only) takes the kernel path whenever
    the lane count and VMEM budget allow, regardless of backend/size —
    combined with the Pallas interpreter this lets the custom-VJP -> kernel
    integration (relative-index bases, payload reshapes, corner-weight
    order) run chip-independently."""
    import os

    if ch % 128 != 0:
        return False
    if rb and (_acc_bytes(_round_up(rb, 8), ch) + _CHUNK * ch * 4
               > _ACC_BUDGET):
        return False
    if os.environ.get("BOXER_FORCE_PALLAS_SCATTER"):
        return True
    return jax.default_backend() == "tpu" and nt >= _MIN_TAPS
