"""Multi-scale box attention / instance attention core ops (XLA path).

These are the TPU-native equivalents of the reference CUDA kernels
(`e2edet/module/ops/src/box_attn/box_attn_kernel.cuh` and
`src/instance_attn/instance_attn_kernel.cuh`). Contract parity
(reference `box_attn.cu:30-70`, `instance_attn.cu:46-79`):

  box_attention(value (B,S,H,Ch), shapes ((H1,W1),...), loc (B,Lq,H,L,P,2),
                weight (B,Lq,H,L,P)) -> (B, Lq, H*Ch)

  instance_attention(value, shapes, loc (...,P=k*k,2), spatial_w (B,Lq,H,L,P),
                     level_w (B,Lq,H,L,P)) -> (out (B,Lq,H*Ch),
                                               mask_out (B,Lq,k,k,H*Ch))

Sampling convention: locations normalized to [0,1]; pixel coords
`x_im = loc_x * W - 0.5` with zero padding outside — identical to
`F.grid_sample(..., align_corners=False)` at grid `2*loc - 1`
(validated against torch in tests/test_box_attention.py, mirroring the
reference test `tests/box_attn_test.py:33,70`).

Design (TPU-first, not a CUDA translation):
- The reference launches one CUDA thread per (b, q, head, channel) and walks
  levels×points with atomicAdd-based backward. On TPU the same math is a
  quad-table vectorized gather (ONE fetch per tap carrying all 4 bilinear
  corners in a 128-lane row) with fused per-tap accumulation — all
  fixed-shape, differentiated by XLA AD (scatter-add for grad_value) or the
  analytic custom VJP below. This XLA formulation *is* the TPU-native kernel:
  Mosaic/Pallas cannot express wide dynamic gathers (measured analysis in
  docs/TPU_PERFORMANCE.md); Pallas is used where it wins — the dense
  attention sites (`boxer_tpu/ops/pallas/flash_attention.py`).
- Heads are folded into the batch dim so every level is one gather.
- Accumulation is fp32 regardless of input dtype (parity with the reference's
  `custom_fwd(cast_inputs=float32)` pinning, `ops/box_attention_func.py:11`).
"""

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from boxer_tpu.utils.general import level_start_index

Shapes = Tuple[Tuple[int, int], ...]

# Fused inference combine implementation: "pmajor" (default — the Pallas
# accumulator-carry kernel), "slices" (direct 4P-term lane-slice
# accumulation, no weight stack, no kernel) or "mmajor" (streaming kernel
# experiment). Output-identical. "slices" WINS standalone (0.225 ms vs the
# kernel's 0.303 at M=8*15200) but LOSES in-model: XLA materializes + COPIES
# each gather output before the slice chain consumes it (+11.6 ms/step of
# copies, trace-verified, with or without an optimization_barrier — both
# compile to the identical module), while the Pallas call takes the gather
# result as-is. See docs/TPU_PERFORMANCE.md round-5 notes.
_COMBINE_IMPL = os.environ.get("BOXER_COMBINE", "pmajor")


def _corner_indices_and_weights(loc_l, h, w, base):
    """Bilinear corner global indices + weights for one level.

    loc_l: (BH, N, 2) in [0,1]; base: (BH, 1) global row offset of this level
    in the flattened (BH*S, Ch) value table.
    Returns idx (4, BH, N) int32 into the flat table (out-of-bounds corners
    clamped) and weights (4, BH, N) fp32 (zeroed outside).
    """
    x = loc_l[..., 0].astype(jnp.float32) * w - 0.5
    y = loc_l[..., 1].astype(jnp.float32) * h - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xi, yi, wgt):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = base + jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        return idx, jnp.where(valid, wgt, 0.0)

    i00, w00 = corner(x0i, y0i, (1.0 - lx) * (1.0 - ly))
    i01, w01 = corner(x0i + 1, y0i, lx * (1.0 - ly))
    i10, w10 = corner(x0i, y0i + 1, (1.0 - lx) * ly)
    i11, w11 = corner(x0i + 1, y0i + 1, lx * ly)
    return (jnp.stack([i00, i01, i10, i11]),
            jnp.stack([w00, w01, w10, w11]))


def _gather_level_samples(value_l, loc_l):
    """Bilinear-sample one level for all (batch*head) slices.

    Slow-path helper kept for the instance-attention dual-output op.
    value_l: (BH, Hl, Wl, Ch); loc_l: (BH, N, 2) in [0,1] -> (BH, N, Ch) fp32.

    TPU note: indices are globalized so the lookup is ONE flat `jnp.take`
    (embedding-style gather, XLA's fast path) instead of a batched
    take_along_axis (which lowers to a slow per-batch gather on TPU).
    """
    bh, h, w, ch = value_l.shape
    n = loc_l.shape[1]
    base = (jnp.arange(bh, dtype=jnp.int32) * (h * w))[:, None]
    idx, wgt = _corner_indices_and_weights(loc_l, h, w, base)
    flat = value_l.reshape(bh * h * w, ch)
    vals = jnp.take(flat, idx.reshape(-1), axis=0, mode="clip").astype(jnp.float32)
    vals = vals.reshape(4, bh, n, ch)
    return (vals * wgt[..., None]).sum(axis=0)


def _build_quad_tables(value, shapes):
    """Pack each level's 2x2 pixel neighborhoods into 4*Ch-wide rows.

    value: (B, S, H, Ch) flattened levels. Returns (table (R, 4*Ch), bases)
    where table row r = [V[y,x], V[y,x+1], V[y+1,x], V[y+1,x+1]] of the
    zero-border-padded level image, R = sum over levels of
    BH*(Hl+1)*(Wl+1), and bases[li] is each level's starting row for bh=0
    with stride (Hl+1)*(Wl+1) per bh slice laid out level-major.

    Why: XLA:TPU's vectorized gather is fetch-count-bound (~2ns/row
    regardless of row width up to 128 lanes), so fetching all four bilinear
    corners in ONE 4*Ch-wide row quarters the dominant cost of the op. The
    1-px zero border makes edge taps exact without per-corner masking.
    """
    b, s, nh, ch = value.shape
    bh = b * nh
    starts = level_start_index(shapes)
    v = value.transpose(0, 2, 1, 3).reshape(bh, s, ch)

    # NOTE: tables stay SEPARATE per level — XLA:TPU vectorized-gather cost
    # grows with table row count (~0.36 ms/161k fetches at <=64k rows but
    # 1.09 ms at 680k rows, measured), so each take should index the smallest
    # possible table.
    tables = []
    for li, (hl, wl) in enumerate(shapes):
        lvl = v[:, starts[li]:starts[li] + hl * wl].reshape(bh, hl, wl, ch)
        # zero border: pad to (hl+2, wl+2), quads indexed over (hl+1, wl+1)
        lvl = jnp.pad(lvl, ((0, 0), (1, 1), (1, 1), (0, 0)))
        q = jnp.concatenate([
            lvl[:, :-1, :-1], lvl[:, :-1, 1:],
            lvl[:, 1:, :-1], lvl[:, 1:, 1:],
        ], axis=-1)  # (BH, hl+1, wl+1, 4*Ch)
        tables.append(q.reshape(bh * (hl + 1) * (wl + 1), 4 * ch))
    return tables


@functools.lru_cache(maxsize=None)
def _take_rows_vjp(stride: int, bh: int, pmajor_p: int = 0):
    """`jnp.take` of quad-table rows with a Pallas-backed d_table scatter.

    Surgical custom VJP: the forward is exactly the vectorized take (fast on
    TPU); only the backward's scatter-add is replaced — XLA lowers it to a
    sort-based path at ~13.3 ns/row while the Pallas VMEM-resident
    accumulator runs ~5 ns/tap (ops/pallas/scatter_accum.py). Everything
    else (corner-combine backward, d_loc/d_weight chains) stays on XLA AD,
    which is already efficient.

    idx is (BH, N) global rows (bh-grouped) when pmajor_p == 0, else
    (P, BH, LQ) p-major (the folded large-P layout); the backward reorders
    the cotangent rows to bh-grouped for the kernel.
    """

    @jax.custom_vjp
    def take_rows(table, idx):
        return jnp.take(table, idx.reshape(-1), axis=0, mode="clip")

    def fwd(table, idx):
        # zero-size carrier keeps the table dtype in the residuals (residuals
        # must be arrays, not dtype objects)
        return take_rows(table, idx), (idx, jnp.zeros((0,), table.dtype))

    def bwd(res, g):
        idx, dtype_carrier = res
        tdtype = dtype_carrier.dtype
        ch = g.shape[-1]
        from boxer_tpu.ops.pallas.scatter_accum import (
            pallas_scatter_supported,
            scatter_add_rows,
        )

        if pallas_scatter_supported(ch, idx.size // bh, rb=stride):
            base = (jnp.arange(bh, dtype=jnp.int32) * stride)
            if pmajor_p:
                # p-major kernel layout: the cotangent is consumed in its
                # native (p, bh, lq) row order — no bh-grouping transpose
                from boxer_tpu.ops.pallas.scatter_accum import (
                    scatter_add_rows_pmajor)

                p, _, lq = idx.shape
                idx_rel = idx - base[None, :, None]
                d = scatter_add_rows_pmajor(
                    idx_rel, g.reshape(p, bh, lq, ch), stride)
            else:
                idx_rel = idx.reshape(bh, -1) - base[:, None]
                d = scatter_add_rows(idx_rel, g.reshape(bh, -1, ch), stride)
            d_table = d.reshape(bh * stride, ch).astype(tdtype)
        else:
            d_table = (jnp.zeros((bh * stride, ch), jnp.float32)
                       .at[idx.reshape(-1)].add(g.astype(jnp.float32))
                       .astype(tdtype))
        return d_table, None

    take_rows.defvjp(fwd, bwd, optimize_remat=True)
    return take_rows


def _lane_tree_sum(x):
    """(N, ch) -> (N,) lane-TREE reduction: every step an aligned lane slice
    + add. RULE 4: a jnp.sum over lanes fuses the producing gather into a
    multiply-reduce loop fusion, demoting it to a serial emitter (measured
    44.7 ms/step vs 5.8 for the tree arrangement)."""
    while x.shape[-1] > 1:
        w = x.shape[-1]
        if w % 2:                        # non-pow2 ch (CPU fallback tests)
            x = jnp.pad(x, ((0, 0), (0, 1)))
            w += 1
        x = x[:, :w // 2] + x[:, w // 2:w]
    return x[:, 0]


@functools.lru_cache(maxsize=None)
def _sample_taps_vjp(stride: int, bh: int):
    """take + corner-combine of ONE tap with a weighted Pallas d_table
    scatter: sample(table, idx, w4) = sum_c w4[..., c, :] * take(table,
    idx)[:, c*ch:(c+1)*ch].

    Two layouts, selected by idx rank at trace time:
      - flat (per-tap path):  idx (BH, LQ),    w4 (BH, 4, LQ)
      - p-major (folded large-P instance path): idx (P, BH, LQ),
        w4 (P, BH, 4, LQ)
    Returns the combined (N, ch) f32 tap contribution in idx's row order.

    Why the wider VJP boundary (vs `_take_rows_vjp`, which wraps only the
    take): leaving the combine on XLA AD materializes the (N, 4*ch) quad-row
    cotangent, which XLA lays out column-major at the combine and must then
    reshape+copy row-major into the scatter kernel — trace-measured ~24
    ms/train-step of pure data formatting at encoder scale. Here the
    backward hands the kernel the SHARED (N, ch) tap cotangent plus the
    corner weights and the kernel expands the quad rows in VMEM
    (ops/pallas/scatter_accum.py:_make_weighted_kernel). d_w4 is recomputed
    from a second take (the backward already recomputes forward gathers
    under remat, so the fetch count is unchanged) consumed by the lane-tree
    reduction (`_lane_tree_sum`).
    """

    def _combine(vals, w4, ch):
        wc = lambda c: w4[..., c, :].reshape(-1, 1)       # (N, 1)
        return (vals[:, 0 * ch:1 * ch].astype(jnp.float32) * wc(0)
                + vals[:, 1 * ch:2 * ch].astype(jnp.float32) * wc(1)
                + vals[:, 2 * ch:3 * ch].astype(jnp.float32) * wc(2)
                + vals[:, 3 * ch:4 * ch].astype(jnp.float32) * wc(3))

    @jax.custom_vjp
    def sample_taps(table, idx, w4):
        vals = jnp.take(table, idx.reshape(-1), axis=0, mode="clip")
        return _combine(vals, w4, table.shape[-1] // 4)

    def fwd(table, idx, w4):
        return sample_taps(table, idx, w4), (table, idx, w4)

    def bwd(res, g):
        table, idx, w4 = res
        ch4 = table.shape[-1]
        ch = ch4 // 4
        pmajor = idx.ndim == 3
        lq = idx.shape[-1]
        p = idx.shape[0] if pmajor else 1
        g = g.astype(jnp.float32)

        vals = jnp.take(table, idx.reshape(-1), axis=0, mode="clip")
        if not pmajor:
            # d_w4[t, c] = <vals[t, c*ch:(c+1)*ch], g[t]>: ONE MXU dot
            # against a block-indicator matrix instead of 4 lane-tree
            # reductions. The gather's direct consumer stays elementwise
            # (RULE 4); the dot reads the materialized product.
            # Trace-measured at ENCODER scale (flat layout, N=161k): the
            # lane trees came out column-major and dragged ~28 ms/step of
            # transposed copies + convert-multiply chains; the dot removes
            # them (det train 253 -> 227 ms/step).
            g4 = jnp.concatenate([g, g, g, g], axis=1)       # (N, 4*ch) f32
            prod = vals.astype(jnp.float32) * g4
            lane = jax.lax.broadcasted_iota(jnp.int32, (ch4, 4), 0) // ch
            corner = jax.lax.broadcasted_iota(jnp.int32, (ch4, 4), 1)
            sel = (lane == corner).astype(jnp.float32)       # (4*ch, 4)
            parts4 = jax.lax.dot_general(
                prod, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (N, 4)
            d_w = parts4.reshape(bh, lq, 4).transpose(0, 2, 1)  # (BH, 4, LQ)
        else:
            # p-major (instance, N=470k): the dot formulation makes XLA
            # materialize vals/g in column-major to feed the MXU and forks
            # g's layout between the dot and the scatter payload —
            # trace-measured +40 ms/step of pure relayouts at segm-train
            # scale. The lane-tree reduction keeps everything row-major
            # here (RULE 4: aligned lane slices + adds only).
            parts = [_lane_tree_sum(
                vals[:, c * ch:(c + 1) * ch].astype(jnp.float32) * g)
                for c in range(4)]
            d_w = jnp.stack([x.reshape(p, bh, lq) for x in parts],
                            axis=2)                          # (P, BH, 4, LQ)

        from boxer_tpu.ops.pallas.scatter_accum import (
            pallas_scatter_supported,
            scatter_add_rows_pmajor_weighted,
            scatter_add_rows_weighted,
        )

        if pallas_scatter_supported(ch4, p * lq, rb=stride):
            base = (jnp.arange(bh, dtype=jnp.int32) * stride)
            if pmajor:
                d = scatter_add_rows_pmajor_weighted(
                    idx - base[None, :, None],
                    g.reshape(p, bh, lq, ch), w4, stride)
            else:
                d = scatter_add_rows_weighted(
                    idx.reshape(bh, -1) - base[:, None],
                    g.reshape(bh, lq, ch), w4, stride)
            d_table = d.reshape(bh * stride, ch4).astype(table.dtype)
        else:
            wc = lambda c: w4[..., c, :].reshape(-1, 1)
            d_vals = jnp.concatenate(
                [g * wc(c) for c in range(4)], axis=-1)
            d_table = (jnp.zeros((bh * stride, ch4), jnp.float32)
                       .at[idx.reshape(-1)].add(d_vals)
                       .astype(table.dtype))
        return d_table, None, d_w

    sample_taps.defvjp(fwd, bwd, optimize_remat=True)
    return sample_taps


# p-major entry point is the same rank-dispatching callable
_sample_taps_pmajor_vjp = _sample_taps_vjp


def _box_attention_qminor_impl(value, shapes: Shapes, gx, gy, attn_weight):
    """Multi-scale deformable box attention — quad-table fast path.

    TPU design (see _build_quad_tables): ONE flat vectorized gather fetches
    all 4 bilinear corners per tap; all per-tap tensors are query-minor
    (B, H, L, P, LQ) so nothing hits the (8,128)-tile padding bloat of
    (..., P, 2)-shaped layouts.

    value:       (B, S, H, Ch)
    gx, gy:      (B, H, L, P, LQ) normalized [0,1] sample coordinates
    attn_weight: (B, H, L, P, LQ) fp32, softmax-normalized over (L, P)
    returns      (B, LQ, H*Ch) in value.dtype
    """
    b, s, nh, ch = value.shape
    _, _, nl, npt, lq = gx.shape
    assert nl == len(shapes)
    bh = b * nh

    tables = _build_quad_tables(value, shapes)
    gx = gx.reshape(bh, nl, npt, lq).astype(jnp.float32)
    gy = gy.reshape(bh, nl, npt, lq).astype(jnp.float32)
    aw = attn_weight.reshape(bh, nl, npt, lq).astype(jnp.float32)
    h_idx = jnp.arange(nh, dtype=jnp.int32)[:, None]

    # One take + fused corner-reduce + accumulate per (level, point) tap.
    # CRITICAL layout/lowering notes (measured on v5e):
    # - each take's consumer is lane slices of its native (N, 4*Ch) layout —
    #   any reshape to (..., 4, Ch) or strided multi-axis reduce after the
    #   gather demotes it to a ~6x slower serial while-loop;
    # - per-tap accumulation keeps the whole chain elementwise, so XLA fuses
    #   take -> corner mul -> add without materializing big intermediates;
    # - no stacks/concats of index tensors (they lower to dynamic-update-
    #   slice copies) and no (bh,lq)-major transposes (tile-crossing copies);
    # - the whole accumulation runs PER BATCH ITEM with per-b table slices
    #   (gather cost grows with table row count — 0.36 ms/161k fetches at
    #   <=64k rows vs 1.09 ms at 680k) and ONE concat at the very end
    #   (per-take concats lowered to 80 ms/model of dynamic-update-slices
    #   at bs=4).
    out_pieces = []
    for bi in range(b):
        sl = slice(bi * nh, (bi + 1) * nh)
        out_b = jnp.zeros((nh * lq, ch), jnp.float32)
        for li, (hl, wl) in enumerate(shapes):
            stride = (hl + 1) * (wl + 1)
            base = h_idx[:, None] * stride            # (H, 1, 1)
            table = (tables[li] if b == 1 else jax.lax.slice_in_dim(
                tables[li], bi * nh * stride, (bi + 1) * nh * stride))
            x = gx[sl, li] * wl - 0.5                 # (H, P, LQ)
            y = gy[sl, li] * hl - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            lx = x - x0
            ly = y - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            # whole-tap validity; the zero border makes edge taps exact
            valid = ((x0i >= -1) & (x0i <= wl - 1)
                     & (y0i >= -1) & (y0i <= hl - 1))
            xq = jnp.clip(x0i + 1, 0, wl)
            yq = jnp.clip(y0i + 1, 0, hl)
            idx = base + yq * (wl + 1) + xq
            w_tap = jnp.where(valid, aw[sl, li], 0.0)

            sample = _sample_taps_vjp(stride, nh)
            for p in range(npt):
                w4 = jnp.stack([
                    (1.0 - lx[:, p]) * (1.0 - ly[:, p]) * w_tap[:, p],
                    lx[:, p] * (1.0 - ly[:, p]) * w_tap[:, p],
                    (1.0 - lx[:, p]) * ly[:, p] * w_tap[:, p],
                    lx[:, p] * ly[:, p] * w_tap[:, p],
                ], axis=1)                                # (H, 4, LQ)
                out_b = out_b + sample(table, idx[:, p], w4)
        out_pieces.append(out_b)

    out = out_pieces[0] if b == 1 else jnp.concatenate(out_pieces, axis=0)
    return out.astype(value.dtype).reshape(b, nh, lq, ch)


def _smallest_factor(n: int) -> int:
    for f in range(2, int(n ** 0.5) + 1):
        if n % f == 0:
            return f
    return n


def _reduce_pmajor(x, n: int, m: int):
    """Sum a (n*m, ch) p-major tensor over its leading n blocks -> (m, ch).

    Tree reduction by repeated factor-f slicing: every step is a tile-aligned
    row-slice + elementwise add (m is kept a multiple of 8 by callers), so the
    whole reduce is fused elementwise traffic — no reshape of the gather's
    consumer (which would demote the gather to a serial while-loop) and no
    strided multi-axis reduce.
    """
    while n > 1:
        f = 2 if n % 2 == 0 else _smallest_factor(n)
        blk = n // f
        x = sum(x[i * blk * m:(i + 1) * blk * m] for i in range(f))
        n = blk
    return x


def _box_attention_qminor_folded(value, shapes: Shapes, gx, gy, attn_weight,
                                 fused: bool = False):
    """Large-P fast path: ONE gather per level with all taps folded in.

    For instance-attention-sized taps (P = k*k = 196) the per-tap python loop
    emits L*P tiny gathers (784/layer) and goes op-overhead-bound (~6 ms/layer
    measured at decoder scale). Here each level is ONE vectorized take of
    BH*P*LQ rows (~1.6 ns/row, the emitter floor), consumed by the corner
    mul-add fusion and a p-major tree reduce.

    fused=True (inference only — no AD rule) replaces the combine + tree
    reduce with the Pallas fused kernel (`ops/pallas/combine_reduce.py`):
    the P-accumulation stays in VMEM f32 scratch, no (P*M, Ch) tap tensor is
    materialized (measured 1.418 vs 1.668 ms per encoder layer-level).

    Row order is (p, b, h, lq) so the P-reduce is leading-axis slicing.
    Same contract as `_box_attention_qminor_impl`.

    Like the per-tap path, the takes run PER BATCH ITEM against per-b table
    slices: gather cost grows with table row count (rule 6,
    docs/TPU_PERFORMANCE.md), so at bs=4 one bh-concatenated take costs ~3x
    the four per-b takes. At b == 1 this emits the exact same graph as the
    single-loop formulation.
    """
    from boxer_tpu.ops.pallas.combine_reduce import pallas_combine_supported

    b, s, nh, ch = value.shape
    _, _, nl, npt, lq = gx.shape
    assert nl == len(shapes)
    bh = b * nh
    mb = nh * lq

    tables = _build_quad_tables(value, shapes)
    gx = gx.reshape(bh, nl, npt, lq).astype(jnp.float32)
    gy = gy.reshape(bh, nl, npt, lq).astype(jnp.float32)
    aw = attn_weight.reshape(bh, nl, npt, lq).astype(jnp.float32)
    h_idx = jnp.arange(nh, dtype=jnp.int32)[None, :, None]    # (1, H, 1)

    out_pieces = []
    for bi in range(b):
        sl = slice(bi * nh, (bi + 1) * nh)
        out_b = jnp.zeros((mb, ch), jnp.float32)
        for li, (hl, wl) in enumerate(shapes):
            stride = (hl + 1) * (wl + 1)
            table = (tables[li] if b == 1 else jax.lax.slice_in_dim(
                tables[li], bi * nh * stride, (bi + 1) * nh * stride))

            if fused and _COMBINE_IMPL == "mmajor" \
                    and pallas_combine_supported(ch):
                # m-major streaming combine (round 5): gather rows ordered
                # (h, lq, p) so the Pallas kernel reduces each output's P
                # taps inside one block — no accumulator carry, one output
                # write, corner weights formed in-kernel from raw lx/ly/w
                # (kills the (P, 4, M) stack formatting)
                from boxer_tpu.ops.pallas.combine_reduce import (
                    fused_combine_reduce_mmajor)

                x = gx[sl, li].transpose(0, 2, 1) * wl - 0.5  # (H, LQ, P)
                y = gy[sl, li].transpose(0, 2, 1) * hl - 0.5
                w_l = aw[sl, li].transpose(0, 2, 1)
                x0 = jnp.floor(x)
                y0 = jnp.floor(y)
                lx = x - x0
                ly = y - y0
                x0i = x0.astype(jnp.int32)
                y0i = y0.astype(jnp.int32)
                valid = ((x0i >= -1) & (x0i <= wl - 1)
                         & (y0i >= -1) & (y0i <= hl - 1))
                xq = jnp.clip(x0i + 1, 0, wl)
                yq = jnp.clip(y0i + 1, 0, hl)
                idx = (jnp.arange(nh, dtype=jnp.int32)[:, None, None]
                       * stride + yq * (wl + 1) + xq)         # (H, LQ, P)
                w_tap = jnp.where(valid, w_l, 0.0)
                vals = jnp.take(table, idx.reshape(-1), axis=0,
                                mode="clip")                  # (Mb*P, 4Ch)
                out_b = out_b + fused_combine_reduce_mmajor(
                    vals, lx.reshape(1, -1), ly.reshape(1, -1),
                    w_tap.reshape(1, -1), npt, mb)
                continue

            base = h_idx * stride
            # p-major layout: (H, P, LQ) -> (P, H, LQ); small tensors, cheap
            x = jnp.swapaxes(gx[sl, li], 0, 1) * wl - 0.5
            y = jnp.swapaxes(gy[sl, li], 0, 1) * hl - 0.5
            w_l = jnp.swapaxes(aw[sl, li], 0, 1)
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            lx = x - x0
            ly = y - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            valid = ((x0i >= -1) & (x0i <= wl - 1)
                     & (y0i >= -1) & (y0i <= hl - 1))
            xq = jnp.clip(x0i + 1, 0, wl)
            yq = jnp.clip(y0i + 1, 0, hl)
            idx = base + yq * (wl + 1) + xq                   # (P, H, LQ)
            w_tap = jnp.where(valid, w_l, 0.0)

            if fused and _COMBINE_IMPL != "pmajor" and npt <= 8:
                # round-5 default for small P: direct 4P-term lane-slice
                # accumulation into the f32 output — no (P, 4, M) weight
                # stack, no kernel call. Trace-measured 0.225 ms vs the
                # pmajor kernel's 0.303 at encoder level scale (M=8*15200),
                # and the in-model kernel call also paid the w4 stack
                # formatting this path deletes.
                # lane slices + elementwise are rule-4-safe gather consumers
                # (same consumption pattern as the unfused path below); an
                # optimization_barrier here forces a 165 MB copy per level
                # (trace-measured +12 ms/step) and is NOT needed
                vals = jnp.take(table, idx.reshape(-1), axis=0,
                                mode="clip")                  # (P*Mb, 4Ch)
                w00 = (1.0 - lx) * (1.0 - ly) * w_tap         # (P, H, LQ)
                w01 = lx * (1.0 - ly) * w_tap
                w10 = (1.0 - lx) * ly * w_tap
                w11 = lx * ly * w_tap
                for pi in range(npt):
                    rows = slice(pi * mb, (pi + 1) * mb)
                    for ci, wc in enumerate((w00, w01, w10, w11)):
                        out_b = out_b + (
                            vals[rows, ci * ch:(ci + 1) * ch]
                            .astype(jnp.float32) * wc[pi].reshape(mb, 1))
                continue

            if fused and pallas_combine_supported(ch):
                from boxer_tpu.ops.pallas.combine_reduce import (
                    _ONEPASS_MAX_P, fused_combine_reduce,
                    fused_combine_reduce_raw)

                # plain take (no VJP machinery — this path is forward-only)
                vals = jnp.take(table, idx.reshape(-1), axis=0,
                                mode="clip")                  # (P*Mb, 4Ch)
                if npt <= _ONEPASS_MAX_P:
                    # small P: single-pass kernel with IN-KERNEL corner
                    # weight formation — no (P, 4, M) stack round trip
                    out_b = out_b + fused_combine_reduce_raw(
                        vals, lx.reshape(npt, mb), ly.reshape(npt, mb),
                        w_tap.reshape(npt, mb), npt, mb)
                    continue
                w4 = jnp.stack([
                    (1.0 - lx) * (1.0 - ly) * w_tap,
                    lx * (1.0 - ly) * w_tap,
                    (1.0 - lx) * ly * w_tap,
                    lx * ly * w_tap,
                ], axis=1).reshape(npt, 4, mb)                # (P, 4, Mb)
                out_b = out_b + fused_combine_reduce(vals, w4, npt, mb)
                continue

            vals = _take_rows_vjp(stride, nh, pmajor_p=npt)(
                table, idx)                                   # (P*Mb, 4Ch)
            w00 = ((1.0 - lx) * (1.0 - ly) * w_tap).reshape(-1, 1)
            w01 = (lx * (1.0 - ly) * w_tap).reshape(-1, 1)
            w10 = ((1.0 - lx) * ly * w_tap).reshape(-1, 1)
            w11 = (lx * ly * w_tap).reshape(-1, 1)
            # per-tap corner combine in fp32 registers; the materialized tap
            # tensor and the tree reduce stay in the value dtype (halves HBM
            # traffic for bf16 inference; fp32 inputs keep full-precision
            # accum)
            taps = (vals[:, 0 * ch:1 * ch].astype(jnp.float32) * w00
                    + vals[:, 1 * ch:2 * ch].astype(jnp.float32) * w01
                    + vals[:, 2 * ch:3 * ch].astype(jnp.float32) * w10
                    + vals[:, 3 * ch:4 * ch].astype(jnp.float32) * w11
                    ).astype(value.dtype)
            out_b = out_b + _reduce_pmajor(taps, npt, mb).astype(jnp.float32)
        out_pieces.append(out_b)

    out = out_pieces[0] if b == 1 else jnp.concatenate(out_pieces, axis=0)
    return out.astype(value.dtype).reshape(b, nh, lq, ch)


# taps above this go through the folded single-take path when the caller
# doesn't pass an explicit `fold` flag. Folding P=4 is a measured FORWARD win
# (det inference 60.5 -> 58.4 ms/img) but a backward regression (train step
# 277 -> 327 ms: the folded table's cotangent scatter is costlier than 4
# per-tap scatters), so the model passes fold=True only on its inference
# path and the train-time default stays per-tap below 8.
_FOLD_TAP_THRESHOLD = 8

import os as _os

if "BOXER_FOLD_THRESHOLD" in _os.environ:        # perf-experiment override
    _FOLD_TAP_THRESHOLD = int(_os.environ["BOXER_FOLD_THRESHOLD"])


def box_attention(value, shapes: Shapes, sampling_loc, attn_weight):
    """Multi-scale deformable box attention (reference-contract wrapper).

    value:        (B, S, H, Ch) — S = sum(Hl*Wl) flattened multi-level values
    shapes:       static ((H1,W1), ..., (HL,WL))
    sampling_loc: (B, Lq, H, L, P, 2) in [0,1]
    attn_weight:  (B, Lq, H, L, P), softmax-normalized over (L, P)
    returns       (B, Lq, H*Ch) in value.dtype

    Transposes the reference-layout inputs into the query-minor fast path
    (modules call `box_attention_qminor` directly and never build the
    (..., P, 2)-shaped tensors at all).
    """
    gx = jnp.moveaxis(sampling_loc[..., 0], 1, -1)   # (B, H, L, P, LQ)
    gy = jnp.moveaxis(sampling_loc[..., 1], 1, -1)
    aw = jnp.moveaxis(attn_weight, 1, -1)
    return box_attention_qminor(value, shapes, gx, gy, aw)


def instance_attention_qminor(value, shapes: Shapes, gx, gy, spatial_weight,
                              level_weight, kernel_size: int,
                              raw: bool = False):
    """Fused instance attention, query-minor fast path.

    gx/gy/spatial_weight/level_weight: (B, H, L, P=k*k, LQ).
    returns (out (B,LQ,H*Ch) — or (B,H,LQ,Ch) when raw=True —
    and mask_out (B,LQ,k,k,H*Ch)).

    TPU design: one vectorized take per level with taps folded into the row
    axis (p-major), dual accumulation — spatial-weighted taps tree-reduced
    over P for the attention output, level-weighted taps accumulated at full
    (P*M, Ch) for the k×k mask RoI. Avoids materializing the (L, BH, P, LQ,
    Ch) stack the previous formulation paid ~8 ms/call for (dynamic-update-
    slice concat + tile-crossing reshapes).
    """
    b, s, nh, ch = value.shape
    _, _, nl, npt, lq = gx.shape
    k = kernel_size
    assert npt == k * k
    bh = b * nh
    mb = nh * lq

    tables = _build_quad_tables(value, shapes)
    gx = gx.reshape(bh, nl, npt, lq).astype(jnp.float32)
    gy = gy.reshape(bh, nl, npt, lq).astype(jnp.float32)
    sw = spatial_weight.reshape(bh, nl, npt, lq).astype(jnp.float32)
    lw = level_weight.reshape(bh, nl, npt, lq).astype(jnp.float32)
    h_idx = jnp.arange(nh, dtype=jnp.int32)[None, :, None]    # (1, H, 1)

    # per-batch-item table slices (rule 6: gather cost grows with table row
    # count); at b == 1 this is the same graph as a single flat loop
    out_pieces, mask_pieces = [], []
    for bi in range(b):
        slb = slice(bi * nh, (bi + 1) * nh)
        out_b = jnp.zeros((mb, ch), jnp.float32)
        mask_b = jnp.zeros((npt * mb, ch), jnp.float32)
        for li, (hl, wl) in enumerate(shapes):
            stride = (hl + 1) * (wl + 1)
            table = (tables[li] if b == 1 else jax.lax.slice_in_dim(
                tables[li], bi * nh * stride, (bi + 1) * nh * stride))
            base = h_idx * stride
            x = jnp.swapaxes(gx[slb, li], 0, 1) * wl - 0.5    # (P, H, LQ)
            y = jnp.swapaxes(gy[slb, li], 0, 1) * hl - 0.5
            sw_l = jnp.swapaxes(sw[slb, li], 0, 1)
            lw_l = jnp.swapaxes(lw[slb, li], 0, 1)
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            lx = x - x0
            ly = y - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            valid = ((x0i >= -1) & (x0i <= wl - 1)
                     & (y0i >= -1) & (y0i <= hl - 1)).astype(jnp.float32)
            xq = jnp.clip(x0i + 1, 0, wl)
            yq = jnp.clip(y0i + 1, 0, hl)
            idx = base + yq * (wl + 1) + xq
            bw4 = jnp.stack([
                (1.0 - lx) * (1.0 - ly) * valid,
                lx * (1.0 - ly) * valid,
                (1.0 - lx) * ly * valid,
                lx * ly * valid,
            ], axis=2)                                        # (P, H, 4, LQ)

            taps = _sample_taps_pmajor_vjp(stride, nh)(
                table, idx, bw4)                              # (P*Mb, Ch)
            # layout fence — see _box_attention_qminor_folded. A/B switch
            # for the r5 trace question whether the fence's copies
            # (4 x 0.36 ms/step at decoder scale) still pay for themselves.
            if os.environ.get("BOXER_IA_BARRIER", "1") != "0":
                taps = jax.lax.optimization_barrier(taps)
            out_b = out_b + _reduce_pmajor(taps * sw_l.reshape(-1, 1),
                                           npt, mb)
            mask_b = mask_b + taps * lw_l.reshape(-1, 1)
        out_pieces.append(out_b)
        mask_pieces.append(mask_b.reshape(k, k, 1, nh, lq, ch))

    out = (out_pieces[0] if b == 1
           else jnp.concatenate(out_pieces, axis=0))
    out = out.astype(value.dtype).reshape(b, nh, lq, ch)
    # mask rows are (p=(ky,kx), b, h, lq) -> (B, LQ, k, k, H*Ch)
    mask_out = (mask_pieces[0] if b == 1
                else jnp.concatenate(mask_pieces, axis=2))
    mask_out = mask_out.astype(value.dtype).transpose(
        2, 4, 0, 1, 3, 5).reshape(b, lq, k, k, nh * ch)
    if raw:
        return out, mask_out
    return _merge_heads(out), mask_out


def instance_attention(value, shapes: Shapes, sampling_loc, spatial_weight,
                       level_weight, kernel_size: int):
    """Fused instance attention: attention output + per-tap mask RoI
    (reference-contract wrapper over the query-minor fast path).

    Mirrors the reference dual-output kernel (`instance_attn_kernel.cuh:354-355`):
      out[b,q,h,:]      = sum_{l,p} spatial_w[b,q,h,l,p] * sample(l, p)
      mask[b,q,p,h,:]   = sum_{l}   level_w[b,q,h,l,p]   * sample(l, p)

    value:          (B, S, H, Ch)
    sampling_loc:   (B, Lq, H, L, P=k*k, 2)
    spatial_weight: (B, Lq, H, L, P) — softmax over (L*P)
    level_weight:   (B, Lq, H, L, P) — softmax over L
    returns (out (B,Lq,H*Ch), mask_out (B,Lq,k,k,H*Ch))
    """
    gx = jnp.moveaxis(sampling_loc[..., 0], 1, -1)   # (B, H, L, P, LQ)
    gy = jnp.moveaxis(sampling_loc[..., 1], 1, -1)
    sw = jnp.moveaxis(spatial_weight, 1, -1)
    lw = jnp.moveaxis(level_weight, 1, -1)
    return instance_attention_qminor(value, shapes, gx, gy, sw, lw,
                                     kernel_size)


# ---------------------------------------------------------------------------
# Implementation dispatch (XLA | Pallas)
# ---------------------------------------------------------------------------

_BOX_ATTN_IMPL = {"default": "xla"}


def set_box_attention_impl(name: str):
    """Select the backward implementation:

    - "xla" (default): XLA AD with the d_value scatter replaced by the
      Pallas accumulate kernel (via the custom-VJP take);
    - "analytic_vjp": the fully hand-written analytic backward
      (`_box_attention_vjp`), numerics-pinned to the reference CUDA chain —
      kept for debugging/verification (measured slower end-to-end).

    The former "pallas" forward option was retired after measurement showed
    Mosaic cannot express the wide dynamic forward gather (see docs); the
    Pallas kernel lives in the backward scatter instead.
    """
    global _USE_CUSTOM_VJP
    assert name in ("xla", "analytic_vjp"), name
    _BOX_ATTN_IMPL["default"] = name
    _USE_CUSTOM_VJP = name == "analytic_vjp"


def get_box_attention_impl() -> str:
    return _BOX_ATTN_IMPL["default"]


def box_attention_dispatch(value, shapes, sampling_loc, attn_weight):
    """Reference-layout entry point (modules use the qminor path directly)."""
    return box_attention(value, shapes, sampling_loc, attn_weight)


# ---------------------------------------------------------------------------
# Custom VJP (analytic backward, parity with `box_attn_kernel.cuh:136-184`)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _box_attention_vjp(shapes: Shapes):
    """Shape-specialized custom-VJP wrapper around the quad-table forward.

    Backward design (TPU):
    - d_loc / d_weight: recompute the per-tap fetches (vectorized gathers are
      cheap) and contract with the output grad — the analytic chain of the
      reference kernel (`grad_sampling_loc`/`grad_attn_weight`,
      `box_attn_kernel.cuh:177-183`);
    - d_value: ONE scatter-add of per-tap 4-corner payload rows into the quad
      table, then the (dense) transpose of the quad-table construction. The
      scatter is XLA:TPU's serial path (~15 ns/row) — the known bottleneck,
      see docs/TPU_PERFORMANCE.md.
    - floor() uses the straight-through derivative (d frac/d x = 1), matching
      grid_sample/CUDA semantics away from pixel-grid kinks.
    """

    @jax.custom_vjp
    def f(value, gx, gy, attn_weight):
        if gx.shape[3] > _FOLD_TAP_THRESHOLD:
            return _box_attention_qminor_folded(value, shapes, gx, gy,
                                                attn_weight)
        return _box_attention_qminor_impl(value, shapes, gx, gy, attn_weight)

    def fwd(value, gx, gy, attn_weight):
        return f(value, gx, gy, attn_weight), (value, gx, gy, attn_weight)

    def bwd(res, g):
        value, gx_in, gy_in, aw_in = res
        b, s, nh, ch = value.shape
        _, _, nl, npt, lq = gx_in.shape
        bh = b * nh
        m = bh * lq

        tables = _build_quad_tables(value, shapes)
        gx = gx_in.reshape(bh, nl, npt, lq).astype(jnp.float32)
        gy = gy_in.reshape(bh, nl, npt, lq).astype(jnp.float32)
        aw = aw_in.reshape(bh, nl, npt, lq).astype(jnp.float32)
        bh_idx = jnp.arange(bh, dtype=jnp.int32)[None, :, None]  # (1, BH, 1)

        # output grad arrives in the op's native raw layout (B, H, LQ, C),
        # which is already (bh, lq) row order; tiled p-major to align with
        # the folded (P, BH, LQ) tap rows.
        gq = g.astype(jnp.float32).reshape(m, ch)
        gq_p = jnp.concatenate([gq] * npt, axis=0)           # (P*M, Ch)

        d_gx_l, d_gy_l, d_aw_l, d_levels = [], [], [], []

        for li, (hl, wl) in enumerate(shapes):
            stride = (hl + 1) * (wl + 1)
            base = bh_idx * stride
            x = jnp.swapaxes(gx[:, li], 0, 1) * wl - 0.5     # (P, BH, LQ)
            y = jnp.swapaxes(gy[:, li], 0, 1) * hl - 0.5
            aw_l = jnp.swapaxes(aw[:, li], 0, 1)
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            lx = x - x0
            ly = y - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            valid = ((x0i >= -1) & (x0i <= wl - 1)
                     & (y0i >= -1) & (y0i <= hl - 1)).astype(jnp.float32)
            xq = jnp.clip(x0i + 1, 0, wl)
            yq = jnp.clip(y0i + 1, 0, hl)
            idx_f = (base + yq * (wl + 1) + xq).reshape(-1)  # (P*M,)
            w_tap = valid * aw_l

            # ONE folded recompute-gather per level (the fwd-path formulation)
            vals = jnp.take(tables[li], idx_f, axis=0,
                            mode="clip").astype(jnp.float32)  # (P*M, 4Ch)
            # per-corner dot with the output grad: s_c (P, BH, LQ)
            s0 = (vals[:, 0 * ch:1 * ch] * gq_p).sum(-1).reshape(npt, bh, lq)
            s1 = (vals[:, 1 * ch:2 * ch] * gq_p).sum(-1).reshape(npt, bh, lq)
            s2 = (vals[:, 2 * ch:3 * ch] * gq_p).sum(-1).reshape(npt, bh, lq)
            s3 = (vals[:, 3 * ch:4 * ch] * gq_p).sum(-1).reshape(npt, bh, lq)

            bilin = ((1 - lx) * (1 - ly) * s0 + lx * (1 - ly) * s1
                     + (1 - lx) * ly * s2 + lx * ly * s3)
            d_aw_l.append(jnp.swapaxes(valid * bilin, 0, 1))  # (BH, P, LQ)

            dlx = w_tap * (-(1 - ly) * s0 + (1 - ly) * s1 - ly * s2 + ly * s3)
            dly = w_tap * (-(1 - lx) * s0 - lx * s1 + (1 - lx) * s2 + lx * s3)
            d_gx_l.append(jnp.swapaxes(dlx * wl, 0, 1))
            d_gy_l.append(jnp.swapaxes(dly * hl, 0, 1))

            # d_table: ONE scatter of folded 4-corner payload rows. The
            # barrier keeps the payload compute OUT of the scatter fusion —
            # fused, the per-row scalar multiplies run in the scatter's
            # layout and cost ~2.2 ms per 161k rows; separated, payload is a
            # normal elementwise fusion and the scatter streams at HBM speed
            # (~0.04 ms per 161k rows, measured).
            w00 = ((1 - lx) * (1 - ly) * w_tap).reshape(-1, 1)
            w01 = (lx * (1 - ly) * w_tap).reshape(-1, 1)
            w10 = ((1 - lx) * ly * w_tap).reshape(-1, 1)
            w11 = (lx * ly * w_tap).reshape(-1, 1)
            payload = jnp.concatenate(
                [w00 * gq_p, w01 * gq_p, w10 * gq_p, w11 * gq_p], axis=-1)
            payload = jax.lax.optimization_barrier(payload)
            d_table = jnp.zeros(tables[li].shape, jnp.float32).at[idx_f].add(
                payload)

            # dense transpose of the quad-table construction
            dq = d_table.reshape(bh, hl + 1, wl + 1, 4 * ch)
            d_pad = jnp.zeros((bh, hl + 2, wl + 2, ch), jnp.float32)
            for c, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                d_pad = d_pad.at[:, dy:dy + hl + 1, dx:dx + wl + 1].add(
                    dq[..., c * ch:(c + 1) * ch])
            d_levels.append(
                d_pad[:, 1:hl + 1, 1:wl + 1].reshape(bh, hl * wl, ch))

        d_v = jnp.concatenate(d_levels, axis=1)          # (BH, S, Ch)
        d_value = d_v.reshape(b, nh, s, ch).transpose(0, 2, 1, 3)

        d_gx = jnp.stack(d_gx_l, axis=1)                 # (BH, L, P, LQ)
        d_gy = jnp.stack(d_gy_l, axis=1)
        d_aw = jnp.stack(d_aw_l, axis=1)

        return (d_value.astype(value.dtype),
                d_gx.reshape(gx_in.shape).astype(gx_in.dtype),
                d_gy.reshape(gy_in.shape).astype(gy_in.dtype),
                d_aw.reshape(aw_in.shape).astype(aw_in.dtype))

    f.defvjp(fwd, bwd)
    return f


# Backward selection: XLA AD remains the default. The analytic custom VJP
# (folded recompute-gathers + one barrier-isolated scatter per level) was
# measured SLOWER end-to-end (589 vs 374 ms/step on v5e): the folded 646k-row
# f32 payload materialization (+55 ms) and converts outweigh the saved
# per-tap scatters — XLA:TPU scatter cost is ~13.6 ns/ROW regardless of how
# taps are grouped, so folding 4 tap-scatters into 1 moves no rows. The
# analytic path is kept for numerics pinning/debugging (validated to the
# torch oracle across the ch/P sweep in tests/test_box_attention.py).
_USE_CUSTOM_VJP = False


def _merge_heads(raw):
    """(B, H, LQ, C) -> (B, LQ, H*C). A tile-crossing copy — module code
    avoids it by consuming the raw layout via HeadMergeDense (per-head
    batched matmul); only the reference-contract wrappers pay it."""
    b, nh, lq, ch = raw.shape
    return raw.transpose(0, 2, 1, 3).reshape(b, lq, nh * ch)


def box_attention_qminor(value, shapes: Shapes, gx, gy, attn_weight,
                         raw: bool = False, fold=None):
    """Public entry: quad-table fast path (AD or analytic custom backward).

    raw=True returns (B, H, LQ, C) — the op's native row order — letting the
    caller fold the head merge into its output projection instead of paying
    a layout copy per gather output (XLA propagates the transpose's
    column-major layout upstream; measured 8.6 ms/model in the decoder).

    fold=None picks the folded single-take path by tap count (see
    _FOLD_TAP_THRESHOLD). Callers on the inference path pass fold=True:
    folding the P=4 layers is a measured forward win (det 60.5 -> 58.4
    ms/img) but regresses the backward (train step 277 -> 327 ms), so the
    flag follows the model's train/inference mode.
    """
    if _USE_CUSTOM_VJP:
        out = _box_attention_vjp(tuple(tuple(s) for s in shapes))(
            value, gx, gy, attn_weight)
        return out if raw else _merge_heads(out)
    # fold=True is the model's explicit inference flag -> the folded path may
    # additionally use the forward-only Pallas combine+reduce kernel
    fused = fold is True
    if fold is None:
        fold = gx.shape[3] > _FOLD_TAP_THRESHOLD
    if fold:
        # fused dispatch (slices chain vs Pallas kernel vs plain XLA
        # formulation) is decided per tap count / backend inside the folded
        # impl; the slices path needs no Pallas support
        out = _box_attention_qminor_folded(
            value, shapes, gx, gy, attn_weight, fused=fused)
    else:
        out = _box_attention_qminor_impl(value, shapes, gx, gy, attn_weight)
    return out if raw else _merge_heads(out)
