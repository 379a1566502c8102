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
  per-level *batched gather* (4 bilinear corners per tap) followed by an
  einsum contraction over taps — all fixed-shape, fused by XLA, and
  differentiated automatically (scatter-add for grad_value). A fused Pallas
  kernel for the forward hot path lives in `boxer_tpu/ops/pallas/`.
- Heads are folded into the batch dim so every level is one gather.
- Accumulation is fp32 regardless of input dtype (parity with the reference's
  `custom_fwd(cast_inputs=float32)` pinning, `ops/box_attention_func.py:11`).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from boxer_tpu.utils.general import level_start_index

Shapes = Tuple[Tuple[int, int], ...]


def _gather_level_samples(value_l, loc_l):
    """Bilinear-sample one level for all (batch*head) slices.

    value_l: (BH, Hl, Wl, Ch)
    loc_l:   (BH, N, 2) in [0,1]
    returns  (BH, N, Ch) fp32
    """
    bh, h, w, ch = value_l.shape
    x = loc_l[..., 0].astype(jnp.float32) * w - 0.5
    y = loc_l[..., 1].astype(jnp.float32) * h - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = value_l.reshape(bh, h * w, ch)

    def tap(xi, yi, wgt):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1).astype(jnp.float32)
        return vals * jnp.where(valid, wgt, 0.0)[..., None]

    return (
        tap(x0i, y0i, (1.0 - lx) * (1.0 - ly))
        + tap(x0i + 1, y0i, lx * (1.0 - ly))
        + tap(x0i, y0i + 1, (1.0 - lx) * ly)
        + tap(x0i + 1, y0i + 1, lx * ly)
    )


def box_attention(value, shapes: Shapes, sampling_loc, attn_weight):
    """Multi-scale deformable box attention (XLA formulation).

    value:        (B, S, H, Ch) — S = sum(Hl*Wl) flattened multi-level values
    shapes:       static ((H1,W1), ..., (HL,WL))
    sampling_loc: (B, Lq, H, L, P, 2) in [0,1]
    attn_weight:  (B, Lq, H, L, P), softmax-normalized over (L, P)
    returns       (B, Lq, H*Ch) in value.dtype
    """
    b, s, nh, ch = value.shape
    _, lq, _, nl, npt, _ = sampling_loc.shape
    assert nl == len(shapes)
    starts = level_start_index(shapes)

    out = jnp.zeros((b * nh, lq, ch), dtype=jnp.float32)
    for li, (hl, wl) in enumerate(shapes):
        # (B, Hl*Wl, H, Ch) -> (B*H, Hl, Wl, Ch)
        v_l = value[:, starts[li] : starts[li] + hl * wl]
        v_l = v_l.transpose(0, 2, 1, 3).reshape(b * nh, hl, wl, ch)
        # (B, Lq, H, P, 2) -> (B*H, Lq*P, 2)
        loc_l = sampling_loc[:, :, :, li].transpose(0, 2, 1, 3, 4)
        loc_l = loc_l.reshape(b * nh, lq * npt, 2)
        sampled = _gather_level_samples(v_l, loc_l).reshape(b * nh, lq, npt, ch)
        w_l = attn_weight[:, :, :, li].transpose(0, 2, 1, 3)
        w_l = w_l.reshape(b * nh, lq, npt).astype(jnp.float32)
        out = out + jnp.einsum("gqp,gqpc->gqc", w_l, sampled)

    out = out.reshape(b, nh, lq, ch).transpose(0, 2, 1, 3).reshape(b, lq, nh * ch)
    return out.astype(value.dtype)


def instance_attention(value, shapes: Shapes, sampling_loc, spatial_weight,
                       level_weight, kernel_size: int):
    """Fused instance attention: attention output + per-tap mask RoI.

    Mirrors the reference dual-output kernel (`instance_attn_kernel.cuh:354-355`):
      out[b,q,h,:]      = sum_{l,p} spatial_w[b,q,h,l,p] * sample(l, p)
      mask[b,q,p,h,:]   = sum_{l}   level_w[b,q,h,l,p]   * sample(l, p)

    value:          (B, S, H, Ch)
    sampling_loc:   (B, Lq, H, L, P=k*k, 2)
    spatial_weight: (B, Lq, H, L, P) — softmax over (L*P)
    level_weight:   (B, Lq, H, L, P) — softmax over L
    returns (out (B,Lq,H*Ch), mask_out (B,Lq,k,k,H*Ch))
    """
    b, s, nh, ch = value.shape
    _, lq, _, nl, npt, _ = sampling_loc.shape
    k = kernel_size
    assert npt == k * k
    starts = level_start_index(shapes)

    out = jnp.zeros((b * nh, lq, ch), dtype=jnp.float32)
    mask_out = jnp.zeros((b * nh, lq, npt, ch), dtype=jnp.float32)
    for li, (hl, wl) in enumerate(shapes):
        v_l = value[:, starts[li] : starts[li] + hl * wl]
        v_l = v_l.transpose(0, 2, 1, 3).reshape(b * nh, hl, wl, ch)
        loc_l = sampling_loc[:, :, :, li].transpose(0, 2, 1, 3, 4)
        loc_l = loc_l.reshape(b * nh, lq * npt, 2)
        sampled = _gather_level_samples(v_l, loc_l).reshape(b * nh, lq, npt, ch)

        sw_l = spatial_weight[:, :, :, li].transpose(0, 2, 1, 3)
        sw_l = sw_l.reshape(b * nh, lq, npt).astype(jnp.float32)
        lw_l = level_weight[:, :, :, li].transpose(0, 2, 1, 3)
        lw_l = lw_l.reshape(b * nh, lq, npt).astype(jnp.float32)

        out = out + jnp.einsum("gqp,gqpc->gqc", sw_l, sampled)
        mask_out = mask_out + lw_l[..., None] * sampled

    out = out.reshape(b, nh, lq, ch).transpose(0, 2, 1, 3).reshape(b, lq, nh * ch)
    mask_out = mask_out.reshape(b, nh, lq, k, k, ch)
    mask_out = mask_out.transpose(0, 2, 3, 4, 1, 5).reshape(b, lq, k, k, nh * ch)
    return out.astype(value.dtype), mask_out.astype(value.dtype)


# ---------------------------------------------------------------------------
# Implementation dispatch (XLA | Pallas)
# ---------------------------------------------------------------------------

_BOX_ATTN_IMPL = {"default": "xla"}


def set_box_attention_impl(name: str):
    assert name in ("xla", "pallas")
    _BOX_ATTN_IMPL["default"] = name


def get_box_attention_impl() -> str:
    return _BOX_ATTN_IMPL["default"]


def box_attention_dispatch(value, shapes, sampling_loc, attn_weight):
    if _BOX_ATTN_IMPL["default"] == "pallas":
        from boxer_tpu.ops.pallas.box_attn_kernel import box_attention_pallas

        return box_attention_pallas(value, shapes, sampling_loc, attn_weight)
    return box_attention(value, shapes, sampling_loc, attn_weight)
