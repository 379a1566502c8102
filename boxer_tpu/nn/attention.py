"""Box / Instance / Box3d attention Flax modules.

Parity targets: reference `e2edet/module/box_attention.py`
(BoxAttention :140-239, InstanceAttention :10-137, Box3dAttention :242-363).

Shared structure:
- `value_proj` / `out_proj` dense layers (xavier-uniform / zeros init)
- zero-init `linear_box` weights + uniform bias; zero-init attention weights
  (reference `_reset_parameters`, `box_attention.py:186-194`)
- `_where_to_attend`: predicted (dx,dy,dw,dh)/8 offsets scaled by the reference
  window size; sampled grid = center + kernel_indices * relu(size), multiplied
  by per-level valid ratios (`box_attention.py:196-214`)
- kernel_indices: normalized k×k grid (`box_attention.py:171-184`)

TPU-first notes: the heavy sampling goes through `boxer_tpu.ops`
(XLA gather / Pallas kernel); projections are plain MXU matmuls; everything is
fixed-shape. The reference's module-wide `inferencing` flag becomes an
explicit `train` argument.
"""

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from boxer_tpu.ops import box_attention_dispatch, instance_attention
from jax.ad_checkpoint import checkpoint_name

from boxer_tpu.ops.box_attention import box_attention_qminor

Shapes = Tuple[Tuple[int, int], ...]


def _qminor_ref_parts(ref_windows, num_head, num_level, n_box: int = 4):
    """Transpose ref windows to query-minor broadcastable parts.

    ref_windows (B, LQ, D) or (B, LQ, H, D) -> tuple of D arrays each
    (B, 1|H, 1, LQ) broadcastable against (B, H, L, LQ)."""
    if ref_windows.ndim == 3:
        ref_t = jnp.moveaxis(ref_windows, 1, -1)  # (B, D, LQ)
        return [ref_t[:, None, None, i] for i in range(ref_windows.shape[-1])]
    ref_t = jnp.moveaxis(ref_windows, 1, -1)      # (B, H, D, LQ)
    return [ref_t[:, :, None, i] for i in range(ref_windows.shape[-1])]


def make_kernel_indices(kernel_size: int, divisor: Optional[float] = None):
    """Normalized k×k tap offsets; parity `box_attention.py:171-184`.

    Even k: centers at ±(i+0.5); odd k: integer offsets. Returned flattened
    (k*k, 2) as (x, y), divided by `divisor` (default: kernel_size).
    """
    if divisor is None:
        divisor = float(kernel_size)
    if kernel_size % 2 == 0:
        start = -kernel_size // 2 + 0.5
        end = kernel_size // 2 - 0.5
    else:
        start = -(kernel_size - 1) // 2
        end = (kernel_size - 1) // 2
    indices = jnp.linspace(start, end, kernel_size)
    i, j = jnp.meshgrid(indices, indices, indexing="ij")
    return jnp.stack([j, i], axis=-1).reshape(-1, 2) / divisor


def _uniform_bias_init(key, shape, dtype=jnp.float32):
    import jax

    return jax.random.uniform(key, shape, dtype, 0.0, 1.0)


class HeadMergeDense(nn.Module):
    """Output projection that consumes the sampling op's raw (B, H, LQ, C)
    layout directly.

    Equivalent to `nn.Dense(features)` on the head-merged (B, LQ, H*C)
    tensor (identical param shapes/names, so torch weight porting is
    unchanged), but computed as a per-head batched matmul + head-sum. This
    keeps the op's gather consumers row-major: the explicit head-merge
    transpose otherwise makes XLA propagate a column-major layout upstream
    and insert a {1,0}->{0,1} copy of every gather output (measured
    8.6 ms/model in the BoxeR-2D decoder, 4.8 ms in the encoder).
    """

    in_features: int
    features: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.xavier_uniform(),
            (self.in_features, self.features))
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,))

    def __call__(self, x):
        """Standard dense over the last axis (head-merged inputs)."""
        y = x @ self.kernel.astype(self.dtype)
        return y + self.bias.astype(self.dtype)

    def raw(self, x):
        """x: (B, H, LQ, C) -> (B, LQ, features), no head-merge transpose."""
        b, nh, lq, ch = x.shape
        k = self.kernel.astype(self.dtype).reshape(nh, ch, self.features)
        x = x.astype(self.dtype)
        # batched per-head matmul (batch dim h, contract c) then head-sum;
        # for b == 1 the (h, q, c) view is a free reshape of the raw rows
        if b == 1:
            lhs = x.reshape(nh, lq, ch)
            y = jax.lax.dot_general(
                lhs, k, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)       # (H, LQ, F)
            y = jnp.sum(y, axis=0)[None].astype(self.dtype)
        else:
            y = jnp.einsum("bhqc,hcf->bqf", x, k,
                           preferred_element_type=jnp.float32
                           ).astype(self.dtype)
        return y + self.bias.astype(self.dtype)


class BoxAttention(nn.Module):
    """Multi-scale box attention (k=2 → 4 taps/level)."""

    d_model: int
    num_level: int
    num_head: int
    kernel_size: int = 2
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.d_model % self.num_head == 0
        self.head_dim = self.d_model // self.num_head
        self.num_point = self.kernel_size ** 2

        self.value_proj = nn.Dense(
            self.d_model, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="value_proj")
        self.out_proj = HeadMergeDense(
            self.d_model, self.d_model, dtype=self.dtype, name="out_proj")
        self.linear_box = nn.Dense(
            self.num_head * self.num_level * 4,
            kernel_init=nn.initializers.zeros, bias_init=_uniform_bias_init,
            dtype=self.dtype, name="linear_box")
        self.linear_attn = nn.Dense(
            self.num_head * self.num_level * self.num_point,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="linear_attn")

    def _where_to_attend(self, query, v_valid_ratios, ref_windows):
        """Query-minor sampling grid: returns (gx, gy) each
        (B, H, L, P, LQ) in [0,1]. ref_windows: (B, LQ, 4) or (B, LQ, H, 4).

        TPU note: all intermediates keep the large LQ axis minor — the
        reference-layout (..., P, 2) grid would pad to (8, 128) tiles and
        move ~30-60x its logical size through HBM.
        """
        b, lq = query.shape[:2]
        nh, nl = self.num_head, self.num_level

        offset = self.linear_box(query)                      # (B, LQ, H*L*4)
        off = jnp.moveaxis(offset, 1, -1).astype(jnp.float32)
        off = off.reshape(b, nh, nl, 4, lq)
        dx, dy, dw, dh = off[:, :, :, 0], off[:, :, :, 1], \
            off[:, :, :, 2], off[:, :, :, 3]                  # (B, H, L, LQ)

        rcx, rcy, rw, rh = _qminor_ref_parts(ref_windows, nh, nl)
        cx = rcx + dx / 8.0 * rw
        cy = rcy + dy / 8.0 * rh
        sw = nn.relu(rw + dw / 8.0 * rw)
        sh = nn.relu(rh + dh / 8.0 * rh)

        kernel = make_kernel_indices(self.kernel_size)       # (P, 2)
        kx = kernel[:, 0][None, None, None, :, None]
        ky = kernel[:, 1][None, None, None, :, None]
        gx = cx[:, :, :, None, :] + kx * sw[:, :, :, None, :]
        gy = cy[:, :, :, None, :] + ky * sh[:, :, :, None, :]
        if v_valid_ratios is not None:
            # (B, L, 2) -> broadcast (B, 1, L, 1, 1)
            gx = gx * v_valid_ratios[:, None, :, None, None, 0]
            gy = gy * v_valid_ratios[:, None, :, None, None, 1]
        return gx, gy

    def __call__(self, query, value, v_shape: Shapes, v_mask, v_valid_ratios,
                 ref_windows, fold_taps=None):
        b, l1 = query.shape[:2]
        l2 = value.shape[1]

        value = self.value_proj(value)
        if v_mask is not None:
            value = jnp.where(v_mask[..., None], 0.0, value)
        value = value.reshape(b, l2, self.num_head, self.head_dim)

        attn = self.linear_attn(query).reshape(b, l1, self.num_head, -1)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1)
        # query-minor: (B, LQ, H, L*P) -> (B, H, L, P, LQ)
        attn_q = jnp.moveaxis(attn, 1, -1).reshape(
            b, self.num_head, self.num_level, self.num_point, l1)

        gx, gy = self._where_to_attend(query, v_valid_ratios, ref_windows)
        out = box_attention_qminor(value, v_shape, gx, gy, attn_q, raw=True,
                                   fold=fold_taps)
        # offerable to a remat policy (save_only_these_names): saving the
        # raw sampling output lets the remat recompute DCE the encoder-scale
        # gathers + corner combines (the takes' only consumer is this
        # tensor; the custom-VJP backward re-gathers on its own) — ~10.3 MB
        # per layer vs ~0.45 ms/layer of recomputed fetches
        out = checkpoint_name(out, "box_attn_sample")
        attn = attn.reshape(
            b, l1, self.num_head, self.num_level, self.num_point)
        return self.out_proj.raw(out), attn


class InstanceAttention(nn.Module):
    """Instance attention: k×k (=14×14) RoI sampling with dual weights.

    Train mode emits (output, mask_roi); inference falls back to plain box
    attention with spatial weights only (`box_attention.py:112-134`).
    """

    d_model: int
    num_level: int
    num_head: int
    kernel_size: int = 14
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.d_model % self.num_head == 0
        self.head_dim = self.d_model // self.num_head

        self.value_proj = nn.Dense(
            self.d_model, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="value_proj")
        self.out_proj = HeadMergeDense(
            self.d_model, self.d_model, dtype=self.dtype, name="out_proj")
        self.linear_box = nn.Dense(
            self.num_level * self.num_head * 4,
            kernel_init=nn.initializers.zeros, bias_init=_uniform_bias_init,
            dtype=self.dtype, name="linear_box")
        # attention weights predicted as (L, 2, 2) then repeat-interleaved to
        # k×k (`box_attention.py:94-101`)
        self.linear_attn = nn.Dense(
            self.num_head * self.num_level * 4,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="linear_attn")

    def _where_to_attend(self, query, v_valid_ratios, ref_windows):
        """Query-minor grid (gx, gy) each (B, H, L, k*k, LQ); same math as
        BoxAttention._where_to_attend with the k×k kernel."""
        b, lq = query.shape[:2]
        nh, nl = self.num_head, self.num_level

        offset = self.linear_box(query)
        off = jnp.moveaxis(offset, 1, -1).astype(jnp.float32)
        off = off.reshape(b, nh, nl, 4, lq)
        dx, dy, dw, dh = off[:, :, :, 0], off[:, :, :, 1], \
            off[:, :, :, 2], off[:, :, :, 3]

        rcx, rcy, rw, rh = _qminor_ref_parts(ref_windows, nh, nl)
        cx = rcx + dx / 8.0 * rw
        cy = rcy + dy / 8.0 * rh
        sw = nn.relu(rw + dw / 8.0 * rw)
        sh = nn.relu(rh + dh / 8.0 * rh)

        kernel = make_kernel_indices(self.kernel_size)
        kx = kernel[:, 0][None, None, None, :, None]
        ky = kernel[:, 1][None, None, None, :, None]
        gx = cx[:, :, :, None, :] + kx * sw[:, :, :, None, :]
        gy = cy[:, :, :, None, :] + ky * sh[:, :, :, None, :]
        if v_valid_ratios is not None:
            gx = gx * v_valid_ratios[:, None, :, None, None, 0]
            gy = gy * v_valid_ratios[:, None, :, None, None, 1]
        return gx, gy

    def _expand_quadrant_weights(self, w):
        """(B, H, L, 2, 2, LQ) -> (B, H, L, k*k, LQ) repeat-interleaved to
        the k×k tap grid (reference `box_attention.py:94-101`), query-minor."""
        k = self.kernel_size
        w = jnp.repeat(w, k // 2, axis=3)
        w = jnp.repeat(w, k // 2, axis=4)
        b, h, l = w.shape[:3]
        return w.reshape(b, h, l, k * k, w.shape[-1])

    def project_roi(self, mask_out):
        """Apply the (shared) output projection to a mask RoI tensor
        (B, K, k, k, H*Ch) — used by the deferred top-k mask decode, where
        the projection runs on the selected-query subset only."""
        return self.out_proj(mask_out)

    def __call__(self, query, value, v_shape: Shapes, v_mask, v_valid_ratios,
                 ref_windows, train: bool = True, raw_roi: bool = False):
        b, l1 = query.shape[:2]
        l2 = value.shape[1]
        k = self.kernel_size
        nh, nl = self.num_head, self.num_level

        value = self.value_proj(value)
        if v_mask is not None:
            value = jnp.where(v_mask[..., None], 0.0, value)
        value = value.reshape(b, l2, nh, self.head_dim)

        # compact (L, 2, 2) quadrant logits, query-minor
        attn = self.linear_attn(query)                     # (B, LQ, H*L*4)
        attn = jnp.moveaxis(attn, 1, -1).astype(jnp.float32)
        attn = attn.reshape(b, nh, nl, 2, 2, l1)

        # spatial softmax over the EXPANDED (L*k*k) taps: each quadrant value
        # appears (k/2)^2 times, so the expanded softmax equals
        # exp(w) / ((k/2)^2 * sum exp(w)) over the compact grid.
        mult = (k // 2) ** 2
        flat = attn.reshape(b, nh, nl * 4, l1)
        m = flat.max(axis=2, keepdims=True)
        e = jnp.exp(flat - m)
        denom = e.sum(axis=2, keepdims=True) * mult
        spatial_c = (e / denom).reshape(b, nh, nl, 2, 2, l1)
        spatial = self._expand_quadrant_weights(spatial_c)

        gx, gy = self._where_to_attend(query, v_valid_ratios, ref_windows)

        if train:
            # level softmax over L per quadrant (multiplicity cancels)
            level_c = nn.softmax(attn, axis=2)
            level = self._expand_quadrant_weights(level_c)
            from boxer_tpu.ops.box_attention import instance_attention_qminor

            out, mask_out = instance_attention_qminor(
                value, v_shape, gx, gy, spatial, level, kernel_size=k,
                raw=True)
            # offerable to the decoder remat policy (same rationale as
            # 'box_attn_sample'): saving the raw dual sampling outputs lets
            # the backward recompute skip the 470k-row folded gathers +
            # combines; the custom VJP re-gathers on its own
            out = checkpoint_name(out, "instance_attn_sample")
            mask_out = checkpoint_name(mask_out, "instance_attn_sample")
            if raw_roi:
                # deferred mask decode: hand back the unprojected RoI so the
                # out_proj (and everything after it) runs on the top-k
                # selected queries only
                return self.out_proj.raw(out), mask_out, (spatial, level)
            return (self.out_proj.raw(out), self.out_proj(mask_out),
                    (spatial, level))

        # train=False is the forward-only path -> the folded gather may use
        # the fused Pallas combine+reduce (no taps materialization)
        out = box_attention_qminor(value, v_shape, gx, gy, spatial, raw=True,
                                   fold=True)
        return self.out_proj.raw(out), None, (spatial,)


class Box3dAttention(nn.Module):
    """Rotation-aware box attention for BEV features.

    Parity `box_attention.py:242-363`: 5th offset variable is a rotation angle
    `(ref_angle + dtheta/16) * 2π`; the k×k grid is rotated before sampling.
    Reuses the same sampling kernel as BoxAttention (the rotation happens in
    the grid computation, reference `box_attention.py:304-338`).
    """

    d_model: int
    num_level: int
    num_head: int
    with_rotation: bool = True
    kernel_size: int = 2
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.d_model % self.num_head == 0
        self.head_dim = self.d_model // self.num_head
        self.num_point = self.kernel_size ** 2
        self.num_variable = 5 if self.with_rotation else 4

        self.value_proj = nn.Dense(
            self.d_model, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="value_proj")
        self.out_proj = HeadMergeDense(
            self.d_model, self.d_model, dtype=self.dtype, name="out_proj")
        self.linear_box = nn.Dense(
            self.num_level * self.num_head * self.num_variable,
            kernel_init=nn.initializers.zeros, bias_init=_uniform_bias_init,
            dtype=self.dtype, name="linear_box")
        self.linear_attn = nn.Dense(
            self.num_head * self.num_level * self.num_point,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="linear_attn")

    def _where_to_attend(self, query, v_valid_ratios, ref_windows):
        """Query-minor rotated grid: (gx, gy) each (B, H, L, P, LQ).

        grid = center + R(angle) @ (kernel * size) with
        angle = (ref_angle + dtheta/16) * 2π (reference
        `box_attention.py:304-338`), all math query-minor.
        """
        b, lq = query.shape[:2]
        nh, nl, nv = self.num_head, self.num_level, self.num_variable

        offset = self.linear_box(query)                   # (B, LQ, H*L*nv)
        off = jnp.moveaxis(offset, 1, -1).astype(jnp.float32)
        off = off.reshape(b, nh, nl, nv, lq)
        dx, dy, dw, dh = off[:, :, :, 0], off[:, :, :, 1], \
            off[:, :, :, 2], off[:, :, :, 3]

        parts = _qminor_ref_parts(ref_windows, nh, nl)
        rcx, rcy, rw, rh, rang = parts[0], parts[1], parts[2], parts[3], parts[4]

        if self.with_rotation:
            dthe = off[:, :, :, 4]
            angles = (rang + dthe / 16.0) * 2.0 * math.pi
        else:
            angles = jnp.broadcast_to(rang, (b, nh, nl, lq))

        cx = rcx + dx / 8.0 * rw
        cy = rcy + dy / 8.0 * rh
        sw = nn.relu(rw + dw / 8.0 * rw)
        sh = nn.relu(rh + dh / 8.0 * rh)
        cos_a = jnp.cos(angles)[:, :, :, None, :]
        sin_a = jnp.sin(angles)[:, :, :, None, :]

        kernel = make_kernel_indices(self.kernel_size, divisor=2.0)
        kx = kernel[:, 0][None, None, None, :, None]
        ky = kernel[:, 1][None, None, None, :, None]
        ox = kx * sw[:, :, :, None, :]
        oy = ky * sh[:, :, :, None, :]
        gx = cx[:, :, :, None, :] + ox * cos_a - oy * sin_a
        gy = cy[:, :, :, None, :] + ox * sin_a + oy * cos_a
        if v_valid_ratios is not None:
            gx = gx * v_valid_ratios[:, None, :, None, None, 0]
            gy = gy * v_valid_ratios[:, None, :, None, None, 1]
        return gx, gy

    def __call__(self, query, value, v_shape: Shapes, v_mask, v_valid_ratios,
                 ref_windows):
        b, l1 = query.shape[:2]
        l2 = value.shape[1]

        value = self.value_proj(value)
        if v_mask is not None:
            value = jnp.where(v_mask[..., None], 0.0, value)
        value = value.reshape(b, l2, self.num_head, self.head_dim)

        attn = self.linear_attn(query).reshape(b, l1, self.num_head, -1)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn_q = jnp.moveaxis(attn, 1, -1).reshape(
            b, self.num_head, self.num_level, self.num_point, l1)

        gx, gy = self._where_to_attend(query, v_valid_ratios, ref_windows)
        out = box_attention_qminor(value, v_shape, gx, gy, attn_q, raw=True)
        attn = attn.reshape(
            b, l1, self.num_head, self.num_level, self.num_point)
        return self.out_proj.raw(out), attn
