"""Chip-independent Pallas scatter/combine kernel logic tests (interpret
mode, like tests/test_flash_attention.py).

The TPU-gated subprocess tests (test_pallas_tpu_paths.py) verify the real
Mosaic lowering on the chip; these run the SAME kernel bodies under the
Pallas interpreter on CPU against loop oracles, so kernel-logic regressions
(index maps, dump-row padding, corner expansion, multi-accumulator merge)
are caught in every suite run even when no TPU is reachable.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture()
def interp():
    """Pallas interpret mode; build caches cleared so callables traced in
    interpret mode are not reused by (or taken from) real-backend runs."""
    from jax.experimental.pallas import tpu as pltpu

    import boxer_tpu.ops.pallas.combine_reduce as cr
    import boxer_tpu.ops.pallas.scatter_accum as sa

    caches = (sa._build_call, sa._build_call_pmajor, sa._build_call_weighted,
              sa._build_call_pmajor_weighted, cr._build_call,
              cr._build_call_onepass, cr._build_call_onepass_raw)
    for f in caches:
        f.cache_clear()
    with pltpu.force_tpu_interpret_mode():
        yield sa
    for f in caches:
        f.cache_clear()


def _rel_err(a, b):
    return np.abs(a - b).max() / max(1e-6, np.abs(b).max())


def test_scatter_add_rows_interpret(interp):
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    BH, NT, CH, RB = 2, 4096 + 77, 128, 52   # non-multiple NT -> dump rows
    idx = rng.randint(0, RB, (BH, NT)).astype(np.int32)
    pay = rng.randn(BH, NT, CH).astype(np.float32)
    out = np.asarray(interp.scatter_add_rows(
        jnp.asarray(idx), jnp.asarray(pay), RB))
    ref = np.zeros((BH, RB, CH), np.float32)
    for b in range(BH):
        np.add.at(ref[b], idx[b], pay[b])
    assert out.shape == (BH, RB, CH)
    assert _rel_err(out, ref) < 1e-5


def test_scatter_add_rows_pmajor_interpret(interp):
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    P, BH, LQ, CH, RB = 16, 2, 300, 128, 40  # LQ=300 -> 384 tpb (dump pad)
    idx = rng.randint(0, RB, (P, BH, LQ)).astype(np.int32)
    pay = rng.randn(P, BH, LQ, CH).astype(np.float32)
    out = np.asarray(interp.scatter_add_rows_pmajor(
        jnp.asarray(idx), jnp.asarray(pay), RB))
    ref = np.zeros((BH, RB, CH), np.float32)
    for p in range(P):
        for b in range(BH):
            np.add.at(ref[b], idx[p, b], pay[p, b])
    assert _rel_err(out, ref) < 1e-5


def test_scatter_add_rows_weighted_interpret(interp):
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    BH, NT, CH, RB = 2, 4096, 32, 64
    idx = rng.randint(0, RB, (BH, NT)).astype(np.int32)
    g = rng.randn(BH, NT, CH).astype(np.float32)
    w4 = rng.rand(BH, 4, NT).astype(np.float32)
    out = np.asarray(interp.scatter_add_rows_weighted(
        jnp.asarray(idx), jnp.asarray(g), jnp.asarray(w4), RB))
    ref = np.zeros((BH, RB, 4 * CH), np.float32)
    for b in range(BH):
        quad = np.concatenate([w4[b, c][:, None] * g[b] for c in range(4)],
                              axis=1)
        np.add.at(ref[b], idx[b], quad)
    assert out.shape == (BH, RB, 4 * CH)
    assert _rel_err(out, ref) < 1e-5


def test_scatter_add_rows_pmajor_weighted_interpret(interp):
    import jax.numpy as jnp

    rng = np.random.RandomState(4)
    P, BH, LQ, CH, RB = 8, 2, 300, 32, 48
    idx = rng.randint(0, RB, (P, BH, LQ)).astype(np.int32)
    g = rng.randn(P, BH, LQ, CH).astype(np.float32)
    w4 = rng.rand(P, BH, 4, LQ).astype(np.float32)
    out = np.asarray(interp.scatter_add_rows_pmajor_weighted(
        jnp.asarray(idx), jnp.asarray(g), jnp.asarray(w4), RB))
    ref = np.zeros((BH, RB, 4 * CH), np.float32)
    for p in range(P):
        for b in range(BH):
            quad = np.concatenate(
                [w4[p, b, c][:, None] * g[p, b] for c in range(4)], axis=1)
            np.add.at(ref[b], idx[p, b], quad)
    assert _rel_err(out, ref) < 1e-5


def test_fused_combine_reduce_interpret(interp):
    """Forward combine+reduce kernel vs a numpy oracle (the real-chip
    comparison lives in test_pallas_tpu_paths). P=4 exercises the round-5
    single-pass small-P kernel; P=16 the accumulator-carry kernel."""
    import jax.numpy as jnp

    from boxer_tpu.ops.pallas.combine_reduce import fused_combine_reduce

    rng = np.random.RandomState(5)
    for P, M in ((4, 4096), (16, 4096)):
        CH = 32
        g = rng.randn(P * M, 4 * CH).astype(np.float32)
        w = rng.rand(P, 4, M).astype(np.float32)
        out = np.asarray(fused_combine_reduce(jnp.asarray(g), jnp.asarray(w),
                                              P, M))
        g4 = g.reshape(P, M, 4, CH)
        ref = np.einsum("pmc,pmch->mh", w.transpose(0, 2, 1), g4)
        assert out.shape == (M, CH)
        assert _rel_err(out, ref) < 1e-5


def test_fused_combine_reduce_raw_interpret(interp):
    """Round-5 raw-weight single-pass kernel (in-kernel bilinear corner
    formation) vs the numpy oracle with host-side corner products."""
    import jax.numpy as jnp

    from boxer_tpu.ops.pallas.combine_reduce import fused_combine_reduce_raw

    rng = np.random.RandomState(6)
    P, M, CH = 4, 2048 + 512, 32          # non-multiple M -> partial block
    g = rng.randn(P * M, 4 * CH).astype(np.float32)
    lx = rng.rand(P, M).astype(np.float32)
    ly = rng.rand(P, M).astype(np.float32)
    wt = rng.rand(P, M).astype(np.float32)
    out = np.asarray(fused_combine_reduce_raw(
        jnp.asarray(g), jnp.asarray(lx), jnp.asarray(ly), jnp.asarray(wt),
        P, M))
    w = np.stack([(1 - lx) * (1 - ly) * wt, lx * (1 - ly) * wt,
                  (1 - lx) * ly * wt, lx * ly * wt], axis=1)   # (P, 4, M)
    g4 = g.reshape(P, M, 4, CH)
    ref = np.einsum("pmc,pmch->mh", w.transpose(0, 2, 1), g4)
    assert out.shape == (M, CH)
    assert _rel_err(out, ref) < 1e-5


def test_weighted_vjp_kernel_integration_interpret(monkeypatch):
    """Drive the full custom-VJP -> weighted-kernel integration (relative
    index bases, payload reshapes, corner-weight order) under the
    interpreter, comparing grads against the XLA-fallback path. On-chip
    equivalents: test_pallas_tpu_paths.py."""
    from jax.experimental.pallas import tpu as pltpu

    import jax
    import jax.numpy as jnp

    import importlib

    # the ops package re-exports the function under the same name, which
    # shadows the submodule attribute `import ... as` binds to
    ba = importlib.import_module("boxer_tpu.ops.box_attention")
    import boxer_tpu.ops.pallas.scatter_accum as sa

    SHAPES = ((30, 46), (15, 23))
    B, NH, NL, CH, LQ, K = 1, 2, 2, 32, 120, 6
    rng = np.random.RandomState(7)
    value = rng.rand(B, sum(h * w for h, w in SHAPES), NH, CH
                     ).astype(np.float32) * 0.01
    loc = rng.uniform(0.05, 0.95, (B, LQ, NH, NL, 4, 2)).astype(np.float32)
    w = rng.rand(B, LQ, NH, NL, 4).astype(np.float32)
    w /= w.sum(axis=(-1, -2), keepdims=True)
    iloc = rng.uniform(0.05, 0.95,
                       (B, LQ, NH, NL, K * K, 2)).astype(np.float32)
    sw = rng.rand(B, LQ, NH, NL, K * K).astype(np.float32)
    sw /= sw.sum(axis=(-1, -2), keepdims=True)
    lw = rng.rand(B, LQ, NH, NL, K * K).astype(np.float32)
    lw /= lw.sum(axis=3, keepdims=True)

    def f_box(v, l, wt):
        return ba.box_attention(v, SHAPES, l, wt).astype(jnp.float32).sum()

    def f_inst(v, l, s, ww):
        out, mask = ba.instance_attention(v, SHAPES, l, s, ww, kernel_size=K)
        return (out.astype(jnp.float32).sum()
                + (mask.astype(jnp.float32) ** 2).sum())

    args_box = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    args_inst = (jnp.asarray(value), jnp.asarray(iloc), jnp.asarray(sw),
                 jnp.asarray(lw))
    ref_box = jax.grad(f_box, argnums=(0, 1, 2))(*args_box)
    ref_inst = jax.grad(f_inst, argnums=(0, 1, 2, 3))(*args_inst)

    monkeypatch.setenv("BOXER_FORCE_PALLAS_SCATTER", "1")
    ba._sample_taps_vjp.cache_clear()
    try:
        with pltpu.force_tpu_interpret_mode():
            got_box = jax.grad(f_box, argnums=(0, 1, 2))(*args_box)
            got_inst = jax.grad(f_inst, argnums=(0, 1, 2, 3))(*args_inst)
    finally:
        ba._sample_taps_vjp.cache_clear()
        sa._build_call_weighted.cache_clear()
        sa._build_call_pmajor_weighted.cache_clear()

    for name, a, b in [("box", got_box, ref_box),
                       ("inst", got_inst, ref_inst)]:
        for i, (x, y) in enumerate(zip(a, b)):
            assert _rel_err(np.asarray(x), np.asarray(y)) < 1e-4, (name, i)
