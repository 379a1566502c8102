"""Honest combine-kernel shootout (round 5 flagship work).

The trace shows the fused combine kernels cost ~11.7 ms/step in the encoder
(24 calls) + ~5 ms in the decoder against a ~2 ms HBM byte floor. The prior
microbench (bench_combine.py) wall-clocked 0.025 ms for a 148 MB-payload
call — physically impossible (rule 8: tunnel wall-clock lies). This harness
times kernels with an IN-GRAPH serially-chained fori_loop (each iteration's
weights depend on the previous output, so the device cannot overlap or elide
iterations), wall-clocking ONE dispatch of the whole loop.

Variants:
  cur     — production p-major kernel (grid (mc, p), f32 scratch acc)
  onepass — single-pass: block loads all P payload chunks per m-chunk,
            accumulates locally, one output write, no cross-step scratch
  early   — like cur but collapses corners per step (acc (CB, ch))
  xla     — the XLA combine chain (multiply + tree reduce)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from boxer_tpu.ops.pallas.combine_reduce import fused_combine_reduce

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@functools.lru_cache(maxsize=None)
def _build_onepass(p: int, m: int, ch: int, cb: int):
    nmc = pl.cdiv(m, cb)

    def kernel(g_ref, w_ref, o_ref):
        cc = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 1) // ch
        sel = (cc == jj).astype(jnp.float32)
        acc = jnp.zeros((cb, 4 * ch), jnp.float32)
        for pi in range(p):
            g = g_ref[pi].astype(jnp.float32)           # (CB, 4ch)
            w = w_ref[pi]                               # (4, CB)
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
def _build_early(p: int, m: int, ch: int, cb: int):
    nmc = pl.cdiv(m, cb)

    def kernel(g_ref, w_ref, o_ref, acc):
        pi = pl.program_id(1)

        @pl.when(pi == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        g = g_ref[0].astype(jnp.float32)
        w = w_ref[0]
        cc = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 1) // ch
        sel = (cc == jj).astype(jnp.float32)
        wf = jax.lax.dot_general(w, sel, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        prod = g * wf
        c = (prod[:, 0 * ch:1 * ch] + prod[:, 1 * ch:2 * ch]
             + prod[:, 2 * ch:3 * ch] + prod[:, 3 * ch:4 * ch])
        acc[:] = acc[:] + c

        @pl.when(pi == p - 1)
        def _():
            o_ref[...] = acc[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, ch), jnp.float32),
        grid=(pl.cdiv(m, cb), p),
        in_specs=[
            pl.BlockSpec((1, cb, 4 * ch), lambda mc, pi: (pi, mc, 0)),
            pl.BlockSpec((1, 4, cb), lambda mc, pi: (pi, 0, mc)),
        ],
        out_specs=pl.BlockSpec((cb, ch), lambda mc, pi: (mc, 0)),
        scratch_shapes=[pltpu.VMEM((cb, ch), jnp.float32)],
    )


def _xla_chain(g, w, p, m):
    ch = g.shape[1] // 4
    g4 = g.reshape(p, m, 4, ch).astype(jnp.float32)
    # lane-slice consumption (rule 4): per-corner slices * weights, reduce
    out = jnp.zeros((m, ch), jnp.float32)
    for pi in range(p):
        for c in range(4):
            out = out + g[pi * m:(pi + 1) * m,
                          c * ch:(c + 1) * ch].astype(jnp.float32) \
                * w[pi, c][:, None]
    return out


def timed_ingraph(f, g, w, reps=30, n_time=3):
    @jax.jit
    def run(g, w):
        def body(i, carry):
            w_c, s = carry
            out = f(g, w_c)
            s2 = out[0, 0].astype(jnp.float32)
            w_c2 = w_c * (1.0 + 1e-30 * s2)
            return (w_c2, s + s2)
        wc, s = jax.lax.fori_loop(0, reps, body, (w, jnp.float32(0.0)))
        return s
    s = run(g, w)
    jax.block_until_ready(s)
    best = 1e9
    for _ in range(n_time):
        t0 = time.perf_counter()
        s = run(g, w)
        jax.block_until_ready(s)
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


def run_level(p, m, ch=32):
    key = jax.random.PRNGKey(0)
    n = p * m
    k1, k2 = jax.random.split(key)
    g = jax.random.normal(k1, (n, 4 * ch), jnp.bfloat16)
    w = jax.random.uniform(k2, (p, 4, m), jnp.float32)
    floor_ms = n * 4 * ch * 2 / 819e9 * 1e3

    res = {}
    res["cur"] = timed_ingraph(
        lambda g, w: fused_combine_reduce(g, w, p, m), g, w)
    for cb in (512, 1024, 2048):
        if p * cb * 4 * ch * 2 > 8 * 2 ** 20:   # payload block > 8 MB: skip
            continue
        try:
            f = _build_onepass(p, m, ch, cb)
            res[f"onepass{cb}"] = timed_ingraph(
                lambda g, w, f=f: f(g.reshape(p, m, 4 * ch),
                                    w.reshape(p, 4, m)), g, w)
        except Exception as e:
            res[f"onepass{cb}"] = f"FAIL {str(e)[:80]}"
    for cb in (2048, 4096):
        try:
            f = _build_early(p, m, ch, cb)
            res[f"early{cb}"] = timed_ingraph(
                lambda g, w, f=f: f(g.reshape(p, m, 4 * ch),
                                    w.reshape(p, 4, m)), g, w)
        except Exception as e:
            res[f"early{cb}"] = f"FAIL {str(e)[:80]}"
    res["xla"] = timed_ingraph(lambda g, w: _xla_chain(g, w, p, m), g, w)

    # parity check of best pallas variants vs xla
    o_ref = jax.jit(lambda g, w: _xla_chain(g, w, p, m))(g, w)
    o_cur = jax.jit(lambda g, w: fused_combine_reduce(g, w, p, m))(g, w)
    err = float(jnp.max(jnp.abs(o_cur - o_ref)))

    line = f"P={p} M={m} floor={floor_ms:.3f} ms | " + " | ".join(
        f"{k} {v:.3f}" if isinstance(v, float) else f"{k} {v}"
        for k, v in res.items()) + f" | cur-vs-xla err {err:.1e}"
    print(line, flush=True)


if __name__ == "__main__":
    from boxer_tpu.utils.chip_lock import chip_lock

    with chip_lock():
        # encoder levels at 800x1216 (M = 8 heads x tokens-per-level)
        run_level(4, 8 * 15200)
        run_level(4, 8 * 3800)
        run_level(4, 8 * 950)
        run_level(4, 8 * 247)
        # decoder instance-attn combine scale
        run_level(196, 8 * 300)
