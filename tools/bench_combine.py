"""Microbench: p-major accumulator combine kernel vs m-major streaming
variant, at encoder scale (P=4, M=8*20197) and decoder instance-attn scale
(P=196, M=8*300). Candidate for the round-5 flagship margin work."""
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
def _build_mmajor(p: int, m: int, ch: int, kk: int, out_f32: bool):
    """m-major streaming combine: rows ordered (m, p); block = kk outputs
    (kk*p rows); weights computed in-kernel from lx/ly/wt row vectors."""
    cb = kk * p
    nmc = pl.cdiv(m, kk)

    def kernel(g_ref, lx_ref, ly_ref, wt_ref, o_ref):
        g = g_ref[...].astype(jnp.float32)               # (CB, 4ch)
        lx = lx_ref[...]                                 # (1, CB)
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
        sel = (cc == jj).astype(jnp.float32)
        wf = jax.lax.dot_general(w4, sel, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        prod = g * wf                                    # (CB, 4ch)
        s = prod.reshape(kk, p, 4 * ch).sum(axis=1)      # (kk, 4ch)
        out = (s[:, 0 * ch:1 * ch] + s[:, 1 * ch:2 * ch]
               + s[:, 2 * ch:3 * ch] + s[:, 3 * ch:4 * ch])
        o_ref[...] = out if out_f32 else out.astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (m, ch), jnp.float32 if out_f32 else jnp.bfloat16),
        grid=(nmc,),
        in_specs=[
            pl.BlockSpec((cb, 4 * ch), lambda mc: (mc, 0)),
            pl.BlockSpec((1, cb), lambda mc: (0, mc)),
            pl.BlockSpec((1, cb), lambda mc: (0, mc)),
            pl.BlockSpec((1, cb), lambda mc: (0, mc)),
        ],
        out_specs=pl.BlockSpec((kk, ch), lambda mc: (mc, 0)),
    )


def run(p, m, ch=32, iters=50, kk=None):
    key = jax.random.PRNGKey(0)
    n = p * m
    g = jax.random.normal(key, (n, 4 * ch), jnp.bfloat16)
    lx = jax.random.uniform(key, (p, m), jnp.float32)
    ly = jax.random.uniform(key, (p, m), jnp.float32)
    wt = jax.random.uniform(key, (p, m), jnp.float32)
    w4 = jnp.stack([(1 - lx) * (1 - ly) * wt, lx * (1 - ly) * wt,
                    (1 - lx) * ly * wt, lx * ly * wt], axis=1)   # (P,4,M)

    def timed(f, *args):
        o = f(*args); jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*args)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / iters * 1e3, o

    # current p-major kernel (g rows p-major)
    t_cur, o_cur = timed(jax.jit(
        lambda g, w: fused_combine_reduce(g, w, p, m)), g, w4)

    # m-major: rows reordered (m, p); weights flattened m-major
    g_m = g.reshape(p, m, 4 * ch).transpose(1, 0, 2).reshape(n, 4 * ch)
    lx_m = lx.T.reshape(1, n)
    ly_m = ly.T.reshape(1, n)
    wt_m = wt.T.reshape(1, n)
    if kk is None:
        kk = max(1, 4096 // p) if p > 8 else 1024
    for kk_try in ([kk] if isinstance(kk, int) else kk):
        for f32 in (True, False):
            try:
                f = _build_mmajor(p, m, ch, kk_try, f32)
                t_m, o_m = timed(jax.jit(f), g_m, lx_m, ly_m, wt_m)
                err = float(jnp.max(jnp.abs(
                    o_m.astype(jnp.float32) - o_cur)))
                print(f"P={p} M={m} kk={kk_try} out_f32={f32}: "
                      f"p-major {t_cur:.3f} ms vs m-major {t_m:.3f} ms "
                      f"(err {err:.2e})", flush=True)
            except Exception as e:
                print(f"P={p} M={m} kk={kk_try} out_f32={f32}: FAILED "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    from boxer_tpu.utils.chip_lock import chip_lock

    with chip_lock():
        run(4, 8 * 20197, kk=[512, 1024, 2048])    # encoder level-0 scale
        run(196, 8 * 300, kk=[4, 8, 16])           # decoder instance scale
