"""Trace-based combine-kernel shootout (round 5 flagship work).

bench_combine2.py's in-graph-loop wall-clock numbers were internally
inconsistent (a 124 MB-payload call "measured" 0.002 ms; tiny calls a
constant ~0.8 ms) — the axon tunnel's wall clock is unusable at this
granularity even for chained loops. This version measures ONLY device trace
events: each variant runs its reps-loop under jax.profiler.trace and we sum
the device-side op durations attributable to the variant, divided by reps.
"""
import functools
import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.bench_combine2 import _build_onepass, _build_early, _xla_chain
from boxer_tpu.ops.pallas.combine_reduce import fused_combine_reduce


@functools.lru_cache(maxsize=None)
def _build_onepass_big(p: int, m: int, ch: int, cb: int):
    """onepass with a raised VMEM ceiling so 4-8 MB payload blocks fit
    (per-grid-step overhead ~1.4 us dominates at cb<=2048)."""
    nmc = pl.cdiv(m, cb)

    def kernel(g_ref, w_ref, o_ref):
        cc = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * ch), 1) // ch
        sel = (cc == jj).astype(jnp.float32)
        acc = jnp.zeros((cb, 4 * ch), jnp.float32)
        for pi in range(p):
            g = g_ref[pi].astype(jnp.float32)
            w = w_ref[pi]
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2 ** 20),
    )

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = 20


def device_ms(trace_dir):
    """Sum device-op event durations (ms) from the newest trace, excluding
    host-side rows (pid names with 'python'/'profiler')."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    paths.sort(key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    # identify device pids via process_name metadata
    pid_name = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev.get("pid")] = ev.get("args", {}).get("name", "")
    agg = defaultdict(float)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_name.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        agg[ev.get("name", "").split(".")[0]] += ev.get("dur", 0) / 1e3
    return agg


def run_variant(name, f, g, w, trace_dir="/tmp/comb_trace"):
    @jax.jit
    def loop(g, w):
        def body(i, carry):
            w_c, s = carry
            out = f(g, w_c)
            # full-output reduce: slicing one element would let XLA DCE most
            # of the XLA-chain variant (pallas_calls are opaque either way)
            s2 = out.astype(jnp.float32).sum()
            # eps large enough that XLA can't treat the multiply as identity,
            # small enough not to perturb: 1e-12 relative on f32 weights
            w_c2 = w_c * (1.0 + 1e-12 * s2)
            return (w_c2, s + s2)
        _, s = jax.lax.fori_loop(0, REPS, body, (w, jnp.float32(0.0)))
        return s
    s = loop(g, w)
    jax.block_until_ready(s)
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        s = loop(g, w)
        jax.block_until_ready(s)
    agg = device_ms(trace_dir)
    total = sum(agg.values()) / REPS
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:4]
    tops = ", ".join(f"{k}:{v/REPS:.3f}" for k, v in top)
    print(f"  {name:14s} {total:7.3f} ms/call  [{tops}]", flush=True)
    return total


def run_level(p, m, ch=32):
    key = jax.random.PRNGKey(0)
    n = p * m
    k1, k2 = jax.random.split(key)
    g = jax.random.normal(k1, (n, 4 * ch), jnp.bfloat16)
    w = jax.random.uniform(k2, (p, 4, m), jnp.float32)
    floor_ms = n * 4 * ch * 2 / 819e9 * 1e3
    print(f"P={p} M={m} (payload {n*4*ch*2/2**20:.0f} MB, "
          f"byte floor {floor_ms:.3f} ms)", flush=True)

    run_variant("cur", lambda g, w: fused_combine_reduce(g, w, p, m), g, w)
    for cb in (1024, 2048):
        if p * cb * 4 * ch * 2 <= 8 * 2 ** 20:
            try:
                f = _build_onepass(p, m, ch, cb)
                run_variant(f"onepass{cb}",
                            lambda g, w, f=f: f(g.reshape(p, m, 4 * ch),
                                                w.reshape(p, 4, m)), g, w)
            except Exception as e:
                print(f"  onepass{cb} FAIL {str(e)[:90]}", flush=True)
    if p <= 8:
        for cb in (4096, 8192):
            try:
                f = _build_onepass_big(p, m, ch, cb)
                run_variant(f"onepassbig{cb}",
                            lambda g, w, f=f: f(g.reshape(p, m, 4 * ch),
                                                w.reshape(p, 4, m)), g, w)
            except Exception as e:
                print(f"  onepassbig{cb} FAIL {str(e)[:90]}", flush=True)
    run_variant("xla", lambda g, w: _xla_chain(g, w, p, m), g, w)


def run_withgather(p, lq, hl, wl, nh=8, ch=32):
    """End-to-end gather+combine, mimicking the model: vals produced by a
    clip-mode take from a per-head table (not a jit input). Isolates why the
    in-model slices chain pays a 165 MB copy per level that the standalone
    (input-fed) chain does not."""
    m = nh * lq
    stride = (hl + 1) * (wl + 1)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    table = jax.random.normal(k1, (nh * stride, 4 * ch), jnp.bfloat16)
    idx = jax.random.randint(k2, (p, nh, lq), 0, stride, jnp.int32) \
        + jnp.arange(nh, dtype=jnp.int32)[None, :, None] * stride
    w = jax.random.uniform(k3, (p, 4, m), jnp.float32)
    print(f"withgather P={p} M={m} table={nh*stride} rows", flush=True)

    def g_pallas(table, w):
        vals = jnp.take(table, idx.reshape(-1), axis=0, mode="clip")
        return fused_combine_reduce(vals, w, p, m)

    def g_slices(table, w):
        vals = jnp.take(table, idx.reshape(-1), axis=0, mode="clip")
        out = jnp.zeros((m, ch), jnp.float32)
        for pi in range(p):
            rows = slice(pi * m, (pi + 1) * m)
            for ci in range(4):
                out = out + (vals[rows, ci * ch:(ci + 1) * ch]
                             .astype(jnp.float32)
                             * w[pi, ci].reshape(m, 1))
        return out

    run_variant("gather+pallas", g_pallas, table, w)
    run_variant("gather+slices", g_slices, table, w)


if __name__ == "__main__":
    from boxer_tpu.utils.chip_lock import chip_lock

    with chip_lock():
        run_level(4, 8 * 20197)   # true encoder scale (all levels share M)
        # gather-fed comparison at level-0 scale (table 8*101*153 rows)
        run_withgather(4, 20197, 100, 152)
