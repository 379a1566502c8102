"""Device mesh construction.

TPU-native replacement for the reference's process-per-GPU NCCL world
(`tools/run.py:43-78`, `utils/distributed.py:231-324`): a single-controller
SPMD mesh with named axes
  dp — data parallelism (gradient psum rides ICI; replaces DDP all-reduce)
  mp — model/tensor parallelism (attention heads + FFN hidden sharding)

The reference has no TP (SURVEY §2.3); `mp=1` reproduces its pure-DP layout,
while `mp>1` is the scale-out extension the TPU build adds.
  sp — sequence parallelism over the flattened multi-scale token axis
       (~20k tokens at 1024^2 LSJ, SURVEY §5 "long-context"): tokens are
       sharded for every elementwise/matmul site; XLA all-gathers the quad
       tables for the box-attention sampling automatically.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

_DEFAULT_MESH: Optional[Mesh] = None


def create_mesh(dp: Optional[int] = None, mp: int = 1, sp: int = 1,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % (mp * sp) == 0, \
            f"{n} devices not divisible by mp({mp})*sp({sp})"
        dp = n // (mp * sp)
    assert dp * mp * sp == n, \
        f"dp({dp}) * sp({sp}) * mp({mp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, sp, mp)
    return Mesh(arr, axis_names=("dp", "sp", "mp"))


def get_default_mesh() -> Mesh:
    global _DEFAULT_MESH
    if _DEFAULT_MESH is None:
        _DEFAULT_MESH = create_mesh()
    return _DEFAULT_MESH


def set_default_mesh(mesh: Mesh):
    global _DEFAULT_MESH
    _DEFAULT_MESH = mesh
