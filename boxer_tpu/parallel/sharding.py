"""Sharding rules: batch DP, parameter TP, ZeRO-1 optimizer-state sharding.

TPU-native equivalents of the reference's parallelism surface (SURVEY §2.3):
- DP gradient all-reduce (DDP, `base_trainer.py:123-128`) — implicit `psum`
  from sharding the batch leading dim over the ``dp`` axis under jit.
- OSS/ZeRO-1 (`optim/oss.py:90-212,635-686` greedy param partition + param
  broadcast) — optimizer-state leaves sharded over ``dp``; XLA inserts the
  equivalent reduce-scatter/all-gather pattern automatically.
- TP (absent in the reference) — ``mp`` axis shards attention/FFN kernels.
"""

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Dense kernels sharded over their OUTPUT features on mp
_TP_OUT_NAMES = ("linear1", "value_proj", "query", "key", "value")
# Dense kernels sharded over their INPUT features on mp (row-parallel)
_TP_IN_NAMES = ("linear2", "out_proj", "out")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading dim over dp, rest replicated."""
    return NamedSharding(mesh, P("dp"))


def _path_names(path):
    return [str(getattr(p, "key", p)) for p in path]


def param_spec(path, leaf, mp_size: int) -> P:
    """TP rule for one parameter leaf."""
    if mp_size <= 1 or leaf.ndim == 0:
        return P()
    names = _path_names(path)
    is_kernel = names[-1] == "kernel" and leaf.ndim >= 2
    if not is_kernel:
        return P()
    parent = names[-2] if len(names) >= 2 else ""
    if any(n in parent for n in _TP_OUT_NAMES) and leaf.shape[-1] % mp_size == 0:
        return P(*([None] * (leaf.ndim - 1) + ["mp"]))
    if any(n in parent for n in _TP_IN_NAMES) and leaf.shape[-2] % mp_size == 0:
        return P(*([None] * (leaf.ndim - 2) + ["mp", None]))
    return P()


def param_shardings(mesh: Mesh, params) -> Any:
    mp_size = mesh.shape.get("mp", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf, mp_size)),
        params,
    )


def _zero1_spec(path, leaf, dp_size: int, mp_size: int) -> P:
    """ZeRO-1: shard the largest divisible axis of each optimizer-moment leaf
    over dp (keeping any TP sharding of the matching param axis)."""
    if leaf.ndim == 0 or dp_size <= 1:
        return param_spec(path, leaf, mp_size)
    base = list(param_spec(path, leaf, mp_size))
    base = base + [None] * (leaf.ndim - len(base))
    # choose the largest axis divisible by dp that is not already sharded
    order = sorted(range(leaf.ndim), key=lambda i: -leaf.shape[i])
    for ax in order:
        if base[ax] is None and leaf.shape[ax] % dp_size == 0 and leaf.shape[ax] >= dp_size:
            base[ax] = "dp"
            return P(*base)
    return P(*base)


def optimizer_state_shardings(mesh: Mesh, opt_state, zero1: bool = True) -> Any:
    """Shardings for the optax state pytree. Moment tensors (same shape as
    params) are dp-sharded when `zero1`; scalars (step counts) replicated."""
    dp_size = mesh.shape.get("dp", 1)
    mp_size = mesh.shape.get("mp", 1)

    def spec(path, leaf):
        if not hasattr(leaf, "ndim"):
            return NamedSharding(mesh, P())
        if zero1:
            return NamedSharding(mesh, _zero1_spec(path, leaf, dp_size, mp_size))
        return NamedSharding(mesh, param_spec(path, leaf, mp_size))

    return jax.tree_util.tree_map_with_path(spec, opt_state)


# Set by `expect_sequence_parallel` when the trainer builds an sp>1 mesh;
# makes a failed seq_constraint a hard error instead of a silent no-op.
_SP_EXPECTED = False


def expect_sequence_parallel(enabled: bool = True):
    """Declare that sequence parallelism is configured (sp > 1). After this,
    `seq_constraint` failing to apply (no active mesh context at trace time)
    raises instead of silently training unsharded."""
    global _SP_EXPECTED
    _SP_EXPECTED = bool(enabled)


def seq_constraint(x, token_axis: int = 1):
    """Shard a (..., S, ...) token-axis tensor over the ``sp`` mesh axis
    (batch over dp). Requires an active mesh context at trace time
    (`with mesh:` around the jit call); no-op outside one — unless
    `expect_sequence_parallel(True)` was declared, in which case a missing
    mesh context is a hard error (silent unsharded training is a trap).

    This is the SURVEY §5 long-context design addition: the ~20k-token
    flattened multi-scale sequence is sharded for every elementwise /
    matmul / per-query sampling site, and XLA's SPMD partitioner inserts
    the all-gather of the (small, bf16) quad tables that the arbitrary-
    index box-attention gathers need.
    """
    spec = [None] * x.ndim
    spec[0] = "dp"
    spec[token_axis] = "sp"
    try:
        return jax.lax.with_sharding_constraint(x, P(*spec))
    except (ValueError, RuntimeError, AssertionError) as e:
        if _SP_EXPECTED:
            raise RuntimeError(
                "seq_constraint could not apply the sp sharding (no active "
                "mesh context at trace time?) but sequence parallelism was "
                "configured — refusing to trace an unsharded step. Wrap the "
                f"jit call in `with mesh:`. Original error: {e}") from e
        return x


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with dp sharding on every array's leading dim."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
