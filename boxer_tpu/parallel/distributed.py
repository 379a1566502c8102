"""Multi-host process utilities.

Parity surface for the reference's `e2edet/utils/distributed.py` in
single-controller JAX terms:
- get_rank/get_world_size/is_master (:35-60)  -> process_index/process_count
- synchronize (NCCL barrier, :31-36)          -> sync_global_devices
- gather/all_gather of picklables over gloo (:146-215)
                                              -> process_allgather of bytes
- broadcast_scalar/tensor (:90-113)           -> host broadcast via allgather
- shared_random_seed (:218-228)
- infer_init_method / distributed_init (:231-324)
                                              -> jax.distributed.initialize
  (coordinator from env on TPU pods; no per-GPU process spawn needed)
- suppress_output on non-master (:327-351)    -> logger gating (utils/logger)
"""

import pickle
from typing import Any, List

import numpy as np


def get_rank() -> int:
    import jax

    return jax.process_index()


def get_world_size() -> int:
    import jax

    return jax.process_count()


def is_master() -> bool:
    return get_rank() == 0


def is_dist_avail_and_initialized() -> bool:
    return get_world_size() > 1


def synchronize(name: str = "sync"):
    """Global barrier across hosts (reference `synchronize`)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def all_gather(data: Any) -> List[Any]:
    """All-gather arbitrary picklables across hosts (reference
    `all_gather`, gloo-backed; here DCN via process_allgather)."""
    world = get_world_size()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), np.uint8)
    # pad to max length across hosts
    n = np.asarray([payload.size])
    sizes = multihost_utils.process_allgather(n).reshape(-1)
    max_n = int(sizes.max())
    padded = np.zeros((max_n,), np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i][:int(sizes[i])].tobytes())
            for i in range(world)]


def gather(data: Any, dst: int = 0) -> List[Any]:
    """Gather picklables to `dst` (others get []); reference `gather`."""
    out = all_gather(data)
    return out if get_rank() == dst else []


def broadcast_scalar(value, src: int = 0):
    """Broadcast a python scalar from src to all hosts."""
    out = all_gather(value)
    return out[src]


def reduce_dict(d, average: bool = True):
    """Mean-reduce a dict of scalars across hosts on host side
    (reference `reduce_dict`, :116-131)."""
    world = get_world_size()
    if world == 1:
        return dict(d)
    gathered = all_gather({k: float(v) for k, v in d.items()})
    out = {}
    for k in d:
        vals = [g[k] for g in gathered]
        out[k] = sum(vals) / (len(vals) if average else 1)
    return out


def shared_random_seed() -> int:
    """Same random seed on every host (reference `shared_random_seed`)."""
    seed = int(np.random.randint(2 ** 31)) if is_master() else 0
    return int(broadcast_scalar(seed, 0))


def initialize_if_needed():
    """jax.distributed.initialize when a coordinator is configured
    (TPU-pod rendezvous; replaces env:///Slurm NCCL init)."""
    import os

    import jax

    if (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")):
        jax.distributed.initialize()
