"""Dataset registry + builders.

Parity: reference `e2edet/dataset/__init__.py:19-93` (`build_dataset`,
`build_dataloader`, `register_task`).
"""

from typing import Optional

from boxer_tpu.utils.registry import TASK_REGISTRY


def register_task(name):
    return TASK_REGISTRY.register(name)


def build_dataset(task_name: str, dataset_config, dataset_type: str):
    """Returns None when the split's annotation file doesn't exist (so
    partial run_types work without the full corpus on disk)."""
    import os

    imdb_files = dataset_config.get("imdb_files", {})
    if dataset_type not in imdb_files:
        return None
    imdb = imdb_files[dataset_type]
    cfg = dataset_config.to_dict() if hasattr(dataset_config, "to_dict") \
        else dict(dataset_config)
    imdb = dict(imdb) if not isinstance(imdb, dict) else imdb

    task_cls = TASK_REGISTRY.get(task_name)
    root = os.environ.get("E2E_DATASETS", ".")
    index_file = imdb.get("anno_file") or imdb.get("info_path")
    index_path = (index_file if os.path.isabs(index_file)
                  else os.path.join(root, index_file))
    if not os.path.exists(index_path):
        return None
    return task_cls(cfg, dataset_type, imdb)


def build_dataloader(dataset, dataset_type: str, batch_size: int,
                     num_workers: int = 2, iter_per_update: int = 1,
                     seed: int = 0, device_put=None):
    import jax

    from boxer_tpu.dataset.helper.loader import DataLoader
    from boxer_tpu.dataset.helper.sampler import (
        DistributedSampler,
        ShardDistributedSampler,
    )

    cache_mode = bool(getattr(dataset, "config", {}).get("cache_mode", False))
    sampler_cls = ShardDistributedSampler if cache_mode else DistributedSampler
    sampler = sampler_cls(
        len(dataset),
        num_replicas=jax.process_count(),
        rank=jax.process_index(),
        shuffle=(dataset_type == "train"),
        seed=seed,
    )
    return DataLoader(
        dataset, sampler, batch_size=batch_size, num_workers=num_workers,
        iter_per_update=iter_per_update,
        drop_last=(dataset_type == "train" and iter_per_update > 1),
        seed=seed, device_put=device_put)


# populate registry
from boxer_tpu.dataset.coco import COCODetection  # noqa: E402,F401
from boxer_tpu.dataset.waymo import WaymoDetection  # noqa: E402,F401
