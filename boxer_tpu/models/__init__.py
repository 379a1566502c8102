"""Model registry + builder.

Parity: reference `e2edet/model/__init__.py:13-41` (`build_model`,
`register_model`). Models are Flax modules; `build_model` returns the module
(construction only — param init happens in the trainer).
"""

from boxer_tpu.utils.registry import MODEL_REGISTRY


def register_model(name):
    return MODEL_REGISTRY.register(name)


def build_model(config, num_classes: int, dtype=None, seq_shard: bool = False):
    """config: the per-model config node (e.g. config.model_config.boxer2d)."""
    import jax.numpy as jnp

    model_type = config.get("type")
    cls = MODEL_REGISTRY.get(model_type)
    kwargs = {}
    if seq_shard:
        kwargs["seq_shard"] = True   # models without sp support reject it
    return cls.from_config(config, num_classes, dtype=dtype or jnp.float32,
                           **kwargs)


# populate registry
from boxer_tpu.models.boxer2d import BoxeR2D  # noqa: E402,F401
from boxer_tpu.models.detr import DETR  # noqa: E402,F401
from boxer_tpu.models.boxer3d import BoxeR3D  # noqa: E402,F401

__all__ = ["register_model", "build_model", "BoxeR2D", "DETR", "BoxeR3D"]
