"""Checkpoint save/resume (orbax).

Parity: reference `e2edet/utils/checkpoint.py` — rolling `model_%d.ckpt`
saves of {model, optimizer, scheduler clock, epoch, update, config}
(:160-192), latest-checkpoint resume (:112-140), pretrained weights-only
load (:19-33), `finalize` weights-only export (:194-196), sanitized config
companion (:91-107).

TPU design: orbax sharded checkpointing of the TrainState pytree — each host
writes its shard (replaces master-only torch.save + OSS consolidate).
"""

import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
import yaml


class Checkpoint:
    def __init__(self, save_dir: str, num_checkpoint: int = 5):
        self.save_dir = os.path.abspath(save_dir)
        self.ckpt_dir = os.path.join(self.save_dir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=num_checkpoint, create=True)
        self.manager = ocp.CheckpointManager(self.ckpt_dir, options=options)

    def save(self, state, update: int, extra: Optional[Dict[str, Any]] = None):
        """state: TrainState pytree; extra: picklable metadata (epoch, config
        snapshot, meters...)."""
        composite = {"state": ocp.args.StandardSave(state)}
        if extra is not None:
            composite["extra"] = ocp.args.JsonSave(_jsonify(extra))
        self.manager.save(update, args=ocp.args.Composite(**composite))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, target_state, step: Optional[int] = None):
        """Restore into the structure of `target_state` (shape/dtype/sharding
        donor). Returns (state, extra|None) or (None, None) if nothing saved."""
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None, None
        restored = self.manager.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(target_state)),
        )
        extra = None
        try:
            extra_restored = self.manager.restore(
                step, args=ocp.args.Composite(extra=ocp.args.JsonRestore()))
            extra = extra_restored.get("extra")
        except Exception:
            pass
        return restored["state"], extra

    def finalize(self, params, name: str = "model_final"):
        """Weights-only export (reference `checkpoint.py:194-196`)."""
        path = os.path.join(self.save_dir, name)
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, params)
        ckptr.wait_until_finished()
        return path

    def load_weights(self, path: str, target_params):
        """Load a weights-only export into target_params' structure."""
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, target=target_params)

    def save_config(self, config):
        """Sanitized yaml companion (reference `checkpoint.py:91-107`)."""
        if jax.process_index() != 0:
            return
        path = os.path.join(self.save_dir, "config.yaml")
        data = config.to_dict() if hasattr(config, "to_dict") else dict(config)
        with open(path, "w") as f:
            yaml.safe_dump(data, f, default_flow_style=False)


def _jsonify(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj
