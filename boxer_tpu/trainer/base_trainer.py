"""Training orchestrator.

Parity target: reference `e2edet/trainer/base_trainer.py` (load →
device/logger/datasets/model/optimizer, train loop until max_update,
interval-driven checkpoint/eval, resume, inference) and
`e2edet/trainer/engine.py` (hot loop, meters, ETA) — restructured around a
single jitted SPMD train step instead of a DDP process group.
"""

import math
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from boxer_tpu.criterion.losses import build_loss
from boxer_tpu.dataset import build_dataset, build_dataloader
from boxer_tpu.models import build_model
from boxer_tpu.optim import build_optimizer, build_schedule
from boxer_tpu.parallel.mesh import create_mesh, set_default_mesh
from boxer_tpu.parallel.sharding import (
    optimizer_state_shardings,
    param_shardings,
)
from boxer_tpu.parallel.steps import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_inference_step,
    make_train_step,
)
from boxer_tpu.utils.checkpoint import Checkpoint
from boxer_tpu.utils.logger import Logger, ScalarWriter
from boxer_tpu.utils.meter import Meter
from boxer_tpu.utils.registry import TRAINER_REGISTRY
from boxer_tpu.utils.timer import Timer


def register_trainer(name):
    return TRAINER_REGISTRY.register(name)


def build_trainer(configuration):
    """Parity: reference `trainer/__init__.py:8-26` (freezes config)."""
    config = configuration.get_config()
    trainer_cls = TRAINER_REGISTRY.get(config.training.get("trainer",
                                                           "base_trainer"))
    trainer = trainer_cls(configuration)
    configuration.freeze()
    return trainer


@register_trainer("base_trainer")
class BaseTrainer:
    def __init__(self, configuration):
        self.configuration = configuration
        self.config = configuration.get_config()
        self.running_config = self.config.training
        self.current_update = 0
        self.current_epoch = 0
        self.meter = Meter()

    # ------------------------------------------------------------------
    def load(self):
        rc = self.running_config
        self.save_dir = rc.get("save_dir", "./save")
        self.logger = Logger(self.save_dir, level=rc.get("logger_level", "info"),
                             log_format=rc.get("log_format", "simple"))
        self.writer = (ScalarWriter(self.save_dir)
                       if rc.get("tensorboard") else None)
        self.timer = Timer()

        seed = rc.get("seed", -1)
        if seed is None or seed == -1:
            seed = np.random.randint(1, 100000)
        self.seed = int(seed)

        dist = self.config.get("distributed", {}) or {}
        mp = int(dist.get("mp", 1) or 1)
        sp = int(dist.get("sp", 1) or 1)
        dp = dist.get("dp")
        self.mesh = create_mesh(dp=dp, mp=mp, sp=sp)
        self.seq_shard = sp > 1
        set_default_mesh(self.mesh)
        self.zero1 = bool(dist.get("zero1", True))
        self.logger.info(
            f"mesh: dp={self.mesh.shape['dp']} mp={self.mesh.shape['mp']} "
            f"devices={len(jax.devices())} seed={self.seed}")

        self.load_task()
        self.load_model_and_optimizer()
        if self.seq_shard:
            # declare AFTER model init: init traces outside the mesh context
            # (its seq_constraints are no-ops on the untrained params), but
            # every step fn is mesh-wrapped — from here on a constraint that
            # fails to apply is a hard error, not silent unsharded training.
            from boxer_tpu.parallel.sharding import expect_sequence_parallel

            expect_sequence_parallel(True)
        self._init_intervals_and_checkpoint()

    # ------------------------------------------------------------------
    def load_task(self):
        run_type = self.running_config.get("run_type", "train_val_test")
        task_name = self.config.get("task")
        dataset_cfg = self.config.dataset_config[task_name]
        self.datasets: Dict[str, object] = {}
        self.loaders: Dict[str, object] = {}

        splits = []
        if "train" in run_type:
            splits.append("train")
        if "val" in run_type:
            splits.append("val")
        if "test" in run_type:
            splits.append("test")

        bs = int(self.running_config.get("batch_size", 16))
        ipu = int(self.running_config.get("iter_per_update", 1))
        workers = int(self.running_config.get("num_workers", 2))
        # async H2D: the loader thread device_puts the next batch (dp-sharded)
        # while the current step computes — the reference's side-stream
        # Prefetcher (`dataset/helper/prefetcher.py:11-62`) in JAX terms
        def device_put(batch):
            import jax as _jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P(None, "dp"))

            def put(x):
                try:
                    return _jax.device_put(x, sh)
                except ValueError:
                    return _jax.device_put(
                        x, NamedSharding(self.mesh, P()))

            return _jax.tree_util.tree_map(put, batch)

        for split in splits:
            ds = build_dataset(task_name, dataset_cfg, split)
            if ds is None:
                continue
            self.datasets[split] = ds
            self.loaders[split] = build_dataloader(
                ds, split, batch_size=bs, num_workers=workers,
                iter_per_update=ipu if split == "train" else 1,
                seed=self.seed, device_put=device_put)
        if "train" in self.datasets:
            self.num_classes = self.datasets["train"].get_answer_size()
        elif self.datasets:
            self.num_classes = next(iter(self.datasets.values())).get_answer_size()
        else:
            raise RuntimeError("No datasets loaded")

    # ------------------------------------------------------------------
    def load_model_and_optimizer(self):
        rc = self.running_config
        model_name = self.config.get("model")
        model_cfg = self.config.model_config[model_name]
        mixed = rc.get("mixed_precision", "bfloat16")
        dtype = jnp.bfloat16 if mixed == "bfloat16" else jnp.float32
        self.model = build_model(model_cfg, self.num_classes, dtype=dtype,
                                 seq_shard=getattr(self, "seq_shard", False))

        ipu = int(rc.get("iter_per_update", 1))
        self.criterion = build_loss(model_cfg["loss"], self.num_classes, ipu)

        # init params on a representative input (2D canvas or 3D voxel batch)
        ds = next(iter(self.datasets.values()))
        self.static_batch = None
        self.static_batch_train = None
        if hasattr(ds, "grid_shape"):
            bs = int(rc.get("batch_size", 16)) // max(jax.process_count(), 1)
            self.static_batch = {"grid_shape": ds.grid_shape,
                                 "batch_size": bs}
            # train microbatches carry bs/ipu samples each (grad accumulation
            # splits the voxel capacity per sample, loader.py)
            self.static_batch_train = {"grid_shape": ds.grid_shape,
                                       "batch_size": max(1, bs // ipu)}
            v = jnp.zeros((8, 20, 5), jnp.float32)
            c = jnp.zeros((8, 4), jnp.int32)
            npv = jnp.ones((8,), jnp.int32)
            variables = jax.jit(
                lambda r: self.model.init(r, v, c, npv, ds.grid_shape, bs,
                                          train=False)
            )(jax.random.PRNGKey(self.seed))
        else:
            ch, cw = getattr(ds, "canvas", (256, 256))
            image = jnp.zeros((1, ch, cw, 3), jnp.float32)
            mask = jnp.zeros((1, ch, cw), bool)
            variables = jax.jit(
                lambda r: self.model.init(r, image, mask, train=False)
            )(jax.random.PRNGKey(self.seed))
        params = variables["params"]
        constants = variables.get("constants")

        # pretrained backbone weights
        bb_cfg = model_cfg.get("backbone")
        if bb_cfg is not None:
            ppath = bb_cfg["params"].get("pretrained_path")
            if ppath and os.path.exists(ppath):
                from boxer_tpu.utils.torch_port import (
                    apply_backbone_weights, load_torch_checkpoint)

                sd = load_torch_checkpoint(ppath)
                merged = apply_backbone_weights(
                    {"params": params["backbone"],
                     "constants": constants["backbone"]}, sd)
                params = dict(params)
                params["backbone"] = merged["params"]
                constants = dict(constants)
                constants["backbone"] = merged["constants"]
                self.logger.info(f"Loaded pretrained backbone from {ppath}")

        opt_cfg = self.config.get("optimizer", {}).to_dict() \
            if hasattr(self.config.get("optimizer", {}), "to_dict") \
            else dict(self.config.get("optimizer", {}))
        opt_cfg.setdefault("params", {})
        opt_cfg["params"]["deform_lr_multi"] = model_cfg.get(
            "deform_lr_multi", 1.0)
        sched_cfg = self.config.get("scheduler", {})
        base_lr = opt_cfg["params"].get("lr", 1e-4)
        if sched_cfg and "type" in sched_cfg:
            sched_cfg = (sched_cfg.to_dict()
                         if hasattr(sched_cfg, "to_dict") else dict(sched_cfg))
            # epoch-clock schedulers (reference `lr_scheduler.py:108-144`)
            # need the epoch length in update steps
            sched_params = dict(sched_cfg.get("params", {}))
            if "train" in getattr(self, "loaders", {}):
                sched_params["_steps_per_epoch"] = max(
                    1, len(self.loaders["train"]))
            sched_cfg["params"] = sched_params
            self.schedule = build_schedule(sched_cfg, base_lr)
        else:
            self.schedule = None
        self.tx, _ = build_optimizer(opt_cfg, params, self.schedule)

        state = create_train_state(params, constants, self.tx)

        # shardings
        from jax.sharding import NamedSharding, PartitionSpec as P

        p_sh = param_shardings(self.mesh, state.params)
        c_sh = (jax.tree_util.tree_map(
            lambda _: NamedSharding(self.mesh, P()), state.constants)
            if state.constants is not None else None)
        o_sh = optimizer_state_shardings(self.mesh, state.opt_state,
                                         zero1=self.zero1)
        self.state_shardings = TrainState(
            step=NamedSharding(self.mesh, P()), params=p_sh,
            constants=c_sh, opt_state=o_sh)
        self.state = jax.device_put(state, self.state_shardings)

        from boxer_tpu.criterion.metrics import build_metrics

        metric_cfg = model_cfg.get("metric")
        metrics = build_metrics(
            metric_cfg.to_dict() if hasattr(metric_cfg, "to_dict")
            else metric_cfg)
        max_norm = float(rc.get("max_norm", 0) or 0)
        def with_mesh(fn):
            # the sp token-axis constraints use bare PartitionSpecs, which
            # resolve against the ambient mesh context at trace time
            mesh = self.mesh

            def wrapped(*a, **k):
                with mesh:
                    return fn(*a, **k)

            return wrapped

        self._train_step = with_mesh(jax.jit(
            make_train_step(self.model, self.criterion, self.tx,
                            max_norm=max_norm, iter_per_update=ipu,
                            static=self.static_batch_train, metrics=metrics),
            out_shardings=(self.state_shardings, None), donate_argnums=(0,)))
        self._eval_step = with_mesh(jax.jit(
            make_eval_step(self.model, self.criterion,
                           static=self.static_batch)))
        self._inference_step = with_mesh(jax.jit(
            make_inference_step(self.model, static=self.static_batch)))
        self._rng = jax.random.PRNGKey(self.seed + 7)

        n_params = sum(int(np.prod(l.shape))
                       for l in jax.tree_util.tree_leaves(self.state.params))
        self.logger.info(f"Model parameters: {n_params / 1e6:.1f}M")

    # ------------------------------------------------------------------
    def _init_intervals_and_checkpoint(self):
        rc = self.running_config
        self.max_update = int(rc.get("max_update") or 0)
        max_epoch = rc.get("max_epoch")
        if "train" in self.loaders:
            updates_per_epoch = max(1, len(self.loaders["train"]))
            if max_epoch and not self.max_update:
                self.max_update = int(max_epoch * updates_per_epoch)
            # intervals in epoch-fractions (reference base_trainer.py:161-166)
            ci = rc.get("checkpoint_interval", 1000)
            ei = rc.get("evaluation_interval", 1000)
            self.checkpoint_interval = int(
                ci * updates_per_epoch if isinstance(ci, float) and ci <= 1
                else ci)
            self.evaluation_interval = int(
                ei * updates_per_epoch if isinstance(ei, float) and ei <= 1
                else ei)
        self.log_interval = int(rc.get("log_interval", 100))

        self.checkpoint = Checkpoint(
            self.save_dir, num_checkpoint=int(rc.get("num_checkpoint", 1)))
        self.checkpoint.save_config(self.config)

        self._resume_skip_batches = 0
        if rc.get("resume") or rc.get("resume_file"):
            restored, extra = self.checkpoint.restore(self.state)
            if restored is not None:
                self.state = restored
                self.current_update = int(self.state.step)
                if extra:
                    self.current_epoch = int(extra.get("epoch", 0))
                if "train" in self.loaders:
                    # mid-epoch position (reference base_trainer.py:221-233)
                    self._resume_skip_batches = (
                        self.current_update % max(len(self.loaders["train"]), 1))
                self.logger.info(
                    f"Resumed from update {self.current_update} "
                    f"(skipping {self._resume_skip_batches} batches)")

    # ------------------------------------------------------------------
    def train(self):
        from boxer_tpu.trainer.engine import train_epoch

        if "train" not in self.loaders:
            return self.inference()
        self.logger.info(f"Starting training: max_update={self.max_update}")
        while self.current_update < self.max_update:
            self.loaders["train"].sampler.set_epoch(self.current_epoch)
            train_epoch(self)
            self.current_epoch += 1
        self.finalize()

    def finalize(self):
        if "val" in self.loaders:
            self.evaluate("val")
        if "test" in self.loaders:
            self.inference()
        self.checkpoint.finalize(self.state.params)
        self.logger.info("Training finalized.")

    # ------------------------------------------------------------------
    def evaluate(self, split: str):
        from boxer_tpu.trainer.engine import evaluate

        return evaluate(split, self)

    def inference(self):
        from boxer_tpu.trainer.engine import evaluate

        if "test" in self.loaders:
            return evaluate("test", self)
        return None

    # ------------------------------------------------------------------
    def next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def calculate_time_left(self, updates_done_window, window_seconds):
        if updates_done_window <= 0:
            return "n/a"
        ups = updates_done_window / max(window_seconds, 1e-6)
        remaining = max(self.max_update - self.current_update, 0)
        secs = remaining / max(ups, 1e-9)
        m, s = divmod(secs, 60)
        h, m = divmod(m, 60)
        return f"{int(h):02d}:{int(m):02d}:{int(s):02d}"
