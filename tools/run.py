"""CLI entry point.

Surface parity with reference `tools/run.py` + `utils/env.py:80-107`:
  python tools/run.py --config <yaml> --task detection --model boxer2d \
      [key.path=value ...]

TPU difference: no per-GPU process spawn (`run.py:43-78`) — JAX SPMD is
single-controller; multi-host pods initialize via `jax.distributed` when the
environment provides coordinator variables.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_parser():
    parser = argparse.ArgumentParser(description="boxer_tpu runner")
    parser.add_argument("--config", type=str, default=None,
                        help="experiment yaml")
    parser.add_argument("--task", type=str, default="detection")
    parser.add_argument("--model", type=str, default="boxer2d")
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="dotlist overrides: key.path=value")
    return parser


def _force_platform_from_env():
    """Honor JAX_PLATFORMS/JAX_PLATFORM_NAME before first jax use.

    Plugin backends (e.g. tunneled TPUs) can take priority over the env vars
    alone; `jax.config.update("jax_platforms", ...)` is authoritative. Without
    this, `JAX_PLATFORMS=cpu python tools/run.py ...` still initializes the
    TPU plugin — and hangs if the chip is unreachable.
    """
    plat = os.environ.get("JAX_PLATFORMS") or os.environ.get(
        "JAX_PLATFORM_NAME")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def run():
    args = get_parser().parse_args()
    _force_platform_from_env()

    # multi-host rendezvous (Slurm/TPU-pod autodetect parity:
    # reference `distributed.py:231-289`): jax.distributed reads the
    # coordinator from env when launched on a pod.
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()

    from boxer_tpu.trainer import build_trainer
    from boxer_tpu.utils.config import Configuration

    configuration = Configuration(
        config_path=args.config,
        opts=args.opts,
        extra={"task": args.task, "model": args.model},
    )
    trainer = build_trainer(configuration)
    trainer.load()

    run_type = trainer.running_config.get("run_type", "train_val_test")
    if "train" in run_type:
        trainer.train()
    elif "val" in run_type:
        trainer.evaluate("val")
    else:
        trainer.inference()


if __name__ == "__main__":
    run()
