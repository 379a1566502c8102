from boxer_tpu.trainer.base_trainer import (
    BaseTrainer,
    build_trainer,
    register_trainer,
)

__all__ = ["BaseTrainer", "build_trainer", "register_trainer"]
