from .checkpoints import CheckpointManager, is_stage_done, mark_stage_done
from .loggers import get_logger
from .metrics import MetricAccumulator, write_results_csv
from .state import (OptimConfig, TrainState, eval_step,
                    make_generative_epoch, train_step)

__all__ = ["CheckpointManager", "is_stage_done", "mark_stage_done",
           "get_logger", "MetricAccumulator", "write_results_csv",
           "OptimConfig", "TrainState", "eval_step", "make_generative_epoch",
           "train_step"]
