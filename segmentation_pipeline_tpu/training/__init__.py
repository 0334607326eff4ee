from .context import Context, Ref, TorchContext, list_checkpoint_files
from .model import SegModel, to_channels_first, to_channels_last
from .optimizers import SGD, Adam
from .train_step import (TrainState, collate_to_device, create_train_state,
                         make_spatial_train_step, make_train_step)
from .trainer import ScheduledEvaluation, SegmentationTrainer, install_signal_handlers

__all__ = [k for k in dir() if not k.startswith("_")]
