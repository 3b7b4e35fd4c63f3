from acezero_tpu.training.loss import ReproLossConfig, repro_loss
from acezero_tpu.training.schedule import ScheduleConfig, ScheduleState, init_schedule, schedule_lr, schedule_update
from acezero_tpu.training.optim import AdamWState, adamw_init, adamw_update
from acezero_tpu.training.buffer import BufferConfig, fill_training_buffer
from acezero_tpu.training.trainer import TrainConfig, MappingTrainer

__all__ = [
    "ReproLossConfig",
    "repro_loss",
    "ScheduleConfig",
    "ScheduleState",
    "init_schedule",
    "schedule_lr",
    "schedule_update",
    "AdamWState",
    "adamw_init",
    "adamw_update",
    "BufferConfig",
    "fill_training_buffer",
    "TrainConfig",
    "MappingTrainer",
]
