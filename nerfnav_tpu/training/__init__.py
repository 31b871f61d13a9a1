from nerfnav_tpu.training.metrics import PSNRMeter, LPIPSMeter
from nerfnav_tpu.training.trainer import Trainer, TrainerOptions, TrainState

__all__ = ["PSNRMeter", "LPIPSMeter", "Trainer", "TrainerOptions", "TrainState"]
