from biom3_tpu.training.optim import make_optimizer, coswarmup_schedule
from biom3_tpu.training.ema import ema_update, ema_init
from biom3_tpu.training.state import TrainState

__all__ = [
    "make_optimizer",
    "coswarmup_schedule",
    "ema_update",
    "ema_init",
    "TrainState",
]
