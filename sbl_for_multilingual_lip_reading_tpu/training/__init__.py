from .loss import cal_performance, label_smoothed_ce, classify_loss
from .schedule import noam_schedule, make_optimizer
from .state import TrainState
from .trainer import Trainer, init_state, attach_plans, decode_to_phonemes
from . import checkpoint
from . import steps
