from .loss import cal_performance, label_smoothed_ce, classify_loss
from .schedule import noam_schedule, make_optimizer
