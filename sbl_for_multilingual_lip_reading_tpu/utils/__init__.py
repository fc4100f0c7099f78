from .metrics import levenshtein, wer_compute, per_compute, AverageMeter, topk_accuracy
from .logging import get_logger
