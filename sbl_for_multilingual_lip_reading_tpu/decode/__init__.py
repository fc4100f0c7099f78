from .bigram import build_bigram_matrix, bigram_from_dataset
from .beam import beam_search
