from .bigram import build_bigram_matrix, bigram_from_dataset
from .beam import (beam_search, beam_search_cached, sbl_beam_search,
                   make_sbl_beam_decoder, make_uni_beam_decoder)
