"""TPU-native (JAX/XLA/Pallas) framework with the capabilities of
VIPL-Audio-Visual-Speech-Understanding/SBL_For_Multilingual_Lip_Reading.

One framework, four workloads (reference had four copy-pasted projects):

* ``classify``  -- visual-frontend pretraining (1500-way word + 2-way language)
* ``lrw``       -- English phoneme seq2seq on LRW
* ``lrw1000``   -- Mandarin phoneme seq2seq on LRW-1000 (+ beam search)
* ``sbl``       -- synchronous bidirectional multilingual model (headline)
"""

__version__ = "0.1.0"

from . import config
from . import vocab
