from . import transforms
from . import manifest
from .synthetic import SyntheticLipDataset, SyntheticPatternDataset
from .datasets import LrwDataset, Lrw1000Dataset, MixedBilingualDataset
from .pipeline import Batcher, device_ingest, make_ingest_fn, prefetch_to_device
from .sampler import TwoStreamBatchSampler
