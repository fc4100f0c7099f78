"""Host batching + device-side ingest with prefetch.

The reference burns host CPU in 16-32 DataLoader workers doing per-frame
cv2/float math and ships float32 tensors over the bus
(SBL_Multilingual_Lip_reading/data_gen.py:270-304, train.py:123).  Here the
host only assembles uint8 batches and tiny integer augmentation plans; one
jitted XLA graph on the device does u8->f32 conversion, ColorNormalize,
per-frame crop, flip and FrameRemoval-gather fused together
(``make_ingest_fn``), and ``prefetch_to_device`` keeps the next batch's
transfer in flight while the current step computes (double buffering).
"""
from __future__ import annotations

import collections
import queue as queue_mod
import threading
import time
from typing import Callable, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .transforms import MEAN, STD

# Largest per-axis crop-offset range handled by the select-based crop
# (RandomCrop draws from [0, 8]: reference cvtransforms.py:28-29).
MAX_SELECT_OFFSET = 8


def device_ingest(clips_u8: jnp.ndarray, offsets: Optional[jnp.ndarray],
                  flip: Optional[jnp.ndarray],
                  frame_map: Optional[jnp.ndarray],
                  crop: int, dtype=jnp.float32,
                  n_frames: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Fused on-device preprocessing.

    clips_u8:  (B, T, H, W) uint8 raw frames
    offsets:   (B, T, 2) int32 per-frame (y, x) crop offsets, or None for a
               static center crop (the eval protocol -- reference test.py
               CenterCrop).  None compiles to a pure slice; the gather
               variant measured ~25x slower than bandwidth at B=256.
    flip:      (B,) bool whole-clip horizontal flip, or None for no flip
    frame_map: (B, T) int32 source-frame gather map (FrameRemoval), or
               None for the identity map
    n_frames:  optional (B,) int32 valid-frame counts: time-pad slots are
               zeroed AFTER normalization, matching the reference's
               pad-after-ColorNormalize order (data_gen.py:293-295 pads the
               normalized clip with 0.0; normalizing a zero uint8 pixel
               would give (0-mean)/std = -2.43 instead)
    Returns (B, T, crop, crop) normalized ``dtype`` frames.
    """
    B, T, H, W = clips_u8.shape

    # FrameRemoval: gather source frames per output slot
    clips = clips_u8 if frame_map is None else jnp.take_along_axis(
        clips_u8, frame_map[:, :, None, None], axis=1)

    if offsets is None:
        c = int(round((H - crop) / 2.0))
        cropped = jax.lax.slice(clips, (0, 0, c, c),
                                (B, T, c + crop, c + crop))
    elif H - crop <= MAX_SELECT_OFFSET and W - crop <= MAX_SELECT_OFFSET:
        # RandomCrop offsets are bounded by 8 (cvtransforms.py:28-29), so
        # the per-frame crop is a 9-way select over static slices per
        # axis, in uint8, with an optimization_barrier between the two
        # axes (without it XLA fuses both stages into one kernel with 81
        # candidate reads).  Measured 4.8 ms @B=240 vs 21.6 ms for the
        # take_along_axis gathers and ~35 ms for a per-clip Pallas kernel
        # (tools/ingest_variant_probe.py, round 3).
        dy = offsets[..., 0][:, :, None, None]
        dx = offsets[..., 1][:, :, None, None]
        acc = clips[:, :, 0:crop, :]
        for k in range(1, H - crop + 1):
            acc = jnp.where(dy == k, clips[:, :, k:k + crop, :], acc)
        acc = jax.lax.optimization_barrier(acc)
        cropped = acc[:, :, :, 0:crop]
        for k in range(1, W - crop + 1):
            cropped = jnp.where(dx == k, acc[:, :, :, k:k + crop], cropped)
    else:
        # Per-frame crop as two axis gathers (rows then columns): one
        # vectorized gather per axis instead of B*T vmapped dynamic_slices
        # (which lower to a per-frame scalar-indexed gather).
        span = jnp.arange(crop, dtype=jnp.int32)[None, None]
        rows = offsets[..., 0:1] + span                     # (B, T, crop)
        cropped = jnp.take_along_axis(clips, rows[..., None], axis=2)
        cols = offsets[..., 1:2] + span                     # (B, T, crop)
        cropped = jnp.take_along_axis(cropped, cols[:, :, None, :], axis=3)
    if flip is not None:
        # flip in uint8 BEFORE the normalize: the per-pixel affine commutes
        # with the spatial reverse (bitwise-identical output) and the
        # select reads 56 MB instead of 446 MB @B=240 (f32 reverse+select
        # measured 3.7 ms/iter on the train-step trace, tools/trace_agg.py)
        cropped = jnp.where(flip[:, None, None, None],
                            cropped[:, :, :, ::-1], cropped)
    x = cropped.astype(jnp.float32) * (1.0 / 255.0)
    x = (x - MEAN) / STD
    if n_frames is not None:
        valid = jnp.arange(T, dtype=jnp.int32)[None, :] < n_frames[:, None]
        x = jnp.where(valid[:, :, None, None], x, 0.0)
    return x.astype(dtype)


def make_ingest_fn(crop: int, dtype=jnp.float32) -> Callable:
    """Jit-compiled ingest closure over static crop size / dtype."""
    def fn(clips_u8, offsets, flip, frame_map):
        return device_ingest(clips_u8, offsets, flip, frame_map, crop, dtype)
    return jax.jit(fn)


class Batcher:
    """Assembles fixed-size batches of numpy arrays from a dataset.

    dataset: indexable with __len__ whose __getitem__ returns a dict of
    numpy arrays (all fixed-shape).  Drops the ragged tail so every batch
    has a static shape (XLA-friendly; the reference's DataLoader default
    keeps ragged tails and pays recompiles it never notices).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True,
                 sampler: Optional[Iterable] = None,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        """Multi-host: pass process_index/process_count (defaults to
        jax.process_index()/count when process_count='auto') and each host
        assembles its disjoint stripe of every *global* batch -- the host
        data sharding over DCN that pairs with a dp mesh (batch_size is the
        GLOBAL batch; all hosts must use the same seed so the shuffled
        order agrees)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.sampler = sampler
        if process_count == "auto":
            process_index, process_count = (jax.process_index(),
                                            jax.process_count())
        self.process_index = process_index or 0
        self.process_count = process_count or 1
        assert batch_size % self.process_count == 0

    def __len__(self):
        if self.sampler is not None:
            return len(self.sampler)
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        if self.sampler is not None:
            for idx_batch in self.sampler:
                yield self._collate([self.dataset[i]
                                     for i in self._local(idx_batch)])
            return
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        stop = (len(order) // self.batch_size * self.batch_size
                if self.drop_last else len(order))
        for s in range(0, stop, self.batch_size):
            idx = self._local(order[s:s + self.batch_size])
            yield self._collate([self.dataset[i] for i in idx])

    def _local(self, global_idx):
        """This host's stripe of a global index batch.

        Strided (idx[p::P]) rather than contiguous so a ragged tail batch
        (drop_last=False) is spread across hosts without dropping samples:
        every global index lands on exactly one host.  NB: on a ragged tail
        host stripes can differ in size by 1 -- fine for host-side eval
        loops, but a multi-host SPMD step needs equal per-host shapes, so
        keep drop_last=True (or batch_size % process_count == 0 tails) when
        feeding a jitted step across processes."""
        if self.process_count == 1:
            return list(global_idx)
        return list(global_idx[self.process_index::self.process_count])

    @staticmethod
    def _collate(samples) -> dict:
        out = {}
        for key in samples[0]:
            out[key] = np.stack([s[key] for s in samples])
        return out


def background_iter(it: Iterable, depth: int = 1) -> Iterator:
    """Run ``it`` on a producer thread, keeping up to ``depth`` items queued.

    Batch assembly (augmentation-plan RNG draws, host label gathers, the
    device-cache ``jnp.take`` dispatch) measured ~150-170 ms/step @B=240
    through the TPU tunnel when run inline between train-step dispatches
    (tools/trainer_rate_probe.py: bare 625 vs chain-1b 457-476 ms/step on a
    ~427 ms device step).  Producing batches on a thread overlaps all of it
    with device compute.  JAX dispatch is thread-safe; the gathered clip
    batches the queue can hold are ~66 MB each at B=240, so keep ``depth``
    small on HBM-edge configs.

    Producer exceptions re-raise in the consumer.  Closing the generator
    (or exhausting it) stops the thread and closes the wrapped iterator.
    """
    q: queue_mod.Queue = queue_mod.Queue(maxsize=max(1, depth))
    stop = threading.Event()
    _END = object()
    _err: list = []

    def run():
        try:
            for item in it:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue_mod.Full:
                        continue
                if stop.is_set():
                    break
        except BaseException as e:  # noqa: BLE001 -- re-raised consumer-side
            _err.append(e)
        finally:
            if stop.is_set():
                close = getattr(it, "close", None)
                if close is not None:
                    close()
            # Never block forever on the sentinel: after stop is set the
            # consumer no longer needs it (a single untimed q.put(_END)
            # here deadlocked early closes -- the consumer's one-shot
            # drain freed a slot that an in-flight item put immediately
            # refilled, then this put blocked and t.join leaked the
            # thread + its pinned batch).
            while True:
                try:
                    q.put(_END, timeout=0.1)
                    break
                except queue_mod.Full:
                    if stop.is_set():
                        break

    t = threading.Thread(target=run, daemon=True, name="batch-producer")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if _err:
                    raise _err[0]
                return
            yield item
    finally:
        stop.set()
        # Drain interleaved with join until the producer exits: a single
        # drain pass can race an in-flight q.put(item) that refills the
        # queue before the producer reaches its sentinel put.
        deadline = time.monotonic() + 5.0
        while t.is_alive() and time.monotonic() < deadline:
            try:
                q.get_nowait()
            except queue_mod.Empty:
                pass
            t.join(timeout=0.05)


def prefetch_to_device(it: Iterable[dict], size: int = 2,
                       sharding=None) -> Iterator[dict]:
    """Double-buffered host->device transfer: keeps ``size`` batches in
    flight so the accelerator never waits on PCIe.  With a ``sharding``,
    batches land already laid out across the mesh."""
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    it = iter(it)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        batch = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield batch
