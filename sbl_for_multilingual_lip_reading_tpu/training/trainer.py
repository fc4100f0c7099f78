"""Workload drivers: the library equivalent of the reference train.py/test.py.

Reproduces the training protocol of SBL_Multilingual_Lip_reading/train.py:
epoch loop -> train() (dual 0.5*(l2r+r2l) loss) -> valid_lrw / valid_lrw1000
(greedy bidirectional recognize, WER+PER per direction) -> best model =
min(l2r_wer_lrw + l2r_wer_lrw1000) (train.py:161-175), and the classify /
LRW / LRW-1000 drivers' loops.

Eval-protocol parity (test.py:185-218): predictions are truncated to
``gold_length + 1`` tokens *before* filtering sos/eos/IGNORE, and WER is
computed over joined phoneme strings (one "word" per clip => WER ==
1 - exact-sequence-match rate).  The reference's quadratic list-duplication
bug in the accumulation loop (train.py:262-276) is NOT reproduced (see
utils/metrics.py).
"""
from __future__ import annotations

import os
import time
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import Batcher, background_iter, prefetch_to_device
from ..data.transforms import make_train_plans
from ..models import build_model
from ..utils.logging import get_logger
from ..utils.metrics import AverageMeter, per_compute, wer_compute
from ..vocab import EOS_ID, IGNORE_ID, SOS_ID, TOTAL_PHONEMES
from . import checkpoint as ckpt
from .schedule import make_optimizer
from .state import TrainState
from .steps import (make_classify_eval_step, make_classify_train_body,
                    make_classify_train_step, make_epoch_fused_step,
                    make_epoch_fused_step_mesh,
                    make_sbl_eval_step, make_sbl_train_body,
                    make_sbl_train_step, make_uni_eval_step,
                    make_uni_train_body, make_uni_train_step)


def attach_plans(batch: Dict, rng: np.random.Generator, cfg,
                 train: bool) -> Dict:
    """Add integer augmentation plans to a raw uint8 batch.

    Crop-plan parity is per-dataset (selected by each sample's lang_id):
    LRW npy clips get *per-frame* offsets in [0, raw-crop] (the reference's
    RandomCrop draws inside the frame loop, cvtransforms.py:28-29) while
    LRW-1000 jpg clips get one *per-clip* offset in [0, (raw-crop)//2]
    (load_images draws x1/y1 once per clip with border = (96-88)//2 = 4,
    SBL data_gen.py:63-66).  Flip + FrameRemoval apply to both
    (data_gen.py:288-291)."""
    B, T = batch["clip_u8"].shape[:2]
    raw, crop = batch["clip_u8"].shape[2], cfg.data.crop_size
    if train:
        lang = np.asarray(batch.get("lang_id", np.zeros(B, np.int32)))
        per_clip = cfg.data.per_clip_crop       # LRW-project protocol
        # one vectorized draw for the whole batch (make_train_plans): the
        # per-sample python builder cost ~130 ms/step @B=240 on a 1-core
        # host -- bigger than any device-side win it gates
        per_frame = (lang == 0) & (not per_clip)
        clip_hi = np.where(lang == 0, raw - crop, (raw - crop) // 2)
        offsets, flip, fmap = make_train_plans(
            rng, B, T, raw, crop, cfg.data.frame_removal_p,
            per_frame_mask=per_frame, clip_hi=clip_hi,
            random_drop_p=cfg.data.random_drop_p)
        batch = dict(batch)
        batch["offsets"] = offsets
        batch["flip"] = flip
        batch["frame_map"] = fmap
    return batch


def init_state(model, cfg, rng) -> Tuple[TrainState, object]:
    """Initialize model variables + optimizer (jitted init)."""
    B = 2
    S, T = cfg.data.crop_size, cfg.data.frames
    video = jnp.zeros((B, T, S, S), jnp.float32)
    labels = jnp.full((B, cfg.decoder.target_pad_len if cfg.decoder else 14),
                      IGNORE_ID, jnp.int32)
    rngs = {"params": rng, "dropout": rng, "teacher": rng}
    if cfg.name == "classify":
        variables = jax.jit(lambda: model.init(rngs, video, train=False))()
    elif cfg.decoder.bidirectional:
        variables = jax.jit(lambda: model.init(
            rngs, video, labels, labels, train=False))()
    else:
        variables = jax.jit(lambda: model.init(
            rngs, video, labels, train=False))()
    tx = make_optimizer(cfg.optim)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    return state, tx


def decode_to_phonemes(pred_row: Sequence[int], gold_row: Sequence[int],
                       vocab: Sequence[str] = TOTAL_PHONEMES
                       ) -> Tuple[List[str], List[str]]:
    """Apply the reference eval protocol to one sample (test.py:185-212):
    gold filtered of specials; prediction truncated to len(gold)+1 raw
    tokens then filtered."""
    specials = (SOS_ID, EOS_ID, IGNORE_ID)
    golds = [vocab[i] for i in gold_row if i not in specials]
    changdu = len(golds)
    preds = [vocab[i] for i in list(pred_row)[:changdu + 1]
             if i not in specials]
    return preds, golds


def score_batch(ys: np.ndarray, gold: np.ndarray, acc: Dict) -> None:
    for n in range(ys.shape[0]):
        preds, golds = decode_to_phonemes(ys[n], gold[n])
        acc["pred_txt"].append("".join(preds))
        acc["gold_txt"].append("".join(golds))
        acc["pred_ph"].append(preds)
        acc["gold_ph"].append(golds)


def finish_scores(acc: Dict) -> Tuple[float, float]:
    return (wer_compute(acc["pred_txt"], acc["gold_txt"]),
            per_compute(acc["pred_ph"], acc["gold_ph"]))


def _new_acc() -> Dict:
    return {"pred_txt": [], "gold_txt": [], "pred_ph": [], "gold_ph": []}


def _eval_video(batch: Dict, cfg) -> jnp.ndarray:
    """Center-crop eval ingest outside the jitted eval step (for decode
    paths that take pre-normalized video, e.g. beam search)."""
    from .steps import _ingest_eval
    return _ingest_eval(batch, cfg.data.crop_size,
                        jnp.dtype(cfg.compute_dtype))


class Trainer:
    """Config-driven trainer covering all four workloads."""

    def __init__(self, cfg, train_dataset, valid_datasets: Optional[Dict] = None,
                 checkpoint_dir: Optional[str] = None, mesh=None,
                 tensorboard_dir: Optional[str] = None,
                 halt_on_nan: bool = True, profile_dir: Optional[str] = None,
                 cache_on_device: bool = False):
        self.cfg = cfg
        self.logger = get_logger()
        self.writer = None
        # --profile-dir: capture a jax.profiler device trace over a few
        # steady-state steps of the first epoch (SURVEY.md §5 tracing)
        self.profile_dir = profile_dir
        from ..utils.profiler import StepTimer
        self.timer = StepTimer(batch_size=cfg.batch_size)
        if tensorboard_dir:
            from ..utils.tensorboard import SummaryWriter
            self.writer = SummaryWriter(tensorboard_dir)
        # failure detection: the reference has none (SURVEY.md §5); a NaN
        # loss here halts with a diagnostic instead of silently corrupting
        # the optimizer state
        self.halt_on_nan = halt_on_nan
        self.model = build_model(cfg)
        self.rng = jax.random.PRNGKey(cfg.seed)
        self.np_rng = np.random.default_rng(cfg.seed)
        self.mesh = mesh
        if mesh is None and (cfg.mesh.data > 1 or cfg.mesh.model > 1):
            from ..parallel import make_mesh
            self.mesh = make_mesh(cfg.mesh.data, cfg.mesh.model)
        self.state, self.tx = init_state(self.model, cfg, self.rng)
        if self.mesh is not None:
            from ..parallel import shard_params
            self.state = self.state.replace(
                params=shard_params(self.state.params, self.mesh),
                batch_stats=shard_params(self.state.batch_stats, self.mesh))
        # donate the input state so params + optimizer moments update
        # in-place (~560 MB of HBM at full dims that would otherwise be
        # double-buffered across the step).  Safe here: the epoch loop
        # rebinds self.state from the step's return and never touches the
        # old tree.  TPU-only -- the CPU backend ignores donation with a
        # warning, and probes/tests that re-call a step on the same state
        # construct their own non-donating steps.
        donate = jax.default_backend() == "tpu"

        self._donate = donate

        def _make_train_step(c, model):
            if c.name == "classify":
                return make_classify_train_step(model, self.tx, c,
                                                donate=donate)
            if c.decoder.bidirectional:
                return make_sbl_train_step(model, self.tx, c, donate=donate)
            return make_uni_train_step(model, self.tx, c, donate=donate)

        def _rebuild_with_remat():
            # HBM pre-flight fallback: re-make the step with the frontend
            # rematerialized (same param tree, ~35% less stored activation)
            import dataclasses
            c2 = dataclasses.replace(cfg, remat_frontend=True)
            return _make_train_step(c2, build_model(c2))

        from .memguard import GuardedTrainStep
        self.train_step = GuardedTrainStep(
            _make_train_step(cfg, self.model),
            rebuild=None if cfg.remat_frontend else _rebuild_with_remat,
            logger=self.logger)
        self._fused_step = None        # built lazily (first cached epoch)
        if cfg.name == "classify":
            self.eval_step = make_classify_eval_step(self.model, cfg)
        elif cfg.decoder.bidirectional:
            self.eval_step = make_sbl_eval_step(self.model, cfg)
        else:
            self.eval_step = make_uni_eval_step(self.model, cfg)
        self.train_dataset = train_dataset
        self.valid_datasets = valid_datasets or {}
        self.checkpoint_dir = checkpoint_dir
        self.best_metric = float("inf")
        self.epochs_since_improvement = 0
        # device-resident dataset: upload every clip ONCE and gather each
        # batch on-device by index.  The per-step host->device clip transfer
        # (B=240 x 276 KB = 66 MB) otherwise dominates wall time on remote
        # TPU links (measured ~45 s/epoch of pure transfer on the axon
        # tunnel); only sensible for datasets that fit HBM (uint8 clips:
        # ~3.6k clips/GB)
        self.cache_on_device = cache_on_device
        self._dev_clips = None
        self._host_small = None
        self._dev_small = None

    # ------------------------------------------------------------------ train
    def _make_sampler(self, epoch: int):
        """Fixed-ratio two-stream batches (reference TwoStreamBatchSampler,
        classify data_gen.py:340-367): ``cfg.secondary_batch_size`` samples
        per batch come from the secondary (LRW-1000) stream, the rest from
        the primary (LRW) stream.  Requires a dataset exposing
        ``stream_indices()``."""
        sec = getattr(self.cfg, "secondary_batch_size", 0)
        if not sec:
            return None
        streams = getattr(self.train_dataset, "stream_indices", None)
        if streams is None:
            raise ValueError(
                "secondary_batch_size set but the train dataset has no "
                "stream_indices() (use MixedBilingualDataset or a synthetic "
                "'all' dataset)")
        from ..data.sampler import TwoStreamBatchSampler
        primary, secondary = streams()
        return TwoStreamBatchSampler(primary, secondary, self.cfg.batch_size,
                                     sec, seed=self.cfg.seed + epoch)

    def _mesh_fused_ok(self) -> bool:
        """The mesh epoch-fused path needs the dataset and batch to tile
        evenly over the 'data' axis (each shard gathers batches from its
        resident block only -- DistributedSampler semantics)."""
        if self.mesh is None:
            return False
        dp = self.mesh.shape["data"]
        return (self.cfg.batch_size % dp == 0
                and len(self.train_dataset) % dp == 0)

    def _ensure_device_cache(self):
        if self._dev_clips is not None:
            return
        ds = self.train_dataset
        n = len(ds)
        samples = [ds[i] for i in range(n)]
        clips = np.stack([s["clip_u8"] for s in samples])
        if self._mesh_fused_ok():
            # shard the resident dataset over 'data' so the epoch-fused
            # step's batch gather is shard-local (N/dp rows per chip
            # instead of a replicated copy on every chip)
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._dev_clips = jax.device_put(
                clips, NamedSharding(self.mesh, P("data")))
        else:
            self._dev_clips = jnp.asarray(clips)      # one-time upload
        self._host_small = {
            k: np.stack([s[k] for s in samples])
            for k in samples[0] if k != "clip_u8"
        }
        self.logger.info(
            f"device cache: {n} clips ({clips.nbytes / 1e9:.2f} GB) resident")

    def _device_batches(self, epoch: int):
        """Batches whose clips are gathered on-device from the resident
        dataset; only indices, labels and augmentation plans cross the
        link (~100 KB/step instead of ~66 MB)."""
        self._ensure_device_cache()
        B = self.cfg.batch_size
        order = np.random.default_rng(self.cfg.seed + epoch).permutation(
            len(self.train_dataset))
        shape_stub = np.broadcast_to(np.uint8(0),
                                     (B,) + self._dev_clips.shape[1:])
        for s in range(0, (len(order) // B) * B, B):
            idx = order[s:s + B]
            batch = {k: v[idx] for k, v in self._host_small.items()}
            batch = attach_plans({**batch, "clip_u8": shape_stub},
                                 self.np_rng, self.cfg, train=True)
            batch["clip_u8"] = jnp.take(self._dev_clips,
                                        jnp.asarray(idx), axis=0)
            yield batch

    def _epoch_const(self, epoch: int, max_steps: Optional[int] = None):
        """Whole-epoch constants for the fused cached step: the shuffle
        order and every step's augmentation plans, uploaded in ONE
        device_put (a few MB) instead of two tunnel round trips per step
        (~150-170 ms/step @B=240, tools/trainer_rate_probe.py).  Draws
        from the same np_rng sequence as ``_device_batches`` and only for
        the steps that will actually run (``max_steps``-truncated epochs
        advance the shared host RNG exactly as far as the generator path
        would), so the two cached routes produce identical batch streams
        even across truncated smoke/resume epochs."""
        self._ensure_device_cache()
        if self._dev_small is None:
            self._dev_small = jax.device_put(self._host_small)
        B = self.cfg.batch_size
        order = np.random.default_rng(self.cfg.seed + epoch).permutation(
            len(self.train_dataset))
        n_steps = len(order) // B
        if max_steps is not None:
            n_steps = min(n_steps, max_steps)
        order = order[:n_steps * B].reshape(n_steps, B).astype(np.int32)
        shape_stub = np.broadcast_to(np.uint8(0),
                                     (B,) + self._dev_clips.shape[1:])
        plans = {"offsets": [], "flip": [], "frame_map": []}
        for s in range(n_steps):
            idx = order[s]
            batch = {k: v[idx] for k, v in self._host_small.items()}
            batch = attach_plans({**batch, "clip_u8": shape_stub},
                                 self.np_rng, self.cfg, train=True)
            for k in plans:
                plans[k].append(batch[k])
        const = jax.device_put({
            "base": np.int32(int(self.state.step)),
            "order": order,
            "per_step": {k: np.stack(v) for k, v in plans.items()},
        })
        const["clips"] = self._dev_clips
        const["per_sample"] = self._dev_small
        return const, n_steps

    def _epoch_const_mesh(self, epoch: int, max_steps: Optional[int] = None):
        """Mesh variant of ``_epoch_const``: per-shard stratified shuffle
        (shard d's batch columns draw only from its resident dataset rows
        [d*N/dp, (d+1)*N/dp) -- torch DistributedSampler semantics, ref
        SBL train.py:115) so the in-step gather is shard-local, plus
        explicit shardings on every const leaf (order/plans split on the
        batch axis, dataset on N).  Plans are drawn with the TRUE global
        index rows because ``attach_plans`` reads each sample's lang_id."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = self.mesh
        dp = mesh.shape["data"]
        self._ensure_device_cache()
        if self._dev_small is None:
            self._dev_small = jax.device_put(
                self._host_small, NamedSharding(mesh, P("data")))
        B = self.cfg.batch_size
        Bl, Nl = B // dp, len(self.train_dataset) // dp
        rng = np.random.default_rng(self.cfg.seed + epoch)
        perms = [rng.permutation(Nl) + d * Nl for d in range(dp)]
        n_steps = Nl // Bl
        if max_steps is not None:
            n_steps = min(n_steps, max_steps)
        order = np.empty((n_steps, B), np.int32)
        for d in range(dp):
            order[:, d * Bl:(d + 1) * Bl] = (
                perms[d][:n_steps * Bl].reshape(n_steps, Bl))
        shape_stub = np.broadcast_to(np.uint8(0),
                                     (B,) + self._dev_clips.shape[1:])
        plans = {"offsets": [], "flip": [], "frame_map": []}
        for s in range(n_steps):
            idx = order[s]
            batch = {k: v[idx] for k, v in self._host_small.items()}
            batch = attach_plans({**batch, "clip_u8": shape_stub},
                                 self.np_rng, self.cfg, train=True)
            for k in plans:
                plans[k].append(batch[k])
        rep = NamedSharding(mesh, P())
        col = NamedSharding(mesh, P(None, "data"))
        const = {
            "base": jax.device_put(np.int32(int(self.state.step)), rep),
            "order": jax.device_put(order, col),
            "per_step": {k: jax.device_put(np.stack(v), col)
                         for k, v in plans.items()},
        }
        const["clips"] = self._dev_clips
        const["per_sample"] = self._dev_small
        return const, n_steps

    def _ensure_fused_step(self):
        if self._fused_step is not None:
            return self._fused_step

        def _make_body(c, model):
            if c.name == "classify":
                return make_classify_train_body(model, self.tx, c)
            if c.decoder.bidirectional:
                return make_sbl_train_body(model, self.tx, c)
            return make_uni_train_body(model, self.tx, c)

        def _fuse(body):
            if self.mesh is not None:
                return make_epoch_fused_step_mesh(body, self.mesh,
                                                  donate=self._donate)
            return make_epoch_fused_step(body, donate=self._donate)

        def _rebuild_with_remat():
            import dataclasses
            c2 = dataclasses.replace(self.cfg, remat_frontend=True)
            return _fuse(_make_body(c2, build_model(c2)))

        from .memguard import GuardedTrainStep
        self._fused_step = GuardedTrainStep(
            _fuse(_make_body(self.cfg, self.model)),
            rebuild=(None if self.cfg.remat_frontend
                     else _rebuild_with_remat),
            logger=self.logger)
        return self._fused_step

    def train_epoch(self, epoch: int = 0, max_steps: Optional[int] = None
                    ) -> float:
        losses = AverageMeter()
        if self.cache_on_device:
            if getattr(self.cfg, "secondary_batch_size", 0):
                raise ValueError(
                    "cache_on_device uses plain shuffling and would "
                    "silently drop the fixed-ratio TwoStreamBatchSampler "
                    "protocol; unset secondary_batch_size or the device "
                    "cache")
            if (not os.environ.get("SBL_NO_EPOCH_FUSED")
                    and (self.mesh is None or self._mesh_fused_ok())):
                return self._train_epoch_fused(epoch, max_steps)
            batcher = None
            it = self._device_batches(epoch)
        else:
            batcher = Batcher(self.train_dataset, self.cfg.batch_size,
                              shuffle=True, seed=self.cfg.seed + epoch,
                              sampler=self._make_sampler(epoch))
            it = (attach_plans(b, self.np_rng, self.cfg, train=True)
                  for b in batcher)
        if max_steps is not None:
            # bound the SOURCE, not just the consuming loop: the producer
            # thread + device prefetch below pull ahead of the loop, and
            # every pull draws augmentation plans from the shared np_rng --
            # an unbounded source would advance the RNG stream past what a
            # truncated epoch consumed (diverging from the fused path's
            # exactly-n_steps draws in _epoch_const)
            import itertools
            it = itertools.islice(it, max_steps)
        if not os.environ.get("SBL_NO_BG_BATCH"):
            # assemble batches on a producer thread: plan RNG draws, host
            # gathers and the device-cache jnp.take dispatch cost
            # ~150-170 ms/step inline @B=240 through the TPU tunnel
            # (tools/trainer_rate_probe.py) -- overlapped they cost ~0
            it = background_iter(it)
        sharding = None
        if self.mesh is not None:
            from ..parallel import batch_sharding
            sharding = batch_sharding(self.mesh)
        tracing = False
        n_batches_hint = (len(self.train_dataset) // self.cfg.batch_size)

        def consume(prev):
            # fetch the PREVIOUS step's metrics: its loss is already
            # computed while the current step executes, so the tunnel's
            # fetch round trip (~45-60 ms) overlaps device compute instead
            # of serializing every step (the reference logs per batch by
            # blocking on .item(); here logging lags one step instead)
            i, step_no, metrics = prev
            loss = float(metrics["loss"])
            if self.halt_on_nan and not np.isfinite(loss):
                raise FloatingPointError(
                    f"non-finite loss {loss} at step {step_no} "
                    f"(epoch {epoch}, batch {i}); metrics="
                    f"{ {k: float(v) for k, v in metrics.items()} }")
            losses.update(loss)
            if self.writer is not None:
                self.writer.add_scalar("train/loss", loss, step_no)
            if i % 50 == 0:
                n_batches = (len(batcher) if batcher is not None
                             else n_batches_hint)
                self.logger.info(
                    f"Epoch: [{epoch}][{i}/{n_batches}]\t"
                    f"Loss {losses.val:.5f} ({losses.avg:.5f})\t"
                    f"{self.timer.clips_per_sec:.1f} clips/s")

        pending = None
        # host-side step counter: int(self.state.step) inside the loop
        # would block on the just-dispatched step and re-serialize it
        base_step = int(self.state.step)
        try:
            for i, batch in enumerate(prefetch_to_device(it, sharding=sharding)):
                if max_steps is not None and i >= max_steps:
                    break
                if self.profile_dir is not None and epoch == 0 and i == 1:
                    # skip step 0 (compile); trace a few steady-state steps
                    jax.profiler.start_trace(self.profile_dir)
                    tracing = True
                with self.timer.step():
                    self.state, metrics = self.train_step(self.state, batch,
                                                          self.rng)
                    if pending is not None:
                        consume(pending)
                    pending = (i, base_step + i + 1, metrics)
                if tracing and i >= 3:
                    jax.profiler.stop_trace()
                    tracing = False
                    self.logger.info(f"profiler trace written to "
                                     f"{self.profile_dir}")
            if pending is not None:
                consume(pending)
                pending = None
        finally:
            if tracing:
                jax.profiler.stop_trace()
        return losses.avg

    def _train_epoch_fused(self, epoch: int, max_steps: Optional[int] = None
                           ) -> float:
        """Cached-dataset epoch via the epoch-fused step: one upload of
        the epoch's order+plans, then exactly one dispatch per step (the
        batch gather runs inside the jitted step, indexed by the donated
        ``state.step``).  Loss fetch lags one step, as in train_epoch.
        Measured @B=240: 628 -> ~475 ms/step wall on a ~427 ms device
        step (tools/trainer_rate_probe.py)."""
        losses = AverageMeter()
        step_fn = self._ensure_fused_step()
        const, n_steps = (self._epoch_const_mesh(epoch, max_steps)
                          if self.mesh is not None
                          else self._epoch_const(epoch, max_steps))
        tracing = False
        base_step = int(self.state.step)

        def consume(prev):
            i, step_no, metrics = prev
            loss = float(metrics["loss"])
            if self.halt_on_nan and not np.isfinite(loss):
                raise FloatingPointError(
                    f"non-finite loss {loss} at step {step_no} "
                    f"(epoch {epoch}, batch {i}); metrics="
                    f"{ {k: float(v) for k, v in metrics.items()} }")
            losses.update(loss)
            if self.writer is not None:
                self.writer.add_scalar("train/loss", loss, step_no)
            if i % 50 == 0:
                self.logger.info(
                    f"Epoch: [{epoch}][{i}/{n_steps}]\t"
                    f"Loss {losses.val:.5f} ({losses.avg:.5f})\t"
                    f"{self.timer.clips_per_sec:.1f} clips/s")

        pending = None
        try:
            for i in range(n_steps):
                if self.profile_dir is not None and epoch == 0 and i == 1:
                    jax.profiler.start_trace(self.profile_dir)
                    tracing = True
                with self.timer.step():
                    self.state, metrics = step_fn(self.state, const,
                                                  self.rng)
                    if pending is not None:
                        consume(pending)
                    pending = (i, base_step + i + 1, metrics)
                if tracing and i >= 3:
                    jax.profiler.stop_trace()
                    tracing = False
                    self.logger.info(f"profiler trace written to "
                                     f"{self.profile_dir}")
            if pending is not None:
                consume(pending)
                pending = None
        finally:
            if tracing:
                jax.profiler.stop_trace()
        return losses.avg

    # ------------------------------------------------------------------- eval
    def validate_seq2seq(self, dataset, max_batches: Optional[int] = None,
                         beam_size: Optional[int] = None,
                         bigram_logp=None) -> Dict[str, float]:
        """Greedy decode + WER/PER.  For SBL returns both directions.
        With ``beam_size``, uses batched beam search: paired bidirectional
        frontiers for SBL (decode/beam.py::sbl_beam_search), or the
        unidirectional beam optionally biased by a (V, V) bigram log table
        -- the LRW-1000 eval path (reference decoder.py:131-245)."""
        bidi = self.cfg.decoder.bidirectional
        beam_fn = None
        if beam_size is not None and bidi:
            from ..decode.beam import make_sbl_beam_decoder
            beam_fn = make_sbl_beam_decoder(self.model, beam_size)
        elif beam_size is not None:
            from ..decode.beam import make_uni_beam_decoder
            beam_fn = make_uni_beam_decoder(self.model, beam_size,
                                            bigram_logp=bigram_logp)
        acc_l2r, acc_r2l = _new_acc(), _new_acc()
        # evaluate every sample: keep the ragged tail batch (one extra
        # compile for the tail shape)
        batcher = Batcher(dataset, self.cfg.batch_size, shuffle=False,
                          drop_last=False)
        for i, batch in enumerate(prefetch_to_device(iter(batcher))):
            if max_batches is not None and i >= max_batches:
                break
            if bidi and beam_fn is not None:
                video = _eval_video(batch, self.cfg)
                tok_l, tok_r, _ = beam_fn(
                    {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}, video)
                score_batch(np.asarray(tok_l[:, 0]),
                            np.asarray(batch["labels"]), acc_l2r)
                score_batch(np.asarray(tok_r[:, 0]),
                            np.asarray(batch["labels_reverse"]), acc_r2l)
            elif bidi:
                ys_l2r, ys_r2l = self.eval_step(self.state, batch)
                score_batch(np.asarray(ys_l2r), np.asarray(batch["labels"]),
                            acc_l2r)
                score_batch(np.asarray(ys_r2l),
                            np.asarray(batch["labels_reverse"]), acc_r2l)
            elif beam_fn is not None:
                video = _eval_video(batch, self.cfg)
                tokens, _ = beam_fn(
                    {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}, video)
                score_batch(np.asarray(tokens[:, 0]),
                            np.asarray(batch["labels"]), acc_l2r)
            else:
                ys = self.eval_step(self.state, batch)
                score_batch(np.asarray(ys), np.asarray(batch["labels"]),
                            acc_l2r)
        out = {}
        out["l2r_wer"], out["l2r_per"] = finish_scores(acc_l2r)
        if bidi:
            out["r2l_wer"], out["r2l_per"] = finish_scores(acc_r2l)
        return out

    def validate_classify(self, dataset, max_batches: Optional[int] = None
                          ) -> Dict[str, float]:
        n = w_ok = l_ok = 0
        batcher = Batcher(dataset, self.cfg.batch_size, shuffle=False,
                          drop_last=False)
        for i, batch in enumerate(prefetch_to_device(iter(batcher))):
            if max_batches is not None and i >= max_batches:
                break
            word_logits, lang_logits = self.eval_step(self.state, batch)
            w_ok += int((np.argmax(np.asarray(word_logits), -1)
                         == batch["word_id"]).sum())
            l_ok += int((np.argmax(np.asarray(lang_logits), -1)
                         == batch["lang_id"]).sum())
            n += word_logits.shape[0]
        return {"word_acc": w_ok / max(n, 1), "lang_acc": l_ok / max(n, 1)}

    # -------------------------------------------------------------------- fit
    def fit(self, epochs: int, max_steps_per_epoch: Optional[int] = None,
            max_eval_batches: Optional[int] = None) -> Dict[str, float]:
        last = {}
        for epoch in range(epochs):
            t0 = time.time()
            loss = self.train_epoch(epoch, max_steps=max_steps_per_epoch)
            self.logger.info(f"epoch {epoch} train_loss {loss:.4f} "
                             f"({time.time() - t0:.1f}s)")
            metric = loss
            if self.cfg.name == "classify":
                for name, ds in self.valid_datasets.items():
                    last[name] = self.validate_classify(ds, max_eval_batches)
                    self.logger.info(f"{name}: {last[name]}")
                if last:
                    metric = -sum(v["word_acc"] for v in last.values())
            else:
                wer_sum = 0.0
                for name, ds in self.valid_datasets.items():
                    last[name] = self.validate_seq2seq(ds, max_eval_batches)
                    self.logger.info(f"{name}: {last[name]}")
                    if self.writer is not None:
                        for k, v in last[name].items():
                            self.writer.add_scalar(f"{name}/{k}", v,
                                                   int(self.state.step))
                    wer_sum += last[name]["l2r_wer"]
                if last:
                    # best = l2r_wer_lrw + l2r_wer_lrw1000 (train.py:165-167)
                    metric = wer_sum
            is_best = metric < self.best_metric
            self.best_metric = min(metric, self.best_metric)
            self.epochs_since_improvement = (
                0 if is_best else self.epochs_since_improvement + 1)
            if self.checkpoint_dir:
                ckpt.save_checkpoint(self.checkpoint_dir, self.state,
                                     epoch=epoch, best_metric=self.best_metric,
                                     is_best=is_best)
        last["train_loss"] = loss
        return last
