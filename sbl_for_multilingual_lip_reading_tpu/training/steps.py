"""Jit-compiled train / eval steps for every workload.

Each step is ONE fused XLA graph: uint8 ingest (normalize/crop/flip/gather)
-> frontend -> encoder -> decoder -> loss -> grads -> optimizer update.  The
reference splits this across DataLoader workers, python-side augmentation,
a python 16-step decode loop, and DataParallel scatter/gather
(SBL train.py:177-210); here XLA schedules the whole step.

Gradient semantics: loss = 0.5 * (l2r + r2l) with label smoothing 0.1
(reference train.py:190-193).
Parameter freezing: the reference's three-stage recipe toggles
``requires_grad`` by hand-editing the code (reference README.md:46-48,
transformer.py:15-16 commented block).  Here ``cfg.freeze_prefixes``
zeroes gradients for matching top-level param subtrees (e.g.
``("frontend", "encoder")`` to train only the decoder).
"""
from __future__ import annotations

import functools
import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..data.pipeline import device_ingest
from .loss import cal_performance, classify_loss
from .state import TrainState


def _freeze_grads(grads, freeze_prefixes):
    if not freeze_prefixes:
        return grads
    return {
        k: (jax.tree_util.tree_map(jnp.zeros_like, v)
            if k in freeze_prefixes else v)
        for k, v in grads.items()
    }


def _ingest_train(batch, crop: int, dtype):
    clips = batch["clip_u8"]
    if os.environ.get("PALLAS_INGEST"):
        # Kept as an opt-in experiment only: the per-clip Pallas plan
        # kernel measured SLOWER than device_ingest's select-based crop
        # (full train step 469 vs 456 ms @B=240; its per-frame Python
        # loop issues 7200 tiny MXU dots).  See ops/ingest.py.
        from ..ops.attention import available
        from ..ops.ingest import MAX_OFFSET, ingest_train
        if (available()
                and clips.shape[2] - crop <= MAX_OFFSET
                and clips.shape[3] - crop <= MAX_OFFSET):
            return ingest_train(clips, batch["offsets"], batch["flip"],
                                batch["frame_map"], crop, dtype,
                                n_frames=batch.get("n_frames"))
    return device_ingest(clips, batch["offsets"], batch["flip"],
                         batch["frame_map"], crop, dtype,
                         n_frames=batch.get("n_frames"))


def _ingest_eval(batch, crop: int, dtype):
    # eval protocol: static center crop, no flip, identity frame map
    # (reference test.py CenterCrop) -- compiles to a slice, not a gather
    return device_ingest(batch["clip_u8"], None, None, None, crop, dtype,
                         n_frames=batch.get("n_frames"))


def make_sbl_train_body(model, tx, cfg) -> Callable:
    """Un-jitted SBL train-step body ``(state, batch, rng) -> (state,
    metrics)`` -- shared by the plain jitted step and the epoch-fused
    cached step (``make_epoch_fused_step``)."""
    freeze = tuple(getattr(cfg, "freeze_prefixes", ()) or ())
    crop = cfg.data.crop_size
    dtype = jnp.dtype(cfg.compute_dtype)
    smoothing = cfg.optim.label_smoothing

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, dict]:
        rng = jax.random.fold_in(rng, state.step)
        drop_rng, teach_rng = jax.random.split(rng)
        video = _ingest_train(batch, crop, dtype)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                video, batch["labels"], batch["labels_reverse"], train=True,
                rngs={"dropout": drop_rng, "teacher": teach_rng},
                mutable=["batch_stats"])
            p_l2r, g_l2r, p_r2l, g_r2l = out
            loss_l2r, nc_l2r = cal_performance(p_l2r, g_l2r, smoothing)
            loss_r2l, nc_r2l = cal_performance(p_r2l, g_r2l, smoothing)
            loss = 0.5 * (loss_l2r + loss_r2l)
            metrics = {"loss": loss, "loss_l2r": loss_l2r,
                       "loss_r2l": loss_r2l,
                       "n_correct_l2r": nc_l2r, "n_correct_r2l": nc_r2l}
            return loss, (mut["batch_stats"], metrics)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        grads = _freeze_grads(grads, freeze)
        state = state.apply_gradients(grads, tx, new_batch_stats=new_bs)
        return state, metrics

    return train_step


def make_sbl_train_step(model, tx, cfg, donate: bool = False) -> Callable:
    return jax.jit(make_sbl_train_body(model, tx, cfg),
                   donate_argnums=(0,) if donate else ())


def make_epoch_fused_step(body: Callable, donate: bool = True) -> Callable:
    """Fuse the per-step batch assembly INTO the jitted train step.

    Through the axon TPU tunnel, each host->device transfer / dispatch is
    a ~30-85 ms round trip, and the cached-data epoch loop paid two of
    them per step (the index upload + the clip-gather dispatch) on top of
    the train-step dispatch: tools/trainer_rate_probe.py measured 625 ms
    wall vs 457-476 ms for a dispatch-only chain on a ~427 ms device step
    @B=240, and a producer thread hid none of it (the RPCs serialize on
    the client).  Here the WHOLE epoch's shuffle order and augmentation
    plans are uploaded once (`Trainer._epoch_const`) and the step indexes
    them with the donated ``state.step`` counter, so steady-state epochs
    cost exactly one dispatch RPC per step and the per-step batch
    construction (clip gather, label gather, plan slice) runs on-device
    inside the same XLA program as the step itself.

    ``const`` layout:
      base        int32[]            state.step at epoch start
      order       int32[n_steps, B]  epoch shuffle, one row per step
      clips       uint8[N, T, H, W]  the resident dataset
      per_sample  {key: [N, ...]}    label-like arrays, gathered by order
      per_step    {key: [n_steps, ...]}  plan arrays, sliced by step
    """

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def fused_step(state: TrainState, const, rng):
        i = (state.step - const["base"]).astype(jnp.int32)
        idx = jax.lax.dynamic_index_in_dim(const["order"], i, 0,
                                           keepdims=False)
        batch = {k: jnp.take(v, idx, axis=0)
                 for k, v in const["per_sample"].items()}
        batch["clip_u8"] = jnp.take(const["clips"], idx, axis=0)
        for k, v in const["per_step"].items():
            batch[k] = jax.lax.dynamic_index_in_dim(v, i, 0, keepdims=False)
        return body(state, batch, rng)

    return fused_step


def make_epoch_fused_step_mesh(body: Callable, mesh, donate: bool = True
                               ) -> Callable:
    """Mesh (dp-sharded) variant of ``make_epoch_fused_step``.

    The single-chip fused step gathers batches from a device-resident
    dataset indexed by the donated ``state.step``; under GSPMD a
    ``jnp.take`` with arbitrary global indices on a 'data'-sharded operand
    cannot be proven shard-local and would lower to whole-array
    collectives.  So the batch assembly runs under ``jax.shard_map`` over
    the 'data' axis with an explicitly LOCAL layout (built by
    ``Trainer._epoch_const_mesh``):

      order      int32[n_steps, B]   GLOBAL dataset indices; column block
                                     d*(B/dp):(d+1)*(B/dp) must fall in
                                     shard d's resident rows
      clips      uint8[N, ...]       dataset sharded P('data') on N
      per_sample {k: [N, ...]}       likewise shard-sharded
      per_step   {k: [n_steps, B, ...]}  plans, sharded on the B axis

    Each shard gathers exactly its own batch rows from its own dataset
    block (the global index is rebased by ``axis_index('data') * N_local``
    inside the shard body) -- zero communication in assembly -- and the
    assembled batch leaves exit sharded P('data'), exactly what the GSPMD
    step body expects.  The per-shard stratified shuffle this implies
    matches the reference's multi-GPU semantics (torch DistributedSampler
    hands each rank a fixed subset; SBL train.py:115 DataParallel scatters
    a host batch), it is NOT a new restriction.
    """
    from jax.sharding import PartitionSpec as P

    def _assemble(i, order, clips, per_sample, per_step):
        idx = jax.lax.dynamic_index_in_dim(order, i, 0, keepdims=False)
        # rebase global -> shard-local: shard d holds rows
        # [d*N_local, (d+1)*N_local) of every per-sample array
        idx = idx - jax.lax.axis_index("data") * clips.shape[0]
        batch = {k: jnp.take(v, idx, axis=0)
                 for k, v in per_sample.items()}
        batch["clip_u8"] = jnp.take(clips, idx, axis=0)
        for k, v in per_step.items():
            batch[k] = jax.lax.dynamic_index_in_dim(v, i, 0, keepdims=False)
        return batch

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def fused_step(state: TrainState, const, rng):
        i = (state.step - const["base"]).astype(jnp.int32)
        assemble = jax.shard_map(
            _assemble, mesh=mesh,
            in_specs=(P(), P(None, "data"), P("data"), P("data"),
                      P(None, "data")),
            out_specs=P("data"), check_vma=False)
        batch = assemble(i, const["order"], const["clips"],
                         const["per_sample"], const["per_step"])
        return body(state, batch, rng)

    return fused_step


def make_sbl_eval_step(model, cfg) -> Callable:
    crop = cfg.data.crop_size
    dtype = jnp.dtype(cfg.compute_dtype)

    @jax.jit
    def eval_step(state: TrainState, batch):
        video = _ingest_eval(batch, crop, dtype)
        ys_l2r, ys_r2l = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            video, method=model.recognize)
        return ys_l2r, ys_r2l

    return eval_step


def make_uni_train_body(model, tx, cfg) -> Callable:
    freeze = tuple(getattr(cfg, "freeze_prefixes", ()) or ())
    crop = cfg.data.crop_size
    dtype = jnp.dtype(cfg.compute_dtype)
    smoothing = cfg.optim.label_smoothing

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        video = _ingest_train(batch, crop, dtype)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                video, batch["labels"], train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            pred, gold = out
            loss, n_correct = cal_performance(pred, gold, smoothing)
            return loss, (mut["batch_stats"],
                          {"loss": loss, "n_correct": n_correct})

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        grads = _freeze_grads(grads, freeze)
        state = state.apply_gradients(grads, tx, new_batch_stats=new_bs)
        return state, metrics

    return train_step


def make_uni_train_step(model, tx, cfg, donate: bool = False) -> Callable:
    return jax.jit(make_uni_train_body(model, tx, cfg),
                   donate_argnums=(0,) if donate else ())


def make_uni_eval_step(model, cfg) -> Callable:
    crop = cfg.data.crop_size
    dtype = jnp.dtype(cfg.compute_dtype)

    @jax.jit
    def eval_step(state: TrainState, batch):
        video = _ingest_eval(batch, crop, dtype)
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            video, method=model.recognize)

    return eval_step


def make_classify_train_body(model, tx, cfg) -> Callable:
    freeze = tuple(getattr(cfg, "freeze_prefixes", ()) or ())
    crop = cfg.data.crop_size
    dtype = jnp.dtype(cfg.compute_dtype)
    lw = cfg.language_loss_weight

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        video = _ingest_train(batch, crop, dtype)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                video, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            word_logits, lang_logits = out
            loss, w_ok, l_ok = classify_loss(
                word_logits, batch["word_id"], lang_logits, batch["lang_id"],
                language_weight=lw)
            return loss, (mut["batch_stats"],
                          {"loss": loss, "word_correct": w_ok,
                           "lang_correct": l_ok})

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        grads = _freeze_grads(grads, freeze)
        state = state.apply_gradients(grads, tx, new_batch_stats=new_bs)
        return state, metrics

    return train_step


def make_classify_train_step(model, tx, cfg, donate: bool = False) -> Callable:
    return jax.jit(make_classify_train_body(model, tx, cfg),
                   donate_argnums=(0,) if donate else ())


def make_classify_eval_step(model, cfg) -> Callable:
    crop = cfg.data.crop_size
    dtype = jnp.dtype(cfg.compute_dtype)

    @jax.jit
    def eval_step(state: TrainState, batch):
        video = _ingest_eval(batch, crop, dtype)
        word_logits, lang_logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            video, train=False)
        return word_logits, lang_logits

    return eval_step
