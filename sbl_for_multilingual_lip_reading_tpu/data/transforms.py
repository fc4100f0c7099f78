"""Video clip transforms.

Host-side (numpy, vectorized) parity implementations of the reference's
cvtransforms + data_gen augmentations
(SBL_Multilingual_Lip_reading/cvtransforms.py:1-48, data_gen.py:99-120), and
the plan-based formulation used by the device ingest path (data/pipeline.py):
all randomness is drawn on the host into tiny integer arrays (crop offsets,
flip flags, frame index maps) while the heavy pixel math (u8->f32, normalize,
crop, flip, gather) runs on-device inside one jitted XLA graph -- the clip
travels over PCIe as uint8 (4x less host->device traffic than the reference's
f32 tensors).

Reference semantics preserved:
* ``ColorNormalize``: (x - 0.413621) / 0.1700239  (cvtransforms.py:44-48)
* ``RandomCrop``: *per-frame* random offsets in [0, 8] (the reference draws
  x1/y1 inside the frame loop, cvtransforms.py:28-29)
* ``CenterCrop``: fixed offset (w-tw)//2 = 4 for 96->88
* LRW-1000 jpg path crops with a *per-clip* offset in [0, 4]
  (border = (96-88)//2, data_gen.py:63-66)
* ``HorizontalFlip`` (data_gen.py:99-102): whole-clip spatial reverse, p=0.5
* ``FrameRemoval`` (data_gen.py:104-108): frame i := frame i-1 w.p. 0.05
* ``FrameZero`` (data_gen.py:110-120): zero a frame w.p. 0.1 (defined but
  never called by the reference; available here behind a flag)
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

MEAN = 0.413621
STD = 0.1700239


def color_normalize(x: np.ndarray) -> np.ndarray:
    return (x - MEAN) / STD


def center_crop(clip: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """(T, H, W) -> (T, th, tw) center crop."""
    th, tw = size
    h, w = clip.shape[1], clip.shape[2]
    y1 = int(round((h - th) / 2.0))
    x1 = int(round((w - tw) / 2.0))
    return clip[:, y1:y1 + th, x1:x1 + tw]


def random_crop_per_frame(clip: np.ndarray, size: Tuple[int, int],
                          rng: np.random.Generator) -> np.ndarray:
    """(T, H, W) -> (T, th, tw) with an independent offset per frame
    (reference RandomCrop, cvtransforms.py:22-33)."""
    th, tw = size
    T, h, w = clip.shape
    ys = rng.integers(0, h - th + 1, size=T)
    xs = rng.integers(0, w - tw + 1, size=T)
    out = np.empty((T, th, tw), dtype=clip.dtype)
    for i in range(T):
        out[i] = clip[i, ys[i]:ys[i] + th, xs[i]:xs[i] + tw]
    return out


def random_crop_clip(clip: np.ndarray, size: Tuple[int, int],
                     rng: np.random.Generator,
                     max_offset: Optional[int] = None) -> np.ndarray:
    """Single random offset for the whole clip (LRW-1000 jpg path,
    data_gen.py:63-66; offset range [0, (H-th)//2] there)."""
    th, tw = size
    h, w = clip.shape[1], clip.shape[2]
    if max_offset is None:
        max_offset = (h - th) // 2
    y1 = int(rng.integers(0, max_offset + 1))
    x1 = int(rng.integers(0, max_offset + 1))
    return clip[:, y1:y1 + th, x1:x1 + tw]


def horizontal_flip(clip: np.ndarray, rng: np.random.Generator,
                    p: float = 0.5) -> np.ndarray:
    """Whole-clip spatial reverse w.p. p (reference data_gen.py:99-102)."""
    if rng.random() < p:
        return clip[:, :, ::-1]
    return clip


def frame_removal(clip: np.ndarray, rng: np.random.Generator,
                  p: float = 0.05) -> np.ndarray:
    """Duplicate the previous frame w.p. p per frame (data_gen.py:104-108)."""
    clip = clip.copy()
    for i in range(1, clip.shape[0]):
        if rng.random() < p:
            clip[i] = clip[i - 1]
    return clip


def random_drop_map(rng: np.random.Generator, frames: int, p: float = 0.01,
                    max_drop: Optional[float] = None) -> np.ndarray:
    """(T,) int32 gather map for the LRW project's RandomDrop
    (VSR_seq2seq_Transformer_with_phonemes_LRW/cvtransforms.py:32-41):
    scan frames in order; frame j is dropped w.p. ``p`` unless the total
    dropped so far already exceeds ``min(10, 0.2*T)``; kept frames pack to
    the front and the tail repeats the last kept frame.  RandomDrop is a
    pure gather, so the device ingest executes it through ``frame_map``."""
    if max_drop is None:
        max_drop = min(10.0, 0.2 * frames)
    out = np.arange(frames, dtype=np.int32)
    i = 0
    for j in range(frames):
        # reference keep condition: 0.01 < random.random() or cap < (j - i)
        if p < rng.random() or max_drop < float(j - i):
            out[i] = j
            i += 1
    if i > 0:
        out[i:] = out[i - 1]
    return out


def random_drop(clip: np.ndarray, rng: np.random.Generator,
                p: float = 0.01,
                max_drop: Optional[float] = None) -> np.ndarray:
    """Host-side RandomDrop: delete frames (capped) and repeat-fill from the
    last kept frame to keep length (cvtransforms.py:32-41)."""
    return clip[random_drop_map(rng, clip.shape[0], p, max_drop)]


def frame_zero(clip: np.ndarray, rng: np.random.Generator,
               p: float = 0.1) -> np.ndarray:
    """Zero frames w.p. p (data_gen.py:110-120; unused by the reference)."""
    clip = clip.copy()
    mask = rng.random(clip.shape[0]) < p
    clip[mask] = 0
    return clip


# ---------------------------------------------------------------------------
# Plan-based augmentation: host draws randomness, device executes pixels.
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class AugPlan:
    """Per-clip integer augmentation plan consumed by the device ingest op.

    offsets:   (T, 2) int32 per-frame (y, x) crop offsets
    flip:      bool -- whole-clip horizontal flip
    frame_map: (T,) int32 source-frame index per output frame (implements
               FrameRemoval as a gather; identity when no removal)
    """
    offsets: np.ndarray
    flip: bool
    frame_map: np.ndarray


def make_train_plan(rng: np.random.Generator, frames: int, raw: int,
                    crop: int, frame_removal_p: float = 0.05,
                    per_frame_offsets: bool = True,
                    max_offset: Optional[int] = None,
                    random_drop_p: float = 0.0) -> AugPlan:
    hi = (raw - crop) if max_offset is None else max_offset
    if per_frame_offsets:
        offs = rng.integers(0, hi + 1, size=(frames, 2)).astype(np.int32)
    else:
        offs = np.broadcast_to(
            rng.integers(0, hi + 1, size=(1, 2)), (frames, 2)
        ).astype(np.int32)
    flip = bool(rng.random() < 0.5)
    fmap = np.arange(frames, dtype=np.int32)
    drop = rng.random(frames) < frame_removal_p
    for i in range(1, frames):
        if drop[i]:
            fmap[i] = fmap[i - 1]
    # reference applies FrameRemoval AFTER cropping (data_gen.py:282-287), so
    # a duplicated frame carries its source frame's crop offset too
    offs = offs[fmap]
    if random_drop_p > 0.0:
        # the LRW project's RandomDrop runs after crop+flip
        # (VSR_..._LRW/data_gen.py:137-140), so compose the drop gather on
        # the already-cropped frame order: both the source-frame map and
        # the per-output crop offsets gather through it
        dmap = random_drop_map(rng, frames, random_drop_p)
        fmap = fmap[dmap]
        offs = offs[dmap]
    return AugPlan(offsets=offs, flip=flip, frame_map=fmap)


def make_train_plans(rng: np.random.Generator, batch: int, frames: int,
                     raw: int, crop: int, frame_removal_p: float = 0.05,
                     per_frame_mask: Optional[np.ndarray] = None,
                     clip_hi: Optional[np.ndarray] = None,
                     random_drop_p: float = 0.0
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched ``make_train_plan``: one vectorized draw for the whole batch.

    The per-sample builder costs ~0.5 ms of host python per clip -- ~130 ms
    per B=240 step on a 1-core host, which measured as the gap between the
    427 ms device step and the ~650 ms wall trainer loop
    (tools/trainer_rate_probe.py).  Same augmentation semantics, different
    RNG consumption order (each protocol is ours to define; the reference
    uses python ``random`` per frame).

    per_frame_mask: (B,) bool -- rows drawing per-frame crop offsets in
      [0, raw-crop] (the LRW RandomCrop protocol); other rows draw one
      per-clip offset (LRW-1000 load_images).  Default all-true.
    clip_hi: (B,) int -- per-clip max offset for the non-per-frame rows
      (reference border: (raw-crop)//2).  Default raw-crop.

    Returns (offsets (B,T,2) i32, flip (B,) bool, frame_map (B,T) i32).
    """
    B, T = batch, frames
    hi = raw - crop
    if per_frame_mask is None:
        per_frame_mask = np.ones(B, dtype=bool)
    if clip_hi is None:
        clip_hi = np.full(B, hi, dtype=np.int64)
    offs = rng.integers(0, hi + 1, size=(B, T, 2)).astype(np.int32)
    offs_clip = rng.integers(
        0, np.asarray(clip_hi).reshape(B, 1, 1) + 1,
        size=(B, 1, 2)).astype(np.int32)
    offs = np.where(per_frame_mask[:, None, None], offs,
                    np.broadcast_to(offs_clip, (B, T, 2)))
    flip = rng.random(B) < 0.5
    # FrameRemoval (data_gen.py:104-108): frame i w.p. p becomes a copy of
    # the previous KEPT frame -> frame_map = running max of kept indices
    drop = rng.random((B, T)) < frame_removal_p
    drop[:, 0] = False                      # reference loop starts at 1
    idx = np.broadcast_to(np.arange(T, dtype=np.int32), (B, T))
    fmap = np.maximum.accumulate(np.where(drop, np.int32(-1), idx), axis=1)
    fmap = fmap.astype(np.int32)
    # removal happens after crop: duplicated frames reuse the source's crop
    offs = np.take_along_axis(offs, fmap[..., None], axis=1)
    if random_drop_p > 0.0:
        # RandomDrop (LRW cvtransforms.py:32-41): frame j drops iff its
        # coin lands AND the number of drops before j is within the cap.
        # While under the cap every candidate IS a drop, so "drops before
        # j" == "candidates before j" exactly on the frames that matter:
        # candidate j is real iff (#candidates before j) <= cap.
        cap = min(10.0, 0.2 * T)
        cand = rng.random((B, T)) <= random_drop_p
        before = np.cumsum(cand, axis=1) - cand
        dropd = cand & (before <= cap)
        keep = ~dropd
        order = np.argsort(dropd, axis=1, kind="stable")  # kept first
        packed = np.take_along_axis(idx, order, axis=1)
        k = keep.sum(axis=1)                # >=1: cap < T for all real T
        pos = np.minimum(idx, np.maximum(k - 1, 0)[:, None])
        dmap = np.take_along_axis(packed, pos, axis=1).astype(np.int32)
        fmap = np.take_along_axis(fmap, dmap, axis=1)
        offs = np.take_along_axis(offs, dmap[..., None], axis=1)
    return offs, flip, fmap


def make_eval_plan(frames: int, raw: int, crop: int) -> AugPlan:
    c = int(round((raw - crop) / 2.0))
    offs = np.full((frames, 2), c, dtype=np.int32)
    return AugPlan(offsets=offs, flip=False,
                   frame_map=np.arange(frames, dtype=np.int32))


def apply_plan_host(clip_u8: np.ndarray, plan: AugPlan,
                    crop: int) -> np.ndarray:
    """Reference-parity host execution of a plan: uint8 (T, H, W) ->
    normalized float32 (T, crop, crop).  Used in tests to validate the
    device ingest op."""
    T = clip_u8.shape[0]
    out = np.empty((T, crop, crop), dtype=np.float32)
    for i in range(T):
        src = clip_u8[plan.frame_map[i]]
        y, x = plan.offsets[i]
        out[i] = src[y:y + crop, x:x + crop].astype(np.float32)
    out /= 255.0
    out = color_normalize(out)
    if plan.flip:
        out = out[:, :, ::-1]
    return np.ascontiguousarray(out)
