"""Structured configuration for every workload in the framework.

Replaces the reference's scattered configuration surface -- per-project
``config.py`` module constants, ``parse_args()`` in ``utils.py:78-146``, and
inline hardcoded hyperparameters (58 at decoder.py:59-60, maxlen 16 at
decoder.py:95, teacher-forcing rate at decoder.py:176) -- with one set of
dataclasses plus per-stage presets.  The README's manual "edit the config
between stages" recipe (reference README.md:46-68) becomes
``stage presets``: ``sbl_stage1()`` / ``sbl_stage2()`` etc.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from .vocab import TOTAL_PHONEMES, LRW_PHONEMES, LRW1000_PHONEMES


@dataclasses.dataclass(frozen=True)
class TransformerDims:
    """Shared transformer dimensions (reference utils.py:91-116 defaults)."""
    d_model: int = 512
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    d_inner: int = 2048
    n_enc_layers: int = 6
    n_dec_layers: int = 6
    dropout: float = 0.1
    pe_maxlen: int = 5000


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Conv3D + ResNet-18 visual frontend (reference video_frontend.py:91-135)."""
    conv3d_channels: int = 64
    resnet_channels: Tuple[int, int, int, int] = (64, 128, 256, 512)
    resnet_blocks: Tuple[int, int, int, int] = (2, 2, 2, 2)
    feature_dim: int = 512
    dropout: float = 0.5
    bn_momentum: float = 0.9   # fraction of running stat kept (torch momentum=0.1)
    bn_epsilon: float = 1e-5


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 58
    maxlen: int = 16                      # decode steps (reference decoder.py:95)
    target_pad_len: int = 14              # label buffer length (data_gen.py:300)
    tie_embedding: bool = False           # SBL uses untied heads (decoder.py:57-60)
    bidirectional: bool = True            # SBL synchronous L2R+R2L
    # 'symmetric': mathematically-intended fusion  l2r' = l2r + rev(r2l),
    #              r2l' = r2l + rev(l2r)   (both read pre-update values)
    # 'reference_aliased': exact reproduction of the reference's in-place
    #              aliasing (decoder.py:132-164):  l2r' = l2r + rev(r2l),
    #              r2l' = 2*r2l + rev(l2r)
    fusion_mode: str = "symmetric"
    teacher_forcing_rate: float = 0.5     # P(use gold) per step (decoder.py:176)
    # growing-buffer scan segments (see decoder_sbl._segments); more
    # segments = less padded compute but more compiled scan bodies
    # 8 growing-buffer scan segments (widths 3,5,...,17): ~9% fewer decode
    # position-steps than 4 segments; measured +3.3% end-to-end @B=512 for
    # ~3 min extra compile.  Results are bit-identical at any segment count
    # (test_decode_segments_equivalent).
    decode_segments: int = 8
    # lax.scan unroll factor for the decode loop (decoder_sbl.SBLDecoder
    # .scan_unroll): >1 fuses consecutive steps' dW-accumulator updates in
    # the training backward at the cost of a larger compiled scan body.
    # MEASURED on the production donated B=240 train step (round 4,
    # tools/train_split_probe.py JOBS=prod, same session): unroll 1 =
    # 464.8 ms/iter, 2 = 410.7 (-11.6%), 4 = 410.2 (no further gain for
    # ~2x the scan-body compile) -> default 2.
    scan_unroll: int = 2
    # Accumulate the decode scan's parameter gradients in bf16 (hoists the
    # f32->bf16 weight cast out of the scan; halves the backward's dW
    # accumulator HBM traffic).  MEASURED NO-WIN on chip (round 5,
    # tools/tpu_batch5.sh): 415.3 ms/iter vs 415.7 base bracket on the
    # B=240 prod step — the dW segment adds are not bandwidth-bound, so
    # the halved traffic buys nothing and the numerics risk isn't worth
    # noise.  Kept as a recorded experiment; default OFF.
    grad_accum_bf16: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    frames: int = 30            # padded clip length (data_gen.py:294)
    raw_size: int = 96          # stored frame side
    crop_size: int = 88         # training/eval crop side
    mean: float = 0.413621      # ColorNormalize (cvtransforms.py:44-48)
    std: float = 0.1700239
    frame_removal_p: float = 0.05   # FrameRemoval (data_gen.py:104-108)
    max_crop_offset: int = 8        # RandomCrop offset range (cvtransforms.py:28-29)
    # the LRW project's RandomDrop: drop a frame w.p. p (total drops capped
    # at min(10, 0.2*T)), repeat-fill the tail
    # (VSR_..._LRW/cvtransforms.py:32-41, applied at data_gen.py:140)
    random_drop_p: float = 0.0
    # the LRW project's RandomCrop draws ONE (x1, y1) per clip
    # (VSR_..._LRW/cvtransforms.py:20-26) vs the SBL project's per-frame draw
    per_clip_crop: bool = False
    lrw_path: str = "../roi_80_116_175_211_npy_gray"
    lrw1000_path: str = "../LRW1000_npy_rsz122_gray"
    lrw1000_info: str = "../LRW1000_info"
    lrw1000_images: str = "../LRW1000/images"
    lrw1000_wav: str = "../LRW1000_audio"
    data_fraction: float = 1.0      # reference config.py `p`


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Noam schedule + Adam (reference optimizer.py:1-27)."""
    k: float = 0.2
    warmup_steps: int = 4000
    lr_base_dim: int = 512
    adam_b1: float = 0.9
    adam_b2: float = 0.98
    adam_eps: float = 1e-9
    label_smoothing: float = 0.1
    grad_clip: Optional[float] = None   # reference clip_gradient exists but unused


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1      # data-parallel axis size
    model: int = 1     # tensor-parallel axis size
    sync_batchnorm: bool = True  # GSPMD default (global-batch BN stats);
                                 # False reproduces DataParallel's per-replica
                                 # stats via GroupedBatchNorm (one group per
                                 # dp shard)


@dataclasses.dataclass(frozen=True)
class WorkloadConfig:
    name: str = "sbl"   # sbl | lrw | lrw1000 | classify
    dims: TransformerDims = TransformerDims()
    frontend: FrontendConfig = FrontendConfig()
    decoder: Optional[DecoderConfig] = DecoderConfig()
    data: DataConfig = DataConfig()
    optim: OptimConfig = OptimConfig()
    mesh: MeshConfig = MeshConfig()
    batch_size: int = 240
    seed: int = 7
    # numerics: params fp32; matmul/conv compute dtype for the heavy path
    compute_dtype: str = "bfloat16"
    # classify workload extras (reference classify/train.py:127-130)
    num_word_classes: int = 1500
    num_languages: int = 2
    language_loss_weight: float = 0.1
    # fixed LRW-1000 samples per batch via TwoStreamBatchSampler
    # (reference classify data_gen.py:340-367); 0 = plain shuffling
    secondary_batch_size: int = 0
    # fused small-T Pallas attention (ops/attention.py, flat-layout
    # variant): 1.46x end-to-end inference (honest ablation @B=512:
    # 326 -> 223 ms/iter); auto-disabled off-TPU and in dropout-active
    # training
    use_pallas_attention: bool = True
    # whole-decoder-layer Pallas megakernel on deterministic decode steps
    # (ops/decoder_layer.py); auto-disabled off-TPU and on training steps.
    # Default OFF: honest timing (tools/fused_layer_probe.py with chained
    # dispatch) measured ~0.80 ms/layer-call vs ~0.83 for the XLA
    # composition at B=256/L=17 -- not worth its multi-minute Mosaic
    # compile, and at (B=240, L=5) the direction-vmapped kernel overflowed
    # the 16 MB scoped VMEM.  Kept as an option for further fusion work.
    use_fused_decoder_layer: bool = False
    # rematerialize ResNet blocks in backward (activation-memory saver).
    # Default OFF since round 3: the reference's B=240 recipe FITS a 16 GB
    # chip with frontend activations stored, and skipping the recompute is
    # 453 -> 426 ms/step (530 -> 563 clips/s, tools/train_split_probe.py).
    # Turn on (--remat-frontend) for --cache-on-device datasets or larger
    # batches, where the reclaimed activation HBM matters more.
    remat_frontend: bool = False
    # rematerialize each SBL decode step in backward (decoder_sbl.remat);
    # saves 16 steps x 12 layers of (B, 17, d_inner) activations
    remat_decoder: bool = True
    # zero gradients for these top-level param subtrees (the reference's
    # manual requires_grad stage toggles, README.md:46-48)
    freeze_prefixes: Tuple[str, ...] = ()


def sbl() -> WorkloadConfig:
    """Headline SBL multilingual config: 58-token vocab, bidirectional decoder."""
    return WorkloadConfig(
        name="sbl",
        decoder=DecoderConfig(vocab_size=len(TOTAL_PHONEMES), bidirectional=True),
    )


def sbl_stage2() -> WorkloadConfig:
    """SBL fine-tuning stage: teacher forcing annealed 0.5 -> 0.1
    (reference README.md:62-68)."""
    return WorkloadConfig(
        name="sbl",
        decoder=DecoderConfig(vocab_size=len(TOTAL_PHONEMES), bidirectional=True,
                              teacher_forcing_rate=0.1),
    )


def lrw_seq2seq() -> WorkloadConfig:
    """LRW English seq2seq: 42-token vocab, unidirectional tied decoder."""
    return WorkloadConfig(
        name="lrw",
        decoder=DecoderConfig(vocab_size=len(LRW_PHONEMES), bidirectional=False,
                              tie_embedding=True, maxlen=14, target_pad_len=12),
        # LRW-project augmentation protocol: per-clip RandomCrop +
        # RandomDrop, no FrameRemoval (data_gen.py:137-140)
        data=dataclasses.replace(DataConfig(), frame_removal_p=0.0,
                                 random_drop_p=0.01, per_clip_crop=True),
    )


def lrw1000_seq2seq() -> WorkloadConfig:
    """LRW-1000 Mandarin seq2seq: 48-token vocab, unidirectional tied decoder,
    bigram-LM-biased beam search at eval."""
    return WorkloadConfig(
        name="lrw1000",
        decoder=DecoderConfig(vocab_size=len(LRW1000_PHONEMES), bidirectional=False,
                              tie_embedding=True, maxlen=16, target_pad_len=14),
    )


def classify() -> WorkloadConfig:
    """Stage-1 frontend pretraining: 1500-way word + 2-way language heads;
    clips padded to 31 frames (reference classify/data_gen.py:237)."""
    return WorkloadConfig(
        name="classify",
        decoder=None,
        data=dataclasses.replace(DataConfig(), frames=31),
        batch_size=120,
    )


def tiny_test(name: str = "sbl") -> WorkloadConfig:
    """CPU-runnable miniature for tests: 2 layers, d_model 64."""
    dims = TransformerDims(d_model=64, n_head=4, d_k=16, d_v=16, d_inner=128,
                           n_enc_layers=2, n_dec_layers=2)
    fe = FrontendConfig(conv3d_channels=8, resnet_channels=(8, 16, 32, 64),
                        resnet_blocks=(1, 1, 1, 1), feature_dim=64)
    base = {"sbl": sbl, "lrw": lrw_seq2seq, "lrw1000": lrw1000_seq2seq,
            "classify": classify}[name]()
    decoder = base.decoder
    if decoder is not None:
        # short decode + one scan segment: faster CPU-test compiles
        decoder = dataclasses.replace(decoder, maxlen=8, decode_segments=1)
    return dataclasses.replace(
        base, dims=dims, frontend=fe, decoder=decoder, batch_size=2,
        compute_dtype="float32",
        data=dataclasses.replace(base.data, frames=30 if name != "classify" else 31,
                                 raw_size=40, crop_size=32),
        # short warmup so a handful of test steps sees a usable lr
        optim=dataclasses.replace(base.optim, k=0.1, warmup_steps=20,
                                  lr_base_dim=dims.d_model),
    )


PRESETS = {
    "sbl": sbl,
    "sbl_stage2": sbl_stage2,
    "lrw": lrw_seq2seq,
    "lrw1000": lrw1000_seq2seq,
    "classify": classify,
}
