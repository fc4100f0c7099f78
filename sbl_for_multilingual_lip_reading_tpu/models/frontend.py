"""Visual frontend: Conv3D ingest + per-frame ResNet-18 trunk.

TPU-native rewrite of the reference frontend
(SBL_Multilingual_Lip_reading/transformer/video_frontend.py:91-174):

    Conv3d(1->64, k=(5,7,7), s=(1,2,2), p=(2,3,3), no bias) + BN + ReLU
    + MaxPool3d(k=(1,3,3), s=(1,2,2), p=(0,1,1))
    -> per-frame ResNet-18 (BasicBlock [2,2,2,2], 64/128/256/512, no stem)
    -> global average pool -> (B, T, 512) -> dropout 0.5

Design choices for TPU:
* channels-last layouts throughout -- video enters as (B, T, H, W, 1)
  (NDHWC) and frames fold into the batch as (B*T, H, W, C) (NHWC) so every
  conv maps onto the MXU with XLA's preferred layout; the reference's
  NCDHW permute/contiguous dance (video_frontend.py:116-120) disappears.
* the whole stack jits into one fused graph; BatchNorm runs in float32
  statistics regardless of compute dtype.
* the reference applies ``F.dropout(x, p=0.5)`` unconditionally -- i.e. also
  at eval time, a torch functional-API bug (video_frontend.py:122).  We gate
  dropout on ``deterministic`` (the intended semantics) and document the
  divergence here.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray

# He-normal fan-out init, matching the reference's manual
# normal_(0, sqrt(2/n)) with n = prod(kernel) * out_channels
# (video_frontend.py:137-160, ResNet.__init__:55-58).
_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class GroupedBatchNorm(nn.Module):
    """BatchNorm with per-replica (DataParallel) statistics semantics.

    The reference's only parallelism is ``nn.DataParallel`` (SBL
    train.py:115), whose BatchNorm computes statistics per GPU replica over
    its local batch slice, and only the source replica's running-stat buffer
    updates survive the scatter/gather.  Under jit/GSPMD a plain
    ``nn.BatchNorm`` reduces over the *global* batch (synced BN).  This
    module reproduces the DataParallel semantics TPU-natively: the leading
    (batch) dim splits into ``groups`` contiguous slices, each normalized by
    its own statistics -- with the batch dp-sharded along dim 0, each
    group's stats reduce entirely on-device (no collectives, no shard_map)
    -- and running stats update from group 0 only (the torch source
    replica).  Variable layout matches ``nn.BatchNorm`` (params scale/bias,
    batch_stats mean/var) so checkpoints interchange with the synced path.
    """
    groups: int = 1
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool = True) -> Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros,
                                None, (features,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones,
                               None, (features,), jnp.float32)
        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.epsilon) * scale
            return xf * inv + (bias - mean * inv)
        g = self.groups
        N = x.shape[0]
        assert N % g == 0, f"batch {N} not divisible by {g} BN groups"
        xg = xf.reshape((g, N // g) + x.shape[1:])
        axes = tuple(range(1, xg.ndim - 1))
        mean = jnp.mean(xg, axes)                       # (g, C)
        var = jnp.mean(jnp.square(xg), axes) - jnp.square(mean)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean[0]
            ra_var.value = m * ra_var.value + (1 - m) * var[0]
        shape = (g,) + (1,) * len(axes) + (features,)
        inv = jax.lax.rsqrt(var + self.epsilon).reshape(shape)
        y = (xg - mean.reshape(shape)) * inv * scale + bias
        return y.reshape(x.shape)


class FastBatchNorm(nn.Module):
    """``nn.BatchNorm`` drop-in whose train-mode statistics run as one-pass
    Pallas reductions (ops/batchnorm.py).

    XLA's standalone stat-reduce fusions measured 3-15x over the bandwidth
    floor at the frontend's shapes (~70 ms of the B=240 train step,
    tools/trace_agg.py); the custom-VJP path reads each tensor once forward
    (sum, sum^2) and once backward ((sum dy, sum dy*xhat) == (d_bias,
    d_scale)) with dx left as a fusable elementwise expression.  Variable
    layout matches ``nn.BatchNorm`` (params scale/bias, batch_stats
    mean/var, all f32) so checkpoints interchange; eval mode is the same
    affine fold and never touches Pallas.
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    interpret: Optional[bool] = None  # None = auto (interpret off-TPU)

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool = True) -> Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros,
                                None, (features,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones,
                               None, (features,), jnp.float32)
        if use_running_average or self.is_initializing():
            mul = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            return ((x.astype(jnp.float32) - ra_mean.value) * mul
                    + bias).astype(x.dtype)
        from ..ops.batchnorm import bn_train
        y, mean, var = bn_train(x, scale, bias, self.epsilon, self.interpret)
        m = self.momentum
        ra_mean.value = m * ra_mean.value + (1 - m) * mean
        ra_var.value = m * ra_var.value + (1 - m) * var
        return y


class DotBatchNorm(nn.Module):
    """BatchNorm whose train-mode statistic reductions run as MXU dots
    (ops/bn_dot.py) instead of XLA `reduce` fusions.

    Drop-in for both ``nn.BatchNorm`` (groups=1) and the
    DataParallel-parity ``GroupedBatchNorm`` (groups=dp): same variable
    layout, same biased running-var update, group-0 running stats, f32
    output.  Pure XLA (no Mosaic layout pin), so it runs on every
    backend including the CPU test mesh.  Motivation + formulation in
    ops/bn_dot.py; reference semantics: torch BatchNorm2d train mode
    (video_frontend.py:15-41).
    """
    groups: int = 1
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool = True) -> Array:
        from ..ops.bn_dot import bn_train_dot
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros,
                                None, (features,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones,
                               None, (features,), jnp.float32)
        if use_running_average:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            return x.astype(jnp.float32) * inv + (bias - ra_mean.value * inv)
        y, mean, var = bn_train_dot(x, scale, bias, self.epsilon,
                                    self.groups)
        if not self.is_initializing():
            m = self.momentum
            # running stats from group 0 (the torch source replica);
            # stop_gradient: torch never backprops the running buffers
            ra_mean.value = (m * ra_mean.value
                             + (1 - m) * jax.lax.stop_gradient(mean[0]))
            ra_var.value = (m * ra_var.value
                            + (1 - m) * jax.lax.stop_gradient(var[0]))
        return y


class FusedBNAct(nn.Module):
    """BatchNorm (+ residual add) (+ ReLU) with the minimal-residual fused
    train-mode backward (ops/bn_relu.py).

    Default production BN for the frontend since round 4: the composed
    autodiff path keeps the BN output alive as the ReLU VJP's residual
    (~5 GB across the stem + 8 blocks at B=240), which XLA's HLO
    rematerializer then fights by re-running the stat reductions in the
    backward (~20 ms/iter of ``.remat`` fusions in the production trace).
    The custom VJP stores only the conv output + (groups, C) statistics and
    recomputes xhat / the ReLU mask elementwise.

    Variable layout matches ``nn.BatchNorm`` / ``GroupedBatchNorm`` (params
    scale/bias, batch_stats mean/var, all f32) so checkpoints interchange;
    ``groups`` > 1 reproduces the DataParallel per-replica statistics
    semantics (running stats from group 0, the torch source replica).
    Reference semantics: video_frontend.py:15-41 (blocks), :95-97 (stem).
    """
    groups: int = 1
    momentum: float = 0.9
    epsilon: float = 1e-5
    relu: bool = True

    @nn.compact
    def __call__(self, x: Array, res: Optional[Array] = None,
                 use_running_average: bool = True) -> Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros,
                                None, (C,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones,
                               None, (C,), jnp.float32)
        if use_running_average or self.is_initializing():
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            y = (x.astype(jnp.float32) * inv
                 + (bias - ra_mean.value * inv)).astype(x.dtype)
            if res is not None:
                y = y + res.astype(x.dtype)
            return jax.nn.relu(y) if self.relu else y
        from ..ops.bn_relu import bn_act_train
        y, mean, var = bn_act_train(x, scale, bias, res,
                                    eps=self.epsilon,
                                    groups=max(1, self.groups),
                                    relu=self.relu)
        m = self.momentum
        # group 0 = the torch source replica; stop_gradient: running
        # buffers are never backpropagated (the op's VJP relies on this)
        ra_mean.value = (m * ra_mean.value
                         + (1 - m) * jax.lax.stop_gradient(mean[0]))
        ra_var.value = (m * ra_var.value
                        + (1 - m) * jax.lax.stop_gradient(var[0]))
        return y


def _dot_bn_on(field: bool) -> bool:
    import os
    if os.environ.get("NO_DOT_BN"):
        return False
    return field or bool(os.environ.get("DOT_BN"))


def _fused_bn_act_on(field: bool) -> bool:
    import os
    if os.environ.get("NO_FUSED_BN_ACT"):
        return False
    return field or bool(os.environ.get("FUSED_BN_ACT"))


def _use_fast_bn() -> bool:
    # real-TPU only, like the stem/attention kernels: the CPU test mesh and
    # the multichip dryrun take the plain nn.BatchNorm path (tests
    # monkeypatch this to exercise the wiring in interpret mode).
    # PALLAS_BN=1 forces the (default-off) kernel on for re-measurement.
    from ..ops.attention import available
    return available()


def _pallas_bn_on(field: bool) -> bool:
    import os
    return (field or bool(os.environ.get("PALLAS_BN"))) and _use_fast_bn()


class BasicBlock(nn.Module):
    """ResNet BasicBlock (reference video_frontend.py:15-41)."""
    filters: int
    stride: int = 1
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    bn_groups: int = 1
    # fused Pallas block kernel on eval steps (ops/resblock.py).  Default
    # OFF: measured 2.2-2.6x SLOWER than XLA's conv emitter at stage-1
    # shapes -- Mosaic tap relayouts dominate and C_out=64 caps any
    # matmul formulation near 50% MXU anyway (see ops/resblock.py
    # docstring for the round-3 measurement log)
    use_pallas_resblock: bool = False
    fused_interpret: bool = False  # force interpret mode (CPU tests)
    # one-pass Pallas train-mode BN statistics (FastBatchNorm); default OFF
    # -- measured a net LOSS (see VisualFrontend.use_pallas_bn)
    use_pallas_bn: bool = False
    # MXU dot-based train-mode BN statistics (DotBatchNorm / ops/bn_dot.py)
    use_dot_bn: bool = False
    # minimal-residual fused BN(+res)+ReLU (FusedBNAct / ops/bn_relu.py);
    # default OFF since round 5: on the real chip the custom-VJP residuals
    # PUSH the B=240 remat-off train step over 16 GB (RESOURCE_EXHAUSTED,
    # twice, same batch where NO_FUSED_BN_ACT ran 437.7 ms/iter) -- the
    # forced residual storage outweighs the dropped ReLU-input buffer.
    # FUSED_BN_ACT=1 re-enables for experiments (loss parity on chip OK,
    # max rel diff 2.1e-4 over 3 steps @B=48).
    use_fused_bn_act: bool = False

    def _fused_eligible(self, x: Array, train: bool) -> bool:
        if (train or self.stride != 1 or x.shape[-1] != self.filters
                or not self.use_pallas_resblock or self.is_initializing()):
            return False
        from ..ops.attention import available
        return available() or self.fused_interpret

    def _fused_eval(self, x: Array) -> Array:
        from ..ops.resblock import fold_bn, fused_resblock
        p = self.variables["params"]
        s = self.variables["batch_stats"]
        a1, b1 = fold_bn(p["bn1"]["scale"], p["bn1"]["bias"],
                         s["bn1"]["mean"], s["bn1"]["var"], self.bn_epsilon)
        a2, b2 = fold_bn(p["bn2"]["scale"], p["bn2"]["bias"],
                         s["bn2"]["mean"], s["bn2"]["var"], self.bn_epsilon)
        return fused_resblock(
            x, p["conv1"]["kernel"].astype(self.dtype), a1, b1,
            p["conv2"]["kernel"].astype(self.dtype), a2, b2,
            interpret=True if self.fused_interpret else None)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self._fused_eligible(x, train):
            return self._fused_eval(x)
        if (_fused_bn_act_on(self.use_fused_bn_act)
                and not _dot_bn_on(self.use_dot_bn)
                and not _pallas_bn_on(self.use_pallas_bn)):
            return self._fused_bn_act_path(x, train)
        def bn(name, h):
            # fp32 statistics, activations kept in compute dtype (the f32
            # BN outputs would otherwise double backward-pass HBM)
            if _dot_bn_on(self.use_dot_bn):
                return DotBatchNorm(
                    max(1, self.bn_groups), self.bn_momentum,
                    self.bn_epsilon, name=name)(
                        h, use_running_average=not train).astype(self.dtype)
            if self.bn_groups > 1:
                return GroupedBatchNorm(
                    self.bn_groups, self.bn_momentum, self.bn_epsilon,
                    name=name)(h, use_running_average=not train).astype(
                        self.dtype)
            if _pallas_bn_on(self.use_pallas_bn):
                return FastBatchNorm(
                    self.bn_momentum, self.bn_epsilon, name=name)(
                        h, use_running_average=not train).astype(self.dtype)
            return nn.BatchNorm(use_running_average=not train,
                                momentum=self.bn_momentum,
                                epsilon=self.bn_epsilon,
                                dtype=jnp.float32, name=name)(h).astype(
                                    self.dtype)
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name="conv1")(x)
        y = bn("bn1", y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=_conv_init,
                    dtype=self.dtype, name="conv2")(y)
        y = bn("bn2", y)
        if self.stride != 1 or x.shape[-1] != self.filters:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=_conv_init,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = bn("downsample_bn", residual)
        return nn.relu(y + residual.astype(y.dtype))

    def _fused_bn_act_path(self, x: Array, train: bool) -> Array:
        """Same math/params as the composed path, with every BN(+res)+ReLU
        running through FusedBNAct (see its docstring)."""
        g = max(1, self.bn_groups)
        ura = not train
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name="conv1")(x)
        y = FusedBNAct(g, self.bn_momentum, self.bn_epsilon, relu=True,
                       name="bn1")(y, use_running_average=ura)
        y = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=_conv_init,
                    dtype=self.dtype, name="conv2")(y)
        if self.stride != 1 or x.shape[-1] != self.filters:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=_conv_init,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = FusedBNAct(g, self.bn_momentum, self.bn_epsilon,
                                  relu=False, name="downsample_bn")(
                residual, use_running_average=ura)
        else:
            residual = x
        return FusedBNAct(g, self.bn_momentum, self.bn_epsilon, relu=True,
                          name="bn2")(y, residual, use_running_average=ura)


class ResNetTrunk(nn.Module):
    """Stemless ResNet-18 trunk (reference video_frontend.py:44-89): four
    stages at strides 1/2/2/2, global average pool to the feature dim.

    ``remat`` rematerializes each block in the backward pass
    (jax.checkpoint) -- trades ~30% frontend FLOPs for O(depth) less
    activation HBM, which is what lets the reference's batch-240 recipe fit
    a single 16 GB chip."""
    channels: Sequence[int] = (64, 128, 256, 512)
    blocks: Sequence[int] = (2, 2, 2, 2)
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    bn_groups: int = 1
    use_pallas_resblock: bool = False
    use_pallas_bn: bool = False
    use_dot_bn: bool = False
    use_fused_bn_act: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        block_cls = nn.remat(BasicBlock, static_argnums=(2,)) if self.remat \
            else BasicBlock
        for stage, (ch, nblocks) in enumerate(zip(self.channels, self.blocks)):
            for b in range(nblocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = block_cls(ch, stride, self.bn_momentum, self.bn_epsilon,
                              self.dtype, self.bn_groups,
                              self.use_pallas_resblock,
                              use_pallas_bn=self.use_pallas_bn,
                              use_dot_bn=self.use_dot_bn,
                              use_fused_bn_act=self.use_fused_bn_act,
                              name=f"layer{stage + 1}_block{b}")(
                    x, train)
        return jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)


class VisualFrontend(nn.Module):
    """(B, T, H, W, 1) grayscale clip -> (B, T, feature_dim) features."""
    conv3d_channels: int = 64
    resnet_channels: Sequence[int] = (64, 128, 256, 512)
    resnet_blocks: Sequence[int] = (2, 2, 2, 2)
    feature_dim: int = 512
    dropout: float = 0.5
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # >1: per-replica (DataParallel-parity) BN statistics over this many
    # contiguous batch groups; set to the dp mesh size so each group's
    # stats reduce on one device (MeshConfig.sync_batchnorm=False)
    bn_groups: int = 1
    # one-pass Pallas temporal-stack kernel (ops/stem.py) on TPU; XLA's
    # dynamic-update-slice stack chain measured ~6.7 ms/iter @B=256 for
    # ~600 MB written (~8x over bandwidth)
    use_pallas_stem: bool = True
    # fused Pallas BasicBlock kernel experiment (ops/resblock.py); default
    # OFF -- measured slower than XLA's conv emitter (docstring there)
    use_pallas_resblock: bool = False
    # one-pass Pallas train-mode BN statistics (ops/batchnorm.py).  Default
    # OFF: measured a NET LOSS on the B=240 train step (device busy 782.7
    # vs 656.8 ms/iter, tools/train_trace_probe.py + trace_agg 2026-08-18).
    # The ~45 ms of XLA stat-reduce overshoot it targets is more than
    # repaid by (a) +73 ms of relayout copies -- the trunk convs emit
    # lanes=N layouts and Mosaic custom calls require the default layout,
    # so every Pallas consumer of a conv output pays a whole-tensor copy
    # (same root cause as the rejected ops/resblock.py kernel) -- and (b)
    # the kernels' own grid overhead at C=64 (lane pad to 128 + batch-block
    # divisibility -> 870+ sequential blocks/call, ~3x over floor).
    # PALLAS_BN=1 in tools/train_split_probe.py re-measures.
    use_pallas_bn: bool = False
    # MXU dot-based train-mode BN statistics (DotBatchNorm; formulation
    # and round-4 motivation in ops/bn_dot.py).  DOT_BN=1 / NO_DOT_BN=1
    # env knobs override for A/B measurement.
    use_dot_bn: bool = False
    # minimal-residual fused BN(+res)+ReLU (FusedBNAct / ops/bn_relu.py);
    # default OFF since round 5 (OOMs the B=240 remat-off prod step on the
    # real chip -- see BasicBlock.use_fused_bn_act).  NO_FUSED_BN_ACT=1 /
    # FUSED_BN_ACT=1 env knobs override for A/B measurement.
    use_fused_bn_act: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 deterministic: bool = True) -> Array:
        B, T, S = x.shape[0], x.shape[1], x.shape[2]
        x = x.astype(self.dtype)
        # Conv3D(1->C, k=(5,7,7), s=(1,2,2)) executed as a 2-D conv over 5
        # temporally-shifted copies of each frame stacked into input
        # channels: identical math (the temporal stride is 1 and C_in is 1),
        # but a 1-input-channel 3-D conv maps terribly onto the MXU while a
        # 5-channel 2-D conv is ~2x faster (measured 26ms vs 51ms @B=256).
        # The parameter keeps the reference conv3d layout (kt,kh,kw,1,C) so
        # checkpoint import (utils/torch_import.py) is unchanged.
        kt = 5
        kernel3d = self.param(
            "conv3d_kernel", _conv_init,
            (kt, 7, 7, 1, self.conv3d_channels), jnp.float32)
        k2d = jnp.transpose(kernel3d[:, :, :, 0, :],
                            (1, 2, 0, 3)).astype(self.dtype)  # (7,7,kt,C)
        from ..ops.attention import available as _pallas_ok
        if self.use_pallas_stem and _pallas_ok():
            from ..ops.stem import stack_frames
            xs = stack_frames(x[..., 0], kt).reshape(B * T, kt, S, S)
            lhs_spec = "NCHW"
        else:
            xp = jnp.pad(x[..., 0],
                         ((0, 0), (kt // 2, kt // 2), (0, 0), (0, 0)))
            xs = jnp.stack([xp[:, i:i + T] for i in range(kt)], axis=-1)
            xs = xs.reshape(B * T, S, S, kt)
            # keep XLA from fusing the frame-stack into the conv: fused, it
            # picks a pathological layout (~5ms slower at B=256)
            xs = jax.lax.optimization_barrier(xs)
            lhs_spec = "NHWC"
        x = jax.lax.conv_general_dilated(
            xs, k2d, window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=(lhs_spec, "HWIO", "NHWC"),
            preferred_element_type=self.dtype)
        if (_fused_bn_act_on(self.use_fused_bn_act)
                and not _dot_bn_on(self.use_dot_bn)
                and not _pallas_bn_on(self.use_pallas_bn)):
            # relu fused in; output already in compute dtype (cast and relu
            # commute exactly, see ops/bn_relu.py)
            x = FusedBNAct(max(1, self.bn_groups), self.bn_momentum,
                           self.bn_epsilon, relu=True, name="bn3d")(
                x, use_running_average=not train)
        else:
            if _dot_bn_on(self.use_dot_bn):
                x = DotBatchNorm(max(1, self.bn_groups), self.bn_momentum,
                                 self.bn_epsilon, name="bn3d")(
                    x, use_running_average=not train)
            elif self.bn_groups > 1:
                x = GroupedBatchNorm(self.bn_groups, self.bn_momentum,
                                     self.bn_epsilon, name="bn3d")(
                    x, use_running_average=not train)
            elif _pallas_bn_on(self.use_pallas_bn):
                x = FastBatchNorm(self.bn_momentum, self.bn_epsilon,
                                  name="bn3d")(
                    x, use_running_average=not train)
            else:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=self.bn_momentum,
                                 epsilon=self.bn_epsilon,
                                 dtype=jnp.float32, name="bn3d")(x)
            x = nn.relu(x).astype(self.dtype)
        # The reference pools with MaxPool3d(k=(1,3,3)) -- temporal window 1,
        # so with time already folded into batch, pool in 2-D: identical
        # math, and it spares XLA a 5-D layout that tile-pads the (B, T)
        # dims 4x (observed 15 GB for a 3.5 GB tensor at batch 256).
        # stem_max_pool additionally swaps the backward's
        # select_and_scatter for a scatter-free packed-argmax route
        # (ops/maxpool.py; bit-identical gradients, tested).
        from ..ops.maxpool import stem_max_pool
        x = stem_max_pool(x)
        x = ResNetTrunk(self.resnet_channels, self.resnet_blocks,
                        self.bn_momentum, self.bn_epsilon, self.dtype,
                        self.remat, self.bn_groups,
                        self.use_pallas_resblock,
                        use_pallas_bn=self.use_pallas_bn,
                        use_dot_bn=self.use_dot_bn,
                        use_fused_bn_act=self.use_fused_bn_act,
                        name="resnet")(
            x, train=train)
        x = nn.Dropout(self.dropout, name="feat_drop")(
            x, deterministic=deterministic)
        return x.reshape(B, T, self.feature_dim)


def frontend_from_config(cfg, dtype=jnp.float32, remat: bool = False,
                         bn_groups: int = 1) -> VisualFrontend:
    return VisualFrontend(
        conv3d_channels=cfg.conv3d_channels,
        resnet_channels=tuple(cfg.resnet_channels),
        resnet_blocks=tuple(cfg.resnet_blocks),
        feature_dim=cfg.feature_dim,
        dropout=cfg.dropout,
        bn_momentum=cfg.bn_momentum,
        bn_epsilon=cfg.bn_epsilon,
        dtype=dtype,
        remat=remat,
        bn_groups=bn_groups,
    )
