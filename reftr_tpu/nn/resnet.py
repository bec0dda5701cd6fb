"""ResNet-50/101 image backbone with frozen BatchNorm, NHWC, in Flax.

Capability parity with /root/reference/models/modeling/backbone.py:
  * FrozenBatchNorm2d semantics — affine params and running stats are plain
    (non-trained) parameters; eps added *before* rsqrt (backbone.py:43-80),
  * torchvision ResNet v1.5 topology (stride on the 3x3 conv of each
    bottleneck) so released PyTorch checkpoints convert 1:1,
  * 1-level (layer4) or 4-level (layer1-4) feature extraction
    (backbone.py:90-99),
  * optional DC5 dilation of the last stage (backbone.py:117-125).

TPU-first differences: NHWC layout, bf16-friendly compute dtype (stats math
stays in fp32), per-level masks computed by exact nearest subsampling instead
of F.interpolate on device.

Module/parameter names mirror torchvision ('conv1', 'bn1', 'layer1'...'4',
block indices, 'downsample') so the PyTorch->JAX converter is mechanical.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Block counts per torchvision model name.
RESNET_LAYERS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine parameters.

    All four tensors live in the param tree (they are loaded from converted
    checkpoints) but are excluded from optimization by the optimizer's
    param-group labeling, mirroring torch buffers.
    """

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32
    # folded: scale pre-multiplied into the preceding conv's kernel at load
    # (nn/fold.py); only the shift remains, as a plain bias add.
    folded: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = (self.features,)
        if self.folded:
            bias = self.param("bias", nn.initializers.zeros, f)
            return x + bias.astype(x.dtype)
        weight = self.param("weight", nn.initializers.ones, f)
        bias = self.param("bias", nn.initializers.zeros, f)
        mean = self.param("running_mean", nn.initializers.zeros, f)
        var = self.param("running_var", nn.initializers.ones, f)
        # eps before rsqrt (reference comment: other models produce NaN
        # without it). Compute scale/shift in fp32, apply in compute dtype.
        scale = weight * jax.lax.rsqrt(var + self.eps)
        shift = bias - mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


def _norm(norm: str, features: int, dtype: Any, folded: bool,
          name: str) -> nn.Module:
    """Backbone norm factory: 'frozen' = FrozenBatchNorm (reference parity,
    backbone.py:43-80); 'group' = live GroupNorm(32) with fp32 statistics
    for FROM-SCRATCH training, where frozen init-value stats (var=1)
    normalize nothing and the residual stream overflows fp32 (measured,
    PERFORMANCE.md round 5). All feature counts in resnet50/101 (64..2048,
    incl. pad_width multiples of 128) divide 32."""
    if norm == "frozen":
        return FrozenBatchNorm(features, dtype=dtype, folded=folded,
                               name=name)
    assert norm == "group", norm
    # flax computes the group statistics in fp32 (use_fast_variance path
    # still promotes half inputs); affine params are fp32 per convention
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype, name=name)


def _conv(features: int, kernel: int, stride: int = 1, dilation: int = 1,
          dtype: Any = jnp.float32, name: str | None = None,
          quantize: bool = False, float_kernel: bool = False) -> nn.Module:
    pad = dilation * (kernel - 1) // 2
    if quantize:
        from reftr_tpu.nn.quant import QuantConv

        return QuantConv(
            features,
            (kernel, kernel),
            strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(dilation, dilation),
            dtype=dtype,
            float_kernel=float_kernel,
            name=name,
        )
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class Bottleneck(nn.Module):
    """torchvision Bottleneck (expansion 4, stride on conv2 = v1.5).

    pad_width > width zero-pads the INNER (conv1-out/conv2/conv3-in)
    channels up to pad_width — an exact reparameterization (padded
    channels carry zeros through relu into conv3's zero input weights;
    nn/fold.py pads converted checkpoints) that fills the MXU's 128
    output lanes at the spatial-heavy low-width stages.
    """

    width: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    fold_bn: bool = False
    pad_width: int = 0
    # int8 serving path (nn/quant.py): convs run on the int8 MXU,
    # activations stay in compute dtype between them. sow_absmax records
    # per-conv input absmax into the 'calib' collection (fp calibration
    # pass) for quantize_backbone_params.
    quantize: bool = False
    sow_absmax: bool = False
    norm: str = "frozen"  # frozen | group — see _norm
    # int8 convs with f32-stored (grad-safe) kernels: the TRAINING-time
    # quantization mode for frozen stages (QuantConv.float_kernel)
    float_kernel: bool = False

    def _calib(self, name: str, x: jnp.ndarray) -> None:
        if self.sow_absmax:
            self.sow("calib", name, jnp.max(jnp.abs(x.astype(jnp.float32))),
                     init_fn=lambda: jnp.float32(0),
                     reduce_fn=jnp.maximum)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.width * 4
        inner = max(self.width, self.pad_width)
        fold = self.fold_bn
        q = self.quantize
        fk = self.float_kernel
        identity = x
        self._calib("conv1_in", x)
        y = _conv(inner, 1, dtype=self.dtype, name="conv1", quantize=q,
                  float_kernel=fk)(x)
        y = _norm(self.norm, inner, self.dtype, fold, "bn1")(y)
        y = nn.relu(y)
        self._calib("conv2_in", y)
        y = _conv(inner, 3, self.stride, self.dilation, self.dtype, "conv2",
                  quantize=q, float_kernel=fk)(y)
        y = _norm(self.norm, inner, self.dtype, fold, "bn2")(y)
        y = nn.relu(y)
        self._calib("conv3_in", y)
        y = _conv(out_ch, 1, dtype=self.dtype, name="conv3", quantize=q,
                  float_kernel=fk)(y)
        y = _norm(self.norm, out_ch, self.dtype, fold, "bn3")(y)
        if self.downsample:
            self._calib("downsample_conv_in", x)
            identity = _conv(out_ch, 1, self.stride, dtype=self.dtype,
                             name="downsample_conv", quantize=q,
                             float_kernel=fk)(x)
            identity = _norm(self.norm, out_ch, self.dtype, fold,
                             "downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """Feature-pyramid ResNet. Input NHWC float images (already normalized).

    Returns a tuple of feature maps: (layer1..layer4) when
    `return_interm_layers` else (layer4,).
    """

    name_or_depth: str = "resnet50"
    return_interm_layers: bool = False
    dilation: bool = False  # DC5: dilate layer4 instead of striding
    dtype: Any = jnp.float32
    # TPU stem: 2x2 space-to-depth + 4x4/s1 conv on 12 channels, exactly
    # equivalent to the 7x7/s2 conv on 3 channels (which uses <3% of the
    # MXU's 128 contraction lanes). Weight fold: nn/fold.py.
    space_to_depth: bool = False
    fold_bn: bool = False  # BN scale folded into conv kernels at load
    # zero-pad bottleneck inner widths below this to it (0 = off); fills
    # MXU lanes at the spatial-heavy low-channel stages (layer1 width 64)
    min_inner_width: int = 0
    # run layer1 on the 2x2 space-to-depth grid (80^2 x 256/1024 channels
    # instead of 160^2 x 64/256): an exact weight reparameterization
    # (nn/fold.py::fold_layer1_to_block) that fills the MXU lanes at the
    # backbone's spatial-heaviest stage — measured 1.2-1.8x per conv
    # despite carrying up to 4x the nominal FLOPs (PERFORMANCE.md round 3)
    block_layer1: bool = False
    # jax.checkpoint bottlenecks: backward recomputes the block's inner
    # activations instead of reading them back from HBM — a candidate win
    # for the bandwidth-bound conv backward at 640px (measured in bench.py).
    # remat_blocks=True remats every block; remat_stages remats only the
    # listed stages (1..4) — the conv-level profile puts 59% of the
    # backbone's fwd+bwd in stem+layer1, so (1,) is the targeted variant.
    remat_blocks: bool = False
    remat_stages: Tuple[int, ...] = ()
    # int8 PTQ serving path (nn/quant.py); requires fold_bn so the BN scale
    # lives in the conv kernel where per-channel weight quantization
    # absorbs it. Bottleneck convs only — the stem stays fp (3/12 input
    # channels underfill the MXU's contraction lanes either way, and under
    # fold_normalize its input is raw uint8 whose scale the calibration
    # would waste a bit on). sow_absmax = fp calibration pass
    # (mutable=['calib']).
    quantize: bool = False
    sow_absmax: bool = False
    # Stages whose outputs are wrapped in stop_gradient. Mirrors torch
    # requires_grad=False autograd pruning for frozen stages: the reference
    # NEVER trains the stem+layer1 (backbone.py:85-89), so torch skips their
    # entire backward (the image needs no grad); stage 1 here kills the
    # stem+layer1 backward (~59% of the backbone's fwd+bwd at 640px,
    # PERFORMANCE.md conv profile) and keeps frozen params out of the global
    # clip norm (torch clip skips grad=None params). (1,2,3,4) = fully
    # frozen backbone (lr_backbone<=0 / --freeze_backbone).
    stop_grad_stages: Tuple[int, ...] = ()
    # frozen | group — live GroupNorm(32) for from-scratch training (_norm)
    norm: str = "frozen"
    # TRAINING-time int8: stages whose bottleneck convs run the int8 MXU
    # path with f32-stored kernels (QuantConv.float_kernel — grad-safe).
    # Only sane for FROZEN stages (must be covered by stop_grad_stages so
    # the non-differentiable int8 ops never sit on the tangent path);
    # targets stem+layer1's dominant HBM traffic during training
    # (PERFORMANCE.md conv profile: 58% of the backbone forward).
    # Mutually exclusive with `quantize` (the serving PTQ mode).
    quantize_stages: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        assert not (self.quantize and not self.fold_bn), \
            "quantize=True requires fold_bn (BN scale must be in the kernel)"
        assert not (self.norm != "frozen" and self.fold_bn), \
            "fold_bn requires frozen BN statistics (norm='frozen')"
        assert not (self.quantize_stages and self.quantize), \
            "quantize_stages (training int8) and quantize (serving PTQ) " \
            "are mutually exclusive"
        assert set(self.quantize_stages) <= set(self.stop_grad_stages), \
            "quantize_stages must be frozen (stop_grad_stages) — int8 " \
            "convs are not differentiable"
        blocks = RESNET_LAYERS[self.name_or_depth]
        x = x.astype(self.dtype)
        if self.space_to_depth:
            b, h, w, c = x.shape
            assert h % 2 == 0 and w % 2 == 0, "s2d stem needs even H, W"
            out_h, out_w = (h + 1) // 2, (w + 1) // 2
            x = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
            x = x.reshape(b, (h + 8) // 2, 2, (w + 8) // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(b, (h + 8) // 2, (w + 8) // 2, 4 * c)
            x = nn.Conv(64, (4, 4), strides=(1, 1), padding="VALID",
                        use_bias=False, dtype=self.dtype,
                        name="conv1_s2d")(x)
            # the symmetric pad-4 admits one extra output row/col vs the
            # original pad-3 stride-2 grid — slice it off
            x = x[:, :out_h, :out_w]
        else:
            x = _conv(64, 7, 2, dtype=self.dtype, name="conv1")(x)
        x = _norm(self.norm, 64, self.dtype, self.fold_bn, "bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        widths = (64, 128, 256, 512)
        for stage, (width, n_blocks) in enumerate(zip(widths, blocks), start=1):
            block_cls = (nn.remat(Bottleneck)
                         if self.remat_blocks or stage in self.remat_stages
                         else Bottleneck)
            stride = 1 if stage == 1 else 2
            dilation = 1
            if stage == 4 and self.dilation:
                stride, dilation = 1, 2
            blk = self.block_layer1 and stage == 1
            if blk:
                assert not self.min_inner_width, \
                    "backbone_pad_width and block_layer1 are exclusive"
                bb, hh, ww, cc = x.shape
                assert hh % 2 == 0 and ww % 2 == 0, \
                    "block_layer1 needs even post-stem H, W"
                # 2x2 space-to-depth, channel order (py, px, c) — the
                # stage-1 convs run on the block grid with the exact
                # reparameterized kernels (nn/fold.py); stride stays 1
                x = x.reshape(bb, hh // 2, 2, ww // 2, 2, cc)
                x = x.transpose(0, 1, 3, 2, 4, 5)
                x = x.reshape(bb, hh // 2, ww // 2, 4 * cc)
                width = width * 4
            for b in range(n_blocks):
                # torchvision's replace_stride_with_dilation: block 0 keeps
                # the previous dilation (1), later blocks use the new one.
                block_dilation = 1 if b == 0 else dilation
                x = block_cls(
                    width=width,
                    stride=stride if b == 0 else 1,
                    dilation=block_dilation,
                    downsample=(b == 0),
                    dtype=self.dtype,
                    fold_bn=self.fold_bn,
                    pad_width=self.min_inner_width,
                    quantize=self.quantize or stage in self.quantize_stages,
                    float_kernel=stage in self.quantize_stages,
                    sow_absmax=self.sow_absmax,
                    norm=self.norm,
                    name=f"layer{stage}_{b}",
                )(x)
            if blk:
                # depth-to-space back to the original grid for layer2/FPN
                bb, hh, ww, c4 = x.shape
                cc = c4 // 4
                x = x.reshape(bb, hh, ww, 2, 2, cc)
                x = x.transpose(0, 1, 3, 2, 4, 5)
                x = x.reshape(bb, hh * 2, ww * 2, cc)
            if stage in self.stop_grad_stages:
                x = jax.lax.stop_gradient(x)
            feats.append(x)

        if self.return_interm_layers:
            return tuple(feats)
        return (feats[-1],)


def backbone_strides_channels(return_interm_layers: bool, dilation: bool):
    """Mirrors BackboneBase strides/num_channels (backbone.py:90-99,124-125)."""
    if return_interm_layers:
        strides = [4, 8, 16, 32]
        channels = [256, 512, 1024, 2048]
    else:
        strides = [32]
        channels = [2048]
    if dilation:
        strides[-1] //= 2
    return strides, channels


def downsample_mask(valid_mask: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-subsample a [B, H, W] bool mask to out_hw.

    Matches torch F.interpolate(mode='nearest') index selection:
    src = floor(dst * in/out).
    """
    b, h, w = valid_mask.shape
    oh, ow = out_hw
    ys = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return valid_mask[:, ys][:, :, xs]
