"""Load-time backbone weight transforms for the TPU-optimized stem/BN.

Two optimizations (PERFORMANCE.md "known headroom"):

  * space-to-depth stem — the reference's 7x7/stride-2 conv on 3-channel
    input (backbone.py:119 via torchvision) uses <3% of the MXU's 128
    contraction lanes. Rearranging 2x2 input blocks into channels turns it
    into an exactly-equivalent 4x4/stride-1 conv on 12 channels.
  * FrozenBN folding — FrozenBatchNorm is an affine y = x*scale + shift
    with constant scale/shift (backbone.py:43-80); scale folds into the
    preceding conv's output channels, leaving a single bias add.

Both are pure parameter transforms: a standard converted ResNet tree
(nn/convert.py) becomes the tree of a ResNet built with
space_to_depth/fold_bn flags, with numerically equivalent fp32 forward
(tested in tests/test_resnet.py). Folding is a reparameterization: under training,
gradients flow into the folded kernel (scale is a frozen constant, so the
function space is unchanged; only weight-decay geometry differs slightly).

Derivation of the stem fold: with x padded by 3, O[i,j] =
sum_{u,v<7} W[u,v] x[2i+u-3, 2j+v-3]. Pad W to 8x8 at the top-left and x
by 4; substituting u = 2a+s gives O[i,j] =
sum_{a,b<4, s,t<2} W8[2a+s,2b+t] Y[i+a, j+b, s, t] where Y is the 2x2
space-to-depth of the padded input — a 4x4 VALID conv whose extra last
output row/col (from the larger padding) is sliced off.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

_BN_EPS = 1e-5
_PAIRS = (("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3"),
          ("downsample_conv", "downsample_bn"), ("conv1_s2d", "bn1"))


def fold_conv1_to_s2d(kernel: np.ndarray) -> np.ndarray:
    """[7,7,C,O] stride-2 stem kernel -> [4,4,4C,O] for the s2d stem."""
    kh, kw, c, o = kernel.shape
    assert (kh, kw) == (7, 7), f"stem kernel must be 7x7, got {kernel.shape}"
    w8 = np.pad(np.asarray(kernel), ((1, 0), (1, 0), (0, 0), (0, 0)))
    # u = 2a+s, v = 2b+t; channel order (s, t, c) matches space_to_depth()
    k = w8.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    return np.ascontiguousarray(k.reshape(4, 4, 4 * c, o))


def _fold_pair(conv_p: Dict[str, Any], bn_p: Dict[str, Any],
               eps: float = _BN_EPS):
    """Returns (folded conv params, folded bn params {bias})."""
    w = np.asarray(bn_p["weight"], np.float64)
    var = np.asarray(bn_p["running_var"], np.float64)
    mean = np.asarray(bn_p["running_mean"], np.float64)
    bias = np.asarray(bn_p["bias"], np.float64)
    scale = w / np.sqrt(var + eps)
    shift = bias - mean * scale
    kernel = np.asarray(conv_p["kernel"], np.float32)
    folded = {"kernel": (kernel * scale.astype(np.float32)).astype(
        np.float32)}
    return folded, {"bias": shift.astype(np.float32)}


def optimize_resnet_params(
    params: Dict[str, Any],
    space_to_depth: bool = False,
    fold_bn: bool = False,
    eps: float = _BN_EPS,
) -> Dict[str, Any]:
    """Standard ResNet param tree -> tree for ResNet(space_to_depth, fold_bn).

    Order matters: the stem kernel is rearranged first, then BN scales fold
    into whichever stem conv exists.
    """
    out = {k: dict(v) for k, v in params.items()}
    if space_to_depth and "conv1" in out:
        out["conv1_s2d"] = {
            "kernel": fold_conv1_to_s2d(np.asarray(out["conv1"]["kernel"]))}
        del out["conv1"]
    if fold_bn:
        for name, mod in out.items():
            if name.startswith("layer"):
                for cname, bname in _PAIRS:
                    if cname in mod and bname in mod:
                        mod[cname], mod[bname] = _fold_pair(
                            mod[cname], mod[bname], eps)
        for cname in ("conv1", "conv1_s2d"):
            if cname in out and "bn1" in out:
                out[cname], out["bn1"] = _fold_pair(out[cname], out["bn1"],
                                                    eps)
    return out


def optimize_backbone_in_tree(params: Dict[str, Any], model_cfg) -> Dict:
    """Apply the configured stem/BN folds to a full model param tree (the
    _load_pretrained hook: converted reference checkpoints are standard)."""
    if not (getattr(model_cfg, "space_to_depth_stem", False)
            or getattr(model_cfg, "fold_bn", False)):
        return params
    out = dict(params)
    if "img_backbone" in out:
        out["img_backbone"] = optimize_resnet_params(
            out["img_backbone"],
            space_to_depth=model_cfg.space_to_depth_stem,
            fold_bn=model_cfg.fold_bn)
    return out
