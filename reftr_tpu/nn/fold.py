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


def fold_normalize_into_stem(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold the uint8 input normalization (/255 + ImageNet mean/std,
    ops/image.py) into the BN-folded stem, so the model consumes raw uint8
    canvases cast to the compute dtype with NO separate normalize pass.

    With n = a*x + b per channel (a_c = 1/(255*std_c), b_c = -mean_c/std_c):
    conv(W, n) = conv(W*a, x) + sum_{taps}(W)*b — the input-channel scale
    multiplies the stem kernel and the constant shift lands in bn1's folded
    bias. Exact for every output whose taps lie inside the canvas; on the
    outermost output ring the conv's SAME-padding taps change meaning from
    'black pixels' (normalize(0) = b) to 'zero in normalized space' — which
    is exactly the reference's NestedTensor padding semantics
    (util/collate_fn.py:24-41 pads the NORMALIZED tensor with 0), so the
    fold moves the uint8 path closer to the reference at the canvas edge.

    Requires fold_bn (bn1 must be bias-only so the shift has a home).
    """
    from reftr_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    out = {k: dict(v) for k, v in params.items()}
    cname = "conv1_s2d" if "conv1_s2d" in out else "conv1"
    assert "bias" in out["bn1"] and "weight" not in out["bn1"], (
        "fold_normalize requires fold_bn (bias-only bn1)")
    kernel = np.asarray(out[cname]["kernel"], np.float64)  # [kh,kw,cin,o]
    cin = kernel.shape[2]
    assert cin % 3 == 0, cin
    mean = np.asarray(IMAGENET_MEAN, np.float64)
    std = np.asarray(IMAGENET_STD, np.float64)
    a = np.tile(1.0 / (255.0 * std), cin // 3)  # channel order (s, t, rgb)
    b = np.tile(-mean / std, cin // 3)
    bias_add = np.einsum("uvco,c->o", kernel, b)
    out[cname] = {"kernel": (kernel * a[None, None, :, None]).astype(
        np.float32)}
    out["bn1"] = {"bias": (np.asarray(out["bn1"]["bias"], np.float64)
                           + bias_add).astype(np.float32)}
    return out


def _pad_axis(arr: np.ndarray, axis: int, to: int,
              value: float = 0.0) -> np.ndarray:
    n = arr.shape[axis]
    if n >= to:
        return np.asarray(arr)
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, to - n)
    return np.pad(np.asarray(arr), pad, constant_values=value)


def pad_inner_channels(params: Dict[str, Any], min_width: int) -> Dict:
    """Zero-pad bottleneck inner channels (conv1-out / conv2 / conv3-in)
    up to min_width — the param transform matching
    ResNet(min_inner_width=min_width). Exact: padded output channels carry
    zeros (kernel rows zero, bn scale 1 / shift 0 keep them zero through
    relu), and conv3's padded INPUT channels have zero weights.
    """
    out = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in params.items()}
    for name, mod in out.items():
        if not name.startswith("layer"):
            continue
        w = np.asarray(mod["conv2"]["kernel"]).shape[2]
        if w >= min_width:
            continue
        mod["conv1"] = {"kernel": _pad_axis(mod["conv1"]["kernel"], 3,
                                            min_width)}
        mod["conv2"] = {"kernel": _pad_axis(_pad_axis(
            mod["conv2"]["kernel"], 2, min_width), 3, min_width)}
        mod["conv3"] = {"kernel": _pad_axis(mod["conv3"]["kernel"], 2,
                                            min_width)}
        for bname in ("bn1", "bn2"):
            bn = dict(mod[bname])
            bn["bias"] = _pad_axis(bn["bias"], 0, min_width)
            if "weight" in bn:  # unfolded BN: identity on padded channels
                bn["weight"] = _pad_axis(bn["weight"], 0, min_width, 1.0)
                bn["running_mean"] = _pad_axis(bn["running_mean"], 0,
                                               min_width)
                bn["running_var"] = _pad_axis(bn["running_var"], 0,
                                              min_width, 1.0)
            mod[bname] = bn
    return out


def fold_1x1_to_block(kernel: np.ndarray) -> np.ndarray:
    """[1,1,cin,cout] -> [1,1,4cin,4cout] block-diagonal per 2x2 subpixel.

    A 1x1 conv acts on each pixel independently, so in 2x2 space-to-depth
    ("block") space it is the same kernel applied per subpixel slot:
    W'[(p,c),(q,o)] = W[c,o] * delta(p=q), channel order (py,px,c)
    matching the stem's space_to_depth. Exact."""
    _, _, cin, cout = kernel.shape
    w = np.asarray(kernel, np.float32)
    k = np.zeros((1, 1, 4 * cin, 4 * cout), np.float32)
    for p in range(4):
        k[:, :, p * cin:(p + 1) * cin, p * cout:(p + 1) * cout] = w[0, 0]
    return k


def fold_3x3_to_block(kernel: np.ndarray) -> np.ndarray:
    """[3,3,cin,cout] s1 SAME kernel -> [3,3,4cin,4cout] on the 2x2 block
    grid (s1 SAME). Exact.

    Output subpixel (qy,qx) at block (Y,X) is original pixel (2Y+qy,2X+qx);
    its tap at original offset (dy,dx) reads block offset
    (floor((qy+dy)/2), floor((qx+dx)/2)) subpixel ((qy+dy)%2, (qx+dx)%2).
    Offsets stay in [-1,1] so a 3x3 block kernel (75% structural zeros)
    expresses the conv exactly; the zero taps also absorb the block grid's
    SAME padding, which covers 2 original pixels instead of 1."""
    _, _, cin, cout = np.asarray(kernel).shape
    w = np.asarray(kernel, np.float32)
    k = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
    for qy in range(2):
        for qx in range(2):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    By, py = divmod(qy + dy, 2)
                    Bx, px = divmod(qx + dx, 2)
                    pi = (py * 2 + px) * cin
                    qi = (qy * 2 + qx) * cout
                    k[By + 1, Bx + 1, pi:pi + cin, qi:qi + cout] = \
                        w[dy + 1, dx + 1]
    return k


def fold_layer1_to_block(params: Dict[str, Any]) -> Dict[str, Any]:
    """Rewrite every layer1_* Bottleneck subtree for ResNet(block_layer1).

    layer1 runs at the backbone's largest spatial extent (160^2 at 640px)
    with its narrowest channels (64/256) — measured 1.2-1.8x slower per
    conv than the mathematically identical convs on the 2x2-space-to-depth
    grid (80^2 at 256/1024 channels), despite those carrying up to 4x the
    nominal FLOPs: the narrow-channel spatial-heavy shapes underfill the
    MXU's 128-wide lanes (PERFORMANCE.md round 3). Per-channel vectors
    (FrozenBN stats or folded biases) tile x4 in (py,px,c) order."""
    out = dict(params)
    for name, mod in params.items():
        if not name.startswith("layer1_"):
            continue
        m = {}
        for cname, sub in mod.items():
            if cname in ("conv1", "conv3", "downsample_conv"):
                m[cname] = dict(sub, kernel=fold_1x1_to_block(
                    np.asarray(sub["kernel"])))
            elif cname == "conv2":
                m[cname] = dict(sub, kernel=fold_3x3_to_block(
                    np.asarray(sub["kernel"])))
            else:  # bn subtrees: per-channel vectors
                m[cname] = {k: np.tile(np.asarray(v), 4)
                            for k, v in sub.items()}
        out[name] = m
    return out


def optimize_resnet_params(
    params: Dict[str, Any],
    space_to_depth: bool = False,
    fold_bn: bool = False,
    fold_normalize: bool = False,
    min_inner_width: int = 0,
    block_layer1: bool = False,
    eps: float = _BN_EPS,
) -> Dict[str, Any]:
    """Standard ResNet param tree -> tree for ResNet(space_to_depth, fold_bn).

    Order matters: the stem kernel is rearranged first, then BN scales fold
    into whichever stem conv exists, then the input normalization folds
    into the result.
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
    if fold_normalize:
        out = fold_normalize_into_stem(out)
    if min_inner_width:
        assert not block_layer1, \
            "backbone_pad_width and block_layer1 are mutually exclusive"
        out = pad_inner_channels(out, min_inner_width)
    if block_layer1:
        out = fold_layer1_to_block(out)
    return out


def optimize_backbone_in_tree(params: Dict[str, Any], model_cfg) -> Dict:
    """Apply the configured stem/BN folds to a full model param tree (the
    _load_pretrained hook: converted reference checkpoints are standard)."""
    if not (getattr(model_cfg, "space_to_depth_stem", False)
            or getattr(model_cfg, "fold_bn", False)
            or getattr(model_cfg, "fold_normalize", False)
            or getattr(model_cfg, "backbone_pad_width", 0)
            or getattr(model_cfg, "block_layer1", False)):
        return params
    out = dict(params)
    if "img_backbone" in out:
        out["img_backbone"] = optimize_resnet_params(
            out["img_backbone"],
            space_to_depth=model_cfg.space_to_depth_stem,
            fold_bn=model_cfg.fold_bn,
            fold_normalize=getattr(model_cfg, "fold_normalize", False),
            min_inner_width=getattr(model_cfg, "backbone_pad_width", 0),
            block_layer1=getattr(model_cfg, "block_layer1", False))
    return out
