"""Int8 post-training quantization for the ResNet backbone (serving only).

The backbone is 77% of serving device time (PERFORMANCE.md) and the MXU
runs int8 at twice the bf16 peak, so the convs are lowered to int8 while
everything around them stays in the model's compute dtype:

    x (bf16) -> quantize(x / s_in) -> int8 conv -> int32
      -> dequantize(* s_in * w_scale[c]) -> bf16 -> (+ folded-BN bias, relu)

Activations stay FP between convs — residual adds, relu, and the
quant/dequant chains are elementwise and fuse; only the conv itself runs
on the int8 MXU path. Scales are static: per-output-channel for weights
(absmax / 127), per-tensor for each conv input (absmax over calibration
batches, recorded by `sow_absmax` in nn/resnet.py).

This has no reference counterpart (the reference serves fp32 CUDA,
models/modeling/backbone.py); it is a TPU-native serving feature gated
behind --quantize_int8 and validated for accuracy in
tests/test_quantize.py. Requires fold_bn (the BN scale must live in the
conv kernel for per-channel weight quantization to absorb it).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

QMAX = 127.0


class QuantConv(nn.Module):
    """Drop-in for nn.Conv(use_bias=False) running the int8 MXU path.

    Expects params produced by `quantize_conv_kernel`:
      kernel_q [kh,kw,cin,cout] int8, w_scale [cout] f32, in_scale [] f32.
    """

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: Any = "SAME"
    kernel_dilation: tuple = (1, 1)
    dtype: Any = jnp.float32
    # float_kernel: store kernel_q as f32 (integer VALUES in [-127, 127])
    # and cast to int8 in-call. The int8 MXU path is unchanged; the f32
    # storage keeps the param tree differentiable so jax.grad accepts it —
    # required for TRAINING-time quantization of FROZEN stages (the
    # stop_gradient at the frozen boundary means the non-differentiable
    # round/cast ops are never on the tangent path; the leaves just get
    # zero grads). Kernel bytes are negligible vs the activation traffic
    # this path targets (layer1: ~0.6 M weights vs 13 MB/img activations).
    float_kernel: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kq = self.param("kernel_q", nn.initializers.zeros,
                        (kh, kw, cin, self.features),
                        jnp.float32 if self.float_kernel else jnp.int8)
        if self.float_kernel:
            kq = kq.astype(jnp.int8)
        w_scale = self.param("w_scale", nn.initializers.ones,
                             (self.features,), jnp.float32)
        in_scale = self.param("in_scale", nn.initializers.ones,
                              (), jnp.float32)
        # quantization math in f32: bf16 has an 8-bit mantissa, so rounding
        # x/s to the int8 grid in bf16 would add up to +-0.5 extra error at
        # magnitudes near 127. The chain is elementwise and fuses either way.
        inv = 1.0 / in_scale
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                      -QMAX, QMAX).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kq.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xq, kq, self.strides, self.padding,
            rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        scale = w_scale * in_scale
        return (y.astype(jnp.float32) * scale).astype(self.dtype)


class QuantDense(nn.Module):
    """Drop-in for nn.Dense running the int8 MXU path (serving only).

    Same scheme as QuantConv: per-output-channel weight scales, a static
    per-tensor input scale calibrated from eval batches, symmetric and
    zero-point free. The bias stays fp and is added after dequantization.
    Used for the BERT and VL-encoder projections/FFNs when
    --quantize_int8 is on (the lang+VL stack is ~38% of serving device
    time once the backbone is int8 — PERFORMANCE.md round 3).

    Transformer PTQ caveat: absmax activation calibration is sensitive to
    outlier channels (post-LayerNorm/GELU activations); accuracy is gated
    by tests/test_quantize.py and the trained-model e2e eval check.
    """

    features: int
    dtype: Any = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        din = x.shape[-1]
        kq = self.param("kernel_q", nn.initializers.zeros,
                        (din, self.features), jnp.int8)
        w_scale = self.param("w_scale", nn.initializers.ones,
                             (self.features,), jnp.float32)
        in_scale = self.param("in_scale", nn.initializers.ones,
                              (), jnp.float32)
        inv = 1.0 / in_scale
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                      -QMAX, QMAX).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, kq, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * (w_scale * in_scale)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias
        return out.astype(self.dtype)


def quantize_dense_kernel(kernel: jnp.ndarray, bias, in_absmax: float) -> Dict:
    """fp Dense params + calibrated input absmax -> QuantDense params."""
    k = np.asarray(kernel, np.float32)
    w_absmax = np.abs(k).max(axis=0)
    w_scale = np.maximum(w_absmax, 1e-12) / QMAX
    kq = np.clip(np.round(k / w_scale), -QMAX, QMAX).astype(np.int8)
    out = {
        "kernel_q": jnp.asarray(kq),
        "w_scale": jnp.asarray(w_scale),
        "in_scale": jnp.asarray(np.float32(max(float(in_absmax), 1e-12)
                                           / QMAX)),
    }
    if bias is not None:
        out["bias"] = jnp.asarray(np.asarray(bias, np.float32))
    return out


def quantize_conv_kernel(kernel: jnp.ndarray, in_absmax: float,
                         float_kernel: bool = False) -> Dict:
    """fp kernel [kh,kw,cin,cout] + calibrated input absmax -> QuantConv params.

    Weight scale is per output channel (absmax/127); symmetric, zero-point
    free (TPU int8 matmul has no zero-point path, and conv inputs here are
    relu outputs or normalized images, both ~symmetric or one-sided where
    clipping at 0 loses nothing). float_kernel stores the integer values
    in f32 for QuantConv(float_kernel=True) — the grad-safe training
    layout."""
    k = np.asarray(kernel, np.float32)
    w_absmax = np.abs(k).reshape(-1, k.shape[-1]).max(axis=0)
    w_scale = np.maximum(w_absmax, 1e-12) / QMAX
    kq = np.clip(np.round(k / w_scale), -QMAX, QMAX).astype(
        np.float32 if float_kernel else np.int8)
    in_scale = np.float32(max(float(in_absmax), 1e-12) / QMAX)
    return {
        "kernel_q": jnp.asarray(kq),
        "w_scale": jnp.asarray(w_scale),
        "in_scale": jnp.asarray(in_scale),
    }


# conv param names inside a Bottleneck subtree (resnet.py module names);
# the stem ('conv1'/'conv1_s2d' at the tree root) intentionally stays fp.
_CONV_NAMES = ("conv1", "conv2", "conv3", "downsample_conv")


def quantize_backbone_params(backbone_params: Dict, calib: Dict,
                             stages=None, float_kernel: bool = False) -> Dict:
    """Rewrite a (fold_bn-folded) fp backbone param tree into its int8 twin.

    Only convs inside `layer*` (Bottleneck) subtrees are rewritten — the
    stem conv and all FrozenBN biases pass through unchanged. `calib`
    mirrors the module structure with `<conv name>_in` absmax leaves, as
    produced by ResNet(sow_absmax=True) under mutable=['calib']
    (nn/resnet.py). `stages` restricts the rewrite to those stage numbers
    (None = all); float_kernel selects the grad-safe f32-stored layout
    for ResNet(quantize_stages=...) training-time int8."""

    def rewrite_block(tree: Dict, calib_tree: Dict) -> Dict:
        out = {}
        for name, sub in tree.items():
            if name in _CONV_NAMES and isinstance(sub, dict) \
                    and "kernel" in sub:
                absmax = calib_tree[f"{name}_in"]
                absmax = float(np.max(np.asarray(absmax)))
                out[name] = quantize_conv_kernel(sub["kernel"], absmax,
                                                 float_kernel=float_kernel)
            else:
                out[name] = sub
        return out

    def selected(name: str) -> bool:
        if not name.startswith("layer"):
            return False
        return stages is None or int(name[len("layer")]) in stages

    return {
        name: (rewrite_block(sub, calib.get(name, {}))
               if selected(name) and isinstance(sub, dict)
               else sub)
        for name, sub in backbone_params.items()
    }


def quantize_dense_params(tree: Dict, calib: Dict) -> Dict:
    """Rewrite every fp Dense subtree that has a calibrated twin.

    Walks `tree` and `calib` in lockstep; a child named `n` with a
    `kernel` leaf is rewritten to QuantDense params iff the calib level
    holds an `{n}_in` absmax (sown by the module's fp calibration pass).
    Everything else (LayerNorms, embeddings, un-calibrated denses like the
    BERT pooler) passes through unchanged."""

    def walk(t, c):
        if not isinstance(t, dict):
            return t
        out = {}
        for name, sub in t.items():
            if (isinstance(sub, dict) and "kernel" in sub
                    and f"{name}_in" in c):
                absmax = float(np.max(np.asarray(c[f"{name}_in"])))
                out[name] = quantize_dense_kernel(
                    sub["kernel"], sub.get("bias"), absmax)
            elif isinstance(sub, dict):
                out[name] = walk(sub, c.get(name, {})
                                 if isinstance(c, dict) else {})
            else:
                out[name] = sub
        return out

    return walk(tree, calib)


# Activation absmax beyond this indicates a broken fp model (normalized
# images / relu features / layer-normed hidden states all live far below);
# a calibration leaf outside (0, CEILING) would bake a nonsense in_scale
# into the int8 twin, so fail loudly instead.
CALIB_ABSMAX_CEILING = 1e6


def validate_calibration(calib: Dict) -> None:
    """Every calibrated absmax must be finite, > 0, and sane.

    Zero absmax (a dead activation over all calibration batches) would give
    the epsilon-floored scale in quantize_*_kernel, silently quantizing the
    whole tensor to 0 at serving time; NaN/inf would poison every output."""
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(calib):
        arr = np.asarray(leaf)
        mx = float(np.max(arr)) if arr.size else 0.0
        if not np.isfinite(arr).all() or mx <= 0.0 \
                or mx > CALIB_ABSMAX_CEILING:
            bad.append((jax.tree_util.keystr(path), mx))
    if bad:
        raise ValueError(
            "int8 PTQ calibration produced invalid activation absmax "
            f"(must be finite, > 0, <= {CALIB_ABSMAX_CEILING:g}): {bad[:8]}")


def calibration_drift(calib: Dict, observed: Dict,
                      factor: float = 2.0) -> list:
    """Leaves where a later batch's activation absmax exceeds the
    calibrated absmax by more than `factor` — inputs there saturate the
    int8 clip and accuracy may drift. Returns [(path, calibrated,
    observed), ...]. Calibration so far is validated on the synthetic
    fixture only; real-data activation distributions (natural images) are
    the untested risk this guard exists to surface (PERFORMANCE.md)."""
    drift = []

    def cmp(path, c, o):
        cm = float(np.max(np.asarray(c)))
        om = float(np.max(np.asarray(o)))
        if om > factor * cm:
            drift.append((jax.tree_util.keystr(path), cm, om))
        return c

    jax.tree_util.tree_map_with_path(
        lambda p, c, o: cmp(p, c, o), calib, observed)
    return drift


def calibrate_and_quantize(cfg, params: Dict, loader, mesh=None,
                           n_batches: int = 4, print_fn=print) -> Dict:
    """Eval-time PTQ: run `n_batches` through the fp model recording
    per-conv input absmax, then rewrite the backbone params for
    RefTR(quantize_int8=True).

    `cfg` is the full RefTRConfig with quantize_int8 OFF (the fp twin);
    `loader` yields (batch, targets) like the eval loaders."""
    import dataclasses as _dc

    import jax

    from reftr_tpu.models.build import build_model
    from reftr_tpu.parallel.context import use_mesh

    calib_cfg = _dc.replace(
        cfg, model=_dc.replace(cfg.model, quantize_int8=False,
                               quant_calibrate=True))
    calib_model, _ = build_model(calib_cfg)

    @jax.jit
    def calib_step(p, batch):
        with use_mesh(mesh):
            _, var = calib_model.apply({"params": p}, batch,
                                       deterministic=True,
                                       mutable=["calib"])
        return var["calib"]

    absmax = None
    holdout = None
    for i, (batch, _targets) in enumerate(loader):
        if i >= n_batches:
            holdout = batch  # first uncalibrated batch: drift probe below
            break
        c = jax.device_get(calib_step(params, batch))
        absmax = c if absmax is None else jax.tree_util.tree_map(
            np.maximum, absmax, c)
    if absmax is None:
        raise ValueError("calibration loader yielded no batches")
    validate_calibration(absmax)
    if holdout is not None:
        drift = calibration_drift(
            absmax, jax.device_get(calib_step(params, holdout)))
        for path, cm, om in drift[:8]:
            print_fn(f"int8 PTQ WARNING: activation absmax drift at {path}: "
                     f"calibrated {cm:.3g}, observed {om:.3g} (> 2x) — "
                     "inputs saturate the int8 clip; recalibrate with more "
                     "batches or widen quant_calib_batches")
    print_fn(f"int8 PTQ: calibrated on {min(i + 1, n_batches)} batches; "
             "quantizing backbone convs")
    out = quantize_params(params, absmax, scope=cfg.model.quantize_scope)
    # Re-commit the rewritten tree to the device(s). quantize_params works
    # on host arrays, and leaving numpy leaves in a jit argument tree makes
    # the axon tunnel re-serialize them on EVERY dispatch (measured: the
    # full-scope int8 model served at 24 img/s with numpy leaves vs fp-level
    # dispatch cost once device-resident — PERFORMANCE.md round 3).
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        # eval-time PTQ replicates params over the mesh (DP eval; int8
        # eval under TP-sharded params is unsupported)
        out = jax.device_put(out, NamedSharding(mesh, PartitionSpec()))
    else:
        out = jax.device_put(out)
    return out


def calibrate_train_prefix(cfg, params: Dict, loader,
                           n_batches: int = 4, print_fn=print) -> Dict:
    """TRAINING-time int8 for the frozen stem+layer1 prefix
    (ModelConfig.quantize_train_prefix): calibrate per-conv input absmax
    on the first `n_batches` train batches, then rewrite the layer1
    Bottleneck convs into the f32-stored (grad-safe) QuantConv layout for
    ResNet(quantize_stages=(1,)).

    Legal because the prefix is frozen (reference backbone.py:85-89 —
    requires_grad always False) and sits under the stage-1 stop_gradient,
    so no gradient ever touches the int8 ops. Scale determinism across
    processes: per-process absmax trees are allgathered and elementwise
    max-reduced so every process bakes identical params."""
    import dataclasses as _dc

    from jax.experimental import multihost_utils

    from reftr_tpu.models.build import build_model

    calib_cfg = _dc.replace(
        cfg, model=_dc.replace(cfg.model, quantize_int8=False,
                               quantize_train_prefix=False,
                               quant_calibrate=True))
    calib_model, _ = build_model(calib_cfg)

    @jax.jit
    def calib_step(p, batch):
        _, var = calib_model.apply({"params": p}, batch,
                                   deterministic=True, mutable=["calib"])
        return var["calib"]

    absmax = None
    for i, (batch, _targets) in enumerate(loader):
        if i >= n_batches:
            break
        c = jax.device_get(calib_step(params, batch))
        absmax = c if absmax is None else jax.tree_util.tree_map(
            np.maximum, absmax, c)
    if absmax is None:
        raise ValueError("prefix calibration loader yielded no batches")
    if jax.process_count() > 1:
        leaves, treedef = jax.tree_util.tree_flatten(absmax)
        gathered = multihost_utils.process_allgather(
            jnp.asarray([float(l) for l in leaves]))
        leaves = np.asarray(gathered).max(axis=0)
        absmax = jax.tree_util.tree_unflatten(treedef, list(leaves))
    validate_calibration(
        {"img_backbone": {k: v for k, v in absmax["img_backbone"].items()
                          if k.startswith("layer1_")}})
    print_fn(f"int8 train-prefix: calibrated layer1 on {n_batches} "
             "batches; rewriting to float-stored int8")
    out = dict(params)
    out["img_backbone"] = quantize_backbone_params(
        out["img_backbone"], absmax["img_backbone"], stages={1},
        float_kernel=True)
    return jax.device_put(out)


def quantize_params(params: Dict, calib: Dict,
                    scope=("backbone",)) -> Dict:
    """fp->int8 param rewrite from a calibrated absmax tree, for the
    components named in `scope` ("backbone" = bottleneck convs; "bert" /
    "vl" = every projection/FFN dense with a calibrated twin). Must match
    the model's ModelConfig.quantize_scope."""
    out = dict(params)
    if "backbone" in scope:
        out["img_backbone"] = quantize_backbone_params(
            out["img_backbone"], calib["img_backbone"])
    for key, name in (("bert", "lang_backbone"), ("vl", "vl_transformer")):
        if key in scope and name in calib and name in out:
            out[name] = quantize_dense_params(out[name], calib[name])
    return out
