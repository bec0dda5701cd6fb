"""ResNet backbone tests: FrozenBN math, bottleneck parity vs an in-test
torch oracle (standard torchvision v1.5 bottleneck), shapes, mask subsampling."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from reftr_tpu.nn.convert import convert_resnet
from reftr_tpu.nn.resnet import (
    Bottleneck,
    FrozenBatchNorm,
    ResNet,
    downsample_mask,
)


def frozen_bn_torch(x, w, b, rm, rv, eps=1e-5):
    scale = w * (rv + eps).rsqrt()
    bias = b - rm * scale
    return x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)


def test_frozen_bn(rng):
    C = 16
    x = rng.normal(size=(2, C, 8, 8)).astype(np.float32)
    w = rng.normal(size=C).astype(np.float32)
    b = rng.normal(size=C).astype(np.float32)
    rm = rng.normal(size=C).astype(np.float32)
    rv = rng.uniform(0.5, 2.0, size=C).astype(np.float32)
    want = frozen_bn_torch(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        torch.from_numpy(rm), torch.from_numpy(rv)).numpy()
    m = FrozenBatchNorm(C)
    params = {"params": {"weight": w, "bias": b, "running_mean": rm,
                         "running_var": rv}}
    got = np.asarray(m.apply(params, np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               rtol=1e-5, atol=1e-5)


class TorchBottleneck(torch.nn.Module):
    """Standard torchvision v1.5 bottleneck with frozen BN, as oracle."""

    def __init__(self, in_ch, width, stride=1, downsample=False):
        super().__init__()
        out_ch = width * 4
        self.conv1 = torch.nn.Conv2d(in_ch, width, 1, bias=False)
        self.conv2 = torch.nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.conv3 = torch.nn.Conv2d(width, out_ch, 1, bias=False)
        self.has_down = downsample
        if downsample:
            self.down = torch.nn.Conv2d(in_ch, out_ch, 1, stride, bias=False)
        g = torch.Generator().manual_seed(7)
        self.stats = {}
        for name, ch in (("bn1", width), ("bn2", width), ("bn3", out_ch),
                         ("bnd", out_ch)):
            self.stats[name] = [
                torch.rand(ch, generator=g) + 0.5,  # weight
                torch.randn(ch, generator=g) * 0.1,  # bias
                torch.randn(ch, generator=g) * 0.1,  # mean
                torch.rand(ch, generator=g) + 0.5,  # var
            ]

    def bn(self, x, name):
        w, b, rm, rv = self.stats[name]
        return frozen_bn_torch(x, w, b, rm, rv)

    def forward(self, x):
        idt = x
        y = F.relu(self.bn(self.conv1(x), "bn1"))
        y = F.relu(self.bn(self.conv2(y), "bn2"))
        y = self.bn(self.conv3(y), "bn3")
        if self.has_down:
            idt = self.bn(self.down(x), "bnd")
        return F.relu(y + idt)

    def export_state(self):
        sd = {}
        for j, conv in ((1, self.conv1), (2, self.conv2), (3, self.conv3)):
            sd[f"x.conv{j}.weight"] = conv.weight
            w, b, rm, rv = self.stats[f"bn{j}"]
            sd[f"x.bn{j}.weight"] = w
            sd[f"x.bn{j}.bias"] = b
            sd[f"x.bn{j}.running_mean"] = rm
            sd[f"x.bn{j}.running_var"] = rv
        if self.has_down:
            sd["x.downsample.0.weight"] = self.down.weight
            w, b, rm, rv = self.stats["bnd"]
            sd["x.downsample.1.weight"] = w
            sd["x.downsample.1.bias"] = b
            sd["x.downsample.1.running_mean"] = rm
            sd["x.downsample.1.running_var"] = rv
        return sd


def test_bottleneck_vs_torch(rng):
    torch.manual_seed(5)
    t_block = TorchBottleneck(in_ch=32, width=16, stride=2, downsample=True)
    x = rng.normal(size=(2, 32, 14, 14)).astype(np.float32)
    with torch.no_grad():
        want = t_block(torch.from_numpy(x)).numpy()

    from reftr_tpu.nn import convert as C

    sd = t_block.export_state()
    params = {}
    for j in (1, 2, 3):
        params[f"conv{j}"] = C.conv(sd, f"x.conv{j}")
        params[f"bn{j}"] = C.frozen_bn(sd, f"x.bn{j}")
    params["downsample_conv"] = C.conv(sd, "x.downsample.0")
    params["downsample_bn"] = C.frozen_bn(sd, "x.downsample.1")

    block = Bottleneck(width=16, stride=2, downsample=True)
    got = np.asarray(
        block.apply({"params": params}, np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(got, (0, 3, 1, 2)), want, rtol=1e-4, atol=1e-4)


def test_resnet_shapes(rng):
    import jax

    model = ResNet("resnet50", return_interm_layers=True)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024), (1, 2, 2, 2048)]

    single = ResNet("resnet50", return_interm_layers=False)
    params = single.init(jax.random.PRNGKey(0), x)
    (f4,) = single.apply(params, x)
    assert f4.shape == (1, 2, 2, 2048)


def test_convert_resnet_covers_all_params(rng):
    """The converter's output tree must exactly match the module's init tree."""
    import jax

    # tiny fake torchvision state dict with correct shapes for resnet50
    model = ResNet("resnet50", return_interm_layers=False)
    x = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    # build a synthetic torch-style sd from our own params (transposed back)
    sd = {}

    def emit(prefix_t, tree):
        for k, v in tree.items():
            if k.startswith("conv") or k == "downsample_conv":
                name = {"downsample_conv": "downsample.0"}.get(k, k)
                sd[f"{prefix_t}{name}.weight"] = np.transpose(
                    np.asarray(v["kernel"]), (3, 2, 0, 1))
            elif k.startswith("bn") or k == "downsample_bn":
                name = {"downsample_bn": "downsample.1"}.get(k, k)
                for s in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{prefix_t}{name}.{s}"] = np.asarray(v[s])

    emit("", {"conv1": params["conv1"], "bn1": params["bn1"]})
    for key, tree in params.items():
        if key.startswith("layer"):
            stage, b = key[5:].split("_")
            emit(f"layer{stage}.{b}.", tree)

    converted = convert_resnet(sd, "resnet50")
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(converted)
    paths_a = {jax.tree_util.keystr(p) for p, _ in flat_a}
    paths_b = {jax.tree_util.keystr(p) for p, _ in flat_b}
    assert paths_a == paths_b
    for (p, a), (_, bv) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                               sorted(flat_b, key=lambda t: str(t[0]))):
        np.testing.assert_allclose(np.asarray(a), bv, rtol=1e-6)


def test_downsample_mask_matches_torch_nearest(rng):
    m = rng.uniform(size=(2, 37, 53)) > 0.3
    want = (
        F.interpolate(torch.from_numpy(m).float()[None], size=(5, 7))
        .numpy()[0]
        .astype(bool)
    )
    got = np.asarray(downsample_mask(m, (5, 7)))
    np.testing.assert_array_equal(got, want)


def test_dc5_dilation_stride16(rng):
    """DC5: layer4 dilated instead of strided (backbone.py:117-125)."""
    import jax

    model = ResNet("resnet50", return_interm_layers=False, dilation=True)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    (f4,) = model.apply(params, x)
    assert f4.shape == (1, 4, 4, 2048)  # stride 16, not 32


def test_resnet101_shapes(rng):
    import jax

    model = ResNet("resnet101", return_interm_layers=False)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    # 23 blocks in layer3
    assert "layer3_22" in params["params"]
    (f4,) = model.apply(params, x)
    assert f4.shape == (1, 2, 2, 2048)


def test_space_to_depth_and_fold_bn_equivalence(rng):
    """The optimized stem (2x2 s2d + 4x4/s1 conv) and folded FrozenBN are
    exact reparameterizations of the standard backbone (nn/fold.py)."""
    import jax

    from reftr_tpu.nn.fold import optimize_resnet_params

    base = ResNet("resnet50", return_interm_layers=True)
    x = rng.normal(size=(2, 64, 96, 3)).astype(np.float32)
    params = model_params = base.init(jax.random.PRNGKey(0), x)["params"]
    # randomize BN stats so the fold is non-trivial
    leaves = jax.tree_util.tree_leaves_with_path(params)
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: (np.abs(rng.normal(size=v.shape)).astype(np.float32)
                      + 0.5) if "running_var" in jax.tree_util.keystr(p)
        else (rng.normal(size=v.shape).astype(np.float32) * 0.1 + v
              if "running_mean" in jax.tree_util.keystr(p) else v),
        params)
    ref = base.apply({"params": params}, x)

    for s2d, fold in ((True, False), (False, True), (True, True)):
        opt_model = ResNet("resnet50", return_interm_layers=True,
                           space_to_depth=s2d, fold_bn=fold)
        opt_params = optimize_resnet_params(params, space_to_depth=s2d,
                                            fold_bn=fold)
        # param tree structurally matches a fresh init of the same flags
        init_tree = jax.tree_util.tree_structure(
            opt_model.init(jax.random.PRNGKey(1), x)["params"])
        assert jax.tree_util.tree_structure(opt_params) == init_tree
        out = opt_model.apply({"params": opt_params}, x)
        for a, b in zip(ref, out):
            assert a.shape == b.shape
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=f"s2d={s2d} fold={fold}")


def test_fold_normalize_equivalence(rng):
    """Folding /255 + ImageNet normalize into the stem: raw-uint8 input
    through the folded backbone == normalized input through the unfolded
    one — exactly, for every output whose stem taps lie inside the canvas.
    The outermost output ring differs by design (the fold gives the canvas
    SAME-padding the reference's zero-in-normalized-space semantics; see
    nn/fold.py docstring)."""
    import jax

    from reftr_tpu.nn.fold import optimize_resnet_params
    from reftr_tpu.ops.image import normalize_images

    base = ResNet("resnet50", return_interm_layers=True)
    img = rng.integers(0, 256, size=(1, 128, 160, 3)).astype(np.uint8)
    x_norm = np.asarray(normalize_images(img))
    params = base.init(jax.random.PRNGKey(0), x_norm)["params"]
    ref = base.apply({"params": params}, x_norm)

    for s2d in (False, True):
        opt_model = ResNet("resnet50", return_interm_layers=True,
                           space_to_depth=s2d, fold_bn=True)
        opt_params = optimize_resnet_params(
            params, space_to_depth=s2d, fold_bn=True, fold_normalize=True)
        out = opt_model.apply({"params": opt_params},
                              img.astype(np.float32))
        # layer1 output is stride 4; the stem border halo (2 stem px) grows
        # through the maxpool (2 px) and layer1's three 3x3 convs (3 px) to
        # ~6 layer1 pixels — compare beyond it
        a = np.asarray(ref[0])[:, 6:-6, 6:-6]
        b = np.asarray(out[0])[:, 6:-6, 6:-6]
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4,
                                   err_msg=f"s2d={s2d}")
        # deeper stages: halo grows with receptive field; just check finite
        # + same shape (the interior argument holds transitively)
        for ra, rb in zip(ref[1:], out[1:]):
            assert ra.shape == rb.shape and np.isfinite(
                np.asarray(rb)).all()

    # requires fold_bn
    with pytest.raises(AssertionError, match="fold_bn"):
        optimize_resnet_params(params, fold_normalize=True)


def test_pad_inner_channels_equivalence(rng):
    """min_inner_width zero-padding is an exact reparameterization: padded
    channels stay zero through bn/relu and contribute nothing to conv3."""
    import jax

    from reftr_tpu.nn.fold import optimize_resnet_params

    base = ResNet("resnet50", return_interm_layers=True)
    x = rng.normal(size=(1, 64, 96, 3)).astype(np.float32)
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    # non-trivial bn stats
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: (np.abs(rng.normal(size=v.shape)).astype(np.float32)
                      + 0.5) if "running_var" in jax.tree_util.keystr(p)
        else v, params)
    ref = base.apply({"params": params}, x)

    for fold in (False, True):
        padded_model = ResNet("resnet50", return_interm_layers=True,
                              fold_bn=fold, min_inner_width=128)
        opt = optimize_resnet_params(params, fold_bn=fold,
                                     min_inner_width=128)
        init_tree = jax.tree_util.tree_structure(
            padded_model.init(jax.random.PRNGKey(1), x)["params"])
        assert jax.tree_util.tree_structure(opt) == init_tree
        assert opt["layer1_0"]["conv2"]["kernel"].shape == (3, 3, 128, 128)
        assert opt["layer2_0"]["conv2"]["kernel"].shape == (3, 3, 128, 128)
        assert opt["layer3_0"]["conv2"]["kernel"].shape == (3, 3, 256, 256)
        out = padded_model.apply({"params": opt}, x)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"fold={fold}")


def test_remat_blocks_equivalence(rng):
    """Per-bottleneck jax.checkpoint (full or stage-selective) changes the
    schedule, not the function: forward identical, gradients match."""
    import jax
    import jax.numpy as jnp

    base = ResNet("resnet50", return_interm_layers=False)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    (ref,) = base.apply({"params": params}, x)

    def loss(model):
        return lambda p: jnp.sum(model.apply({"params": p}, x)[0] ** 2)

    g_ref = jax.grad(loss(base))(params)
    for kw in (dict(remat_blocks=True), dict(remat_stages=(1, 2))):
        m = ResNet("resnet50", return_interm_layers=False, **kw)
        (out,) = m.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        g = jax.grad(loss(m))(params)
        a = jax.tree_util.tree_leaves(g_ref)
        b = jax.tree_util.tree_leaves(g)
        for ga, gb in zip(a, b):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                       rtol=1e-4, atol=1e-5)


def test_fold_matches_torch_converted_weights(rng):
    """Stem fold on real converter output: torch 7x7 kernel -> s2d kernel,
    conv1 output equal on a small input."""
    import jax
    import jax.numpy as jnp
    import torch

    from reftr_tpu.nn.convert import conv as conv_convert
    from reftr_tpu.nn.fold import fold_conv1_to_s2d

    w = torch.randn(64, 3, 7, 7)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    # torch oracle
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = torch.nn.functional.conv2d(
        xt, w, stride=2, padding=3).numpy().transpose(0, 2, 3, 1)
    # folded path
    k = fold_conv1_to_s2d(conv_convert({"c.weight": w}, "c")["kernel"])
    xp = jnp.pad(jnp.asarray(x), ((0, 0), (4, 4), (4, 4), (0, 0)))
    b, hp, wp, c = xp.shape
    y = xp.reshape(b, hp // 2, 2, wp // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4 * c)
    got = jax.lax.conv_general_dilated(
        y, jnp.asarray(k), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[:, :16, :16]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_block_layer1_equivalence(rng):
    """layer1 on the 2x2 space-to-depth grid (block_layer1) is an exact
    reparameterization: fold_layer1_to_block'd params through the block
    model reproduce the standard backbone to float tolerance, alone and
    composed with the s2d stem + BN folds (nn/fold.py)."""
    import jax

    from reftr_tpu.nn.fold import optimize_resnet_params

    base = ResNet("resnet50", return_interm_layers=True)
    x = rng.normal(size=(2, 64, 96, 3)).astype(np.float32)
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    # randomize BN stats so the x4 tiling of the bn vectors is non-trivial
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: (np.abs(rng.normal(size=v.shape)).astype(np.float32)
                      + 0.5) if "running_var" in jax.tree_util.keystr(p)
        else (rng.normal(size=v.shape).astype(np.float32) * 0.1 + v
              if "running_mean" in jax.tree_util.keystr(p) else v),
        params)
    ref = base.apply({"params": params}, x)

    for s2d, fold in ((False, False), (True, True)):
        opt_model = ResNet("resnet50", return_interm_layers=True,
                           space_to_depth=s2d, fold_bn=fold,
                           block_layer1=True)
        opt_params = optimize_resnet_params(
            params, space_to_depth=s2d, fold_bn=fold, block_layer1=True)
        init_tree = jax.tree_util.tree_structure(
            opt_model.init(jax.random.PRNGKey(1), x)["params"])
        assert jax.tree_util.tree_structure(opt_params) == init_tree
        out = opt_model.apply({"params": opt_params}, x)
        for a, b in zip(ref, out):
            assert a.shape == b.shape
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=f"block_layer1 s2d={s2d} fold={fold}")
