"""RefTRSeg forward + mask losses + seg heads tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from reftr_tpu.core.config import LossConfig
from reftr_tpu.models.criterion import criterion, total_loss, weight_dict
from reftr_tpu.nn.seg_heads import MHAttentionMap, nearest_resize

from tests.test_model_forward import single_phrase_batch, tiny_model_config


def test_nearest_resize_matches_torch(rng):
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(15, 28),
                      mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(nearest_resize(x, (15, 28)))
    np.testing.assert_array_equal(got, want)


def test_mh_attention_map_is_joint_softmax(rng):
    m = MHAttentionMap(hidden_dim=32, num_heads=4)
    q = rng.normal(size=(2, 3, 32)).astype(np.float32)
    k = rng.normal(size=(2, 5, 6, 32)).astype(np.float32)
    valid = np.ones((2, 5, 6), bool)
    valid[1, 3:, :] = False
    params = m.init(jax.random.PRNGKey(0), q, k, valid)
    w = np.asarray(m.apply(params, q, k, valid))
    assert w.shape == (2, 3, 4, 5, 6)
    # joint softmax: sums to 1 over heads x pixels
    np.testing.assert_allclose(w.reshape(2, 3, -1).sum(-1), 1.0, rtol=1e-5)
    # masked pixels get ~zero attention
    assert w[1, :, :, 3:, :].max() < 1e-6


@pytest.fixture(scope="module")
def seg_setup():
    rng = np.random.default_rng(4)
    # nheads=8 so the mask-head input (2*hidden + nheads = 72) is divisible
    # by GroupNorm's 8 groups, as in the real config (2*256+8 = 520)
    mc = tiny_model_config(masks=True, nheads=8, hidden_dim=128)
    from reftr_tpu.models.reftr_seg import RefTRSeg

    model = RefTRSeg(mc)
    batch = single_phrase_batch(rng, b=2, hw=64)
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch, rng


def test_seg_forward_shapes(seg_setup):
    model, params, batch, _ = seg_setup
    out = jax.jit(lambda p, b: model.apply(p, b))(params, batch)
    assert out["pred_boxes"].shape == (2, 1, 1, 4)
    # mask logits at 1/4 canvas resolution (C1 level)
    assert out["pred_masks"].shape == (2, 1, 16, 16)
    assert out["mask_att"].shape[0] == 2
    assert "aux_outputs" not in out  # no aux for seg (reference :133)
    assert np.isfinite(np.asarray(out["pred_masks"])).all()


def test_seg_losses_and_grad(seg_setup):
    model, params, batch, rng = seg_setup
    lc = LossConfig()
    targets = {
        "boxes": np.array([[[0.5, 0.5, 0.3, 0.4]], [[0.3, 0.6, 0.2, 0.2]]],
                          np.float32),
        "box_valid": np.ones((2, 1), bool),
        "masks": (rng.uniform(size=(2, 64, 64)) > 0.7).astype(np.float32),
        "mask_valid": np.ones(2, bool),
    }
    out = model.apply(params, batch)
    losses = criterion(out, targets, lc, with_masks=True)
    assert {"loss_bbox", "loss_giou", "loss_mask", "loss_dice"} <= set(losses)
    wd = weight_dict(lc, dec_layers=2, aux_loss=False, with_masks=True)
    tl = float(total_loss(losses, wd))
    assert np.isfinite(tl) and tl > 0

    def loss_fn(p):
        o = model.apply(p, batch)
        return total_loss(criterion(o, targets, lc, with_masks=True), wd)

    g = jax.grad(loss_fn)(params)
    # mask head gets gradient
    gn = float(
        jnp.sqrt(sum(jnp.sum(x ** 2) for x in jax.tree_util.tree_leaves(
            g["params"]["mask_head"]))))
    assert np.isfinite(gn) and gn > 0


def test_cem_golden_parity(rng):
    """CEM energy block vs the reference implementation
    (reftr_segmentation.py:16-41) on converted weights + identical inputs."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_cem_src", "/root/reference/models/reftr_segmentation.py")
    if spec is None:
        pytest.skip("reference repo not available")
    # the module imports the full reference package; only the CEM class is
    # needed, so exec just its source segment via a tiny namespace
    src = open("/root/reference/models/reftr_segmentation.py").read()
    start = src.index("class CEM")
    end = src.index("class RefTRSeg")
    ns = {"torch": torch, "nn": torch.nn}
    exec(src[start:end], ns)  # noqa: S102 — trusted-read-only test oracle
    torch.manual_seed(11)
    d, b, nq, h, w = 64, 2, 3, 5, 7
    ref = ns["CEM"](d).eval()

    rec = rng.normal(size=(b, 1, nq, d)).astype(np.float32)
    res_nchw = rng.normal(size=(b, d // 16, h, w)).astype(np.float32)
    with torch.no_grad():
        want = float(ref(torch.from_numpy(rec), torch.from_numpy(res_nchw)))

    from reftr_tpu.nn.convert import linear
    from reftr_tpu.nn.seg_heads import CEM

    sd = {k: v for k, v in ref.state_dict().items()}
    params = {"params": {f"c{i}": linear(sd, f"c{i}") for i in (1, 2, 3)}}
    # torch views res as [B, c//16, hw] then transposes -> [B, hw, c//16];
    # ours takes NHWC [B, h, w, c//16], flattened row-major to the same
    res_nhwc = res_nchw.transpose(0, 2, 3, 1)
    got = float(CEM(d).apply(params, rec, res_nhwc))
    assert got == pytest.approx(want, rel=1e-5)


def test_cem_ablation(seg_setup):
    _, _, batch, _ = seg_setup
    mc = tiny_model_config(masks=True, nheads=8, hidden_dim=128, ablation="cem_loss")
    from reftr_tpu.models.reftr_seg import RefTRSeg

    model = RefTRSeg(mc)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert "cem_loss" in out
    assert np.isfinite(float(out["cem_loss"]))


def test_build_model_dispatch_seg():
    from reftr_tpu.core.config import RefTRConfig
    from reftr_tpu.models import build_model
    from reftr_tpu.models.reftr_seg import RefTRSeg

    cfg = RefTRConfig(model=tiny_model_config(masks=True, nheads=8, hidden_dim=128))
    model, wd = build_model(cfg)
    assert isinstance(model, RefTRSeg)
    assert "loss_dice" in wd and "loss_mask" in wd

    cfg.model.reftr_type = "bert_something"
    with pytest.raises(NotImplementedError):
        build_model(cfg)
