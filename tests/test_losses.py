"""Golden tests for focal/dice losses vs in-test torch implementations of the
published formulas (RetinaNet focal, DICE)."""

import numpy as np
import torch
import torch.nn.functional as F

from reftr_tpu.ops import dice_loss, sigmoid_focal_loss


def torch_dice(inputs, targets, num_boxes):
    inputs = torch.sigmoid(torch.from_numpy(inputs)).flatten(1)
    targets = torch.from_numpy(targets).flatten(1)
    numerator = 2 * (inputs * targets).sum(1)
    denominator = inputs.sum(-1) + targets.sum(-1)
    loss = 1 - (numerator + 1) / (denominator + 1)
    return float(loss.sum() / num_boxes)


def torch_focal(inputs, targets, num_boxes, alpha=0.25, gamma=2.0):
    inputs = torch.from_numpy(inputs)
    targets = torch.from_numpy(targets)
    prob = inputs.sigmoid()
    ce = F.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return float(loss.mean(1).sum() / num_boxes)


def test_dice_vs_torch(rng):
    x = rng.normal(size=(4, 64)).astype(np.float32) * 3
    t = (rng.uniform(size=(4, 64)) > 0.5).astype(np.float32)
    got = float(dice_loss(x, t, 4.0))
    want = torch_dice(x, t, 4.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_vs_torch(rng):
    x = rng.normal(size=(4, 64)).astype(np.float32) * 4
    t = (rng.uniform(size=(4, 64)) > 0.5).astype(np.float32)
    got = float(sigmoid_focal_loss(x, t, 4.0))
    want = torch_focal(x, t, 4.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_extreme_logits_stable(rng):
    x = np.array([[60.0, -60.0, 0.0]], dtype=np.float32)
    t = np.array([[1.0, 0.0, 1.0]], dtype=np.float32)
    got = float(sigmoid_focal_loss(x, t, 1.0))
    want = torch_focal(x, t, 1.0)
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_weights_zero_out_padding(rng):
    x = rng.normal(size=(4, 64)).astype(np.float32)
    t = (rng.uniform(size=(4, 64)) > 0.5).astype(np.float32)
    w = np.array([1.0, 1.0, 0.0, 0.0], dtype=np.float32)
    got = float(dice_loss(x, t, 2.0, weights=w))
    want = torch_dice(x[:2], t[:2], 2.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    got_f = float(sigmoid_focal_loss(x, t, 2.0, weights=w))
    want_f = torch_focal(x[:2], t[:2], 2.0)
    np.testing.assert_allclose(got_f, want_f, rtol=1e-5)


def test_loss_vision_rasterization(rng):
    """loss_vision (the vision_aux in-box BCE): target grid and masking.

    Hand-checkable case: an 8x8 grid fully valid, one box covering the
    center quarter -> exactly the cells whose centers fall inside it are
    positive; padded cells and invalid phrases contribute nothing.
    """
    from reftr_tpu.models.criterion import loss_vision

    b, h, w = 2, 8, 8
    # image 0: box center (0.5, 0.5), size 0.5x0.5 -> cells 2..5 (centers
    # 0.3125..0.6875 in [0.25, 0.75]) in both axes. image 1: no valid box.
    boxes = np.zeros((b, 2, 4), np.float32)
    boxes[0, 0] = [0.5, 0.5, 0.5, 0.5]
    boxes[1, 0] = [0.5, 0.5, 1.0, 1.0]  # invalid -> must be ignored
    bval = np.array([[True, False], [False, False]])
    valid = np.ones((b, h, w), bool)

    # logits that exactly match the expected target -> tiny loss; flipped
    # -> large. Build the expected grid independently.
    cy, cx = (np.arange(8) + 0.5) / 8, (np.arange(8) + 0.5) / 8
    exp0 = ((np.abs(cy[:, None] - 0.5) <= 0.25)
            & (np.abs(cx[None, :] - 0.5) <= 0.25))
    assert exp0.sum() == 16  # sanity: 4x4 block
    logits = np.full((b, h, w), -20.0, np.float32)
    logits[0][exp0] = 20.0  # image 1: all negative (no box) — correct
    out = {"vision_logits": [logits], "vision_valid": [valid]}
    tgt = {"boxes": boxes, "box_valid": bval}
    assert float(loss_vision(out, tgt)["loss_vision"]) < 1e-6

    wrong = {"vision_logits": [-logits], "vision_valid": [valid]}
    assert float(loss_vision(wrong, tgt)["loss_vision"]) > 5.0

    # padded cells excluded: corrupt logits only outside the valid region
    pvalid = np.zeros((b, h, w), bool)
    pvalid[:, :4, :4] = True  # valid extent 4x4 -> centers /4 normalize
    exp_small = ((np.abs((np.arange(4) + 0.5) / 4 - 0.5)[:, None] <= 0.25)
                 & (np.abs((np.arange(4) + 0.5) / 4 - 0.5)[None, :] <= 0.25))
    lg = np.full((b, h, w), -20.0, np.float32)
    lg[0, :4, :4][exp_small] = 20.0
    lg[:, 4:, :] = 1e6  # garbage in padding must not leak
    out_p = {"vision_logits": [lg], "vision_valid": [pvalid]}
    assert float(loss_vision(out_p, tgt)["loss_vision"]) < 1e-6


def test_vision_aux_model_and_step(rng):
    """vision_aux end to end: the flag emits per-level logits, the loss
    lands in the weight dict, and one train step is finite with gradients
    reaching the backbone stem (the basin-breaking property)."""
    import jax
    import jax.numpy as jnp

    from reftr_tpu.core.config import BertConfig, LossConfig, ModelConfig
    from reftr_tpu.models.criterion import weight_dict
    from reftr_tpu.models.reftr import RefTR
    from reftr_tpu.train.optimizer import build_optimizer
    from reftr_tpu.train.schedules import build_schedule
    from reftr_tpu.train.state import TrainState
    from reftr_tpu.train.steps import make_train_step
    from reftr_tpu.core.config import TrainConfig

    mc = ModelConfig(enc_layers=1, dec_layers=1, hidden_dim=32,
                     dim_feedforward=32, nheads=4, bert=BertConfig.tiny(),
                     vision_aux=True, train_stem=True, backbone_norm="group",
                     dtype="float32")
    lc = LossConfig(vision_aux_coef=2.0)
    model = RefTR(mc)
    b, s_img, s_txt = 2, 64, 8
    batch = {
        "image": rng.integers(0, 255, (b, s_img, s_img, 3)).astype(np.uint8),
        "image_valid": np.ones((b, s_img, s_img), bool),
        "sentence": rng.integers(0, 30, (b, s_txt)).astype(np.int32),
        "sentence_valid": np.ones((b, s_txt), bool),
    }
    targets = {"boxes": np.array([[[0.5, 0.5, 0.4, 0.4]]] * b, np.float32),
               "box_valid": np.ones((b, 1), bool)}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    assert "vision_probe" in params
    out = model.apply({"params": params}, batch, deterministic=True)
    (lg,) = out["vision_logits"]
    assert lg.shape == (b, s_img // 32, s_img // 32)

    wd = weight_dict(lc, mc.dec_layers, mc.aux_loss, vision_aux=True)
    assert wd["loss_vision"] == 2.0
    tc = TrainConfig(lr=1e-3, epochs=1)
    tx = build_optimizer(mc, tc, build_schedule(tc, 1))
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    before = jax.device_get(state.params["img_backbone"])  # pre-donation
    step = make_train_step(model, wd, lc, world_size=1)
    state2, m = step(state, batch, targets)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["loss_vision"]))
    # the probe's gradient must reach the stem (basin-breaking path)
    after = jax.device_get(state2.params["img_backbone"])
    delta = jax.tree_util.tree_reduce(
        lambda a, x: a + float(np.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b2: a - b2, before, after), 0.0)
    assert delta > 0.0


def test_heatmap_box_decode_exact_rectangle(rng):
    """_heatmap_box recovers a filled axis-aligned rectangle exactly
    (up to grid discretization): center = centroid, extent = sqrt(12)*std.
    Uses crisp logits (+/-20) over a 32x32 grid with a box spanning cells
    [8,24) x [4,20) -> cxcywh (0.5, 0.375, 0.5, 0.5)."""
    import jax.numpy as jnp

    from reftr_tpu.core.config import ModelConfig
    from reftr_tpu.models.reftr import RefTR

    h = w = 32
    logits = np.full((1, h, w), -20.0, np.float32)
    logits[0, 4:20, 8:24] = 20.0  # rows 4..19, cols 8..23
    valid = np.ones((1, h, w), bool)
    model = RefTR(ModelConfig(vision_aux=True, heatmap_box=True))
    box = np.asarray(model._heatmap_box(jnp.asarray(logits),
                                        jnp.asarray(valid)))[0]
    np.testing.assert_allclose(box, [0.5, 0.375, 0.5, 0.5], atol=5e-3)

    # padded region must not contribute: same box inside a 16x16 valid
    # extent (cells [4,12)x[2,10) of the 16-wide valid region)
    lg2 = np.full((1, h, w), -20.0, np.float32)
    lg2[0, 2:10, 4:12] = 20.0
    lg2[0, 16:, 16:] = 20.0  # garbage in padding
    v2 = np.zeros((1, h, w), bool)
    v2[0, :16, :16] = True
    box2 = np.asarray(model._heatmap_box(jnp.asarray(lg2),
                                         jnp.asarray(v2)))[0]
    np.testing.assert_allclose(box2, [0.5, 0.375, 0.5, 0.5], atol=5e-3)
