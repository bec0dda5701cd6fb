"""Backward-graph pruning at frozen boundaries.

The reference freezes stem+layer1 always (backbone.py:85-89), BERT under
--freeze_bert (main_vg.py:33), and the whole RefTR trunk under freeze_reftr
(reftr_segmentation.py:52-54) via requires_grad=False — torch then SKIPS
those backward subgraphs entirely and its clip_grad_norm_ never sees the
frozen params. These tests pin the JAX equivalents: stop_gradient pruning
(exact-zero grads for frozen subtrees), unchanged trainable grads, and the
optimizer's frozen-aware clip.
"""

import jax
import jax.numpy as jnp
import numpy as np

from reftr_tpu.core.config import LossConfig, ModelConfig, TrainConfig
from reftr_tpu.models.reftr import RefTR
from reftr_tpu.models.reftr_seg import RefTRSeg
from reftr_tpu.train.optimizer import build_optimizer, label_fn

from tests.test_model_forward import single_phrase_batch, tiny_model_config


def _randomize_bbox_head(params, seed=7):
    """The reference zero-inits the bbox head's last layer; randomize it so
    gradients actually flow through the trunk."""
    rng = np.random.default_rng(seed)
    k = params["bbox_embed"]["layers_2"]["kernel"]
    params["bbox_embed"]["layers_2"]["kernel"] = jnp.asarray(
        rng.normal(scale=0.1, size=k.shape).astype(np.float32))
    return params


def _tree_absmax(tree) -> float:
    leaves = jax.tree_util.tree_leaves(tree)
    assert leaves
    return max(float(jnp.max(jnp.abs(l))) for l in leaves)


def _grads(model, params, batch):
    def loss(p):
        out = model.apply({"params": p}, batch, deterministic=True)
        l = jnp.sum(out["pred_boxes"].astype(jnp.float32))
        if "pred_masks" in out:
            l = l + jnp.sum(jnp.tanh(out["pred_masks"].astype(jnp.float32)))
        if "cem_loss" in out:
            l = l + out["cem_loss"].astype(jnp.float32)
        return l

    return jax.grad(loss)(params)


def test_stem_layer1_grads_are_exact_zero():
    mc = tiny_model_config()
    model = RefTR(mc)
    rng = np.random.default_rng(0)
    batch = single_phrase_batch(rng)
    params = _randomize_bbox_head(
        model.init(jax.random.PRNGKey(0), batch)["params"])
    g = _grads(model, params, batch)
    bb = g["img_backbone"]
    for name, sub in bb.items():
        if name in ("conv1", "bn1") or name.startswith("layer1_"):
            assert _tree_absmax(sub) == 0.0, name
    # trainable stages still receive real gradients
    layer2 = {k: v for k, v in bb.items() if k.startswith("layer2_")}
    assert _tree_absmax(layer2) > 0.0
    assert _tree_absmax(g["lang_backbone"]) > 0.0


def test_trainable_grads_unchanged_by_pruning():
    """stop_gradient only removes grads that were discarded anyway: the
    trainable leaves' gradients match the unpruned graph."""
    rng = np.random.default_rng(1)
    batch = single_phrase_batch(rng)
    g = {}
    for flag in (True, False):
        mc = tiny_model_config(stop_grad_frozen=flag)
        model = RefTR(mc)
        params = _randomize_bbox_head(
            model.init(jax.random.PRNGKey(0), batch)["params"])
        g[flag] = _grads(model, params, batch)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g[True]),
            jax.tree_util.tree_leaves_with_path(g[False])):
        parts = [str(getattr(k, "key", k)) for k in path]
        if "img_backbone" in parts:
            # Only the STEM's conv1/bn1 (direct child of img_backbone) and
            # layer1 are frozen — Bottleneck conv1/bn1 inside trainable
            # layer2-4 must still be compared (mirrors optimizer.label_fn).
            bb_idx = parts.index("img_backbone")
            child = parts[bb_idx + 1] if bb_idx + 1 < len(parts) else ""
            if child in ("conv1", "conv1_s2d", "bn1") or \
                    child.startswith("layer1_"):
                continue  # the pruned (frozen) subtree
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg="/".join(parts))


def test_train_stem_unfreezes_stem_and_layer1():
    """--train_stem (from-scratch deviation, core/config.py): stem+layer1
    receive real gradients and the optimizer labels them 'backbone'
    (trained at lr_backbone) instead of 'frozen'."""
    mc = tiny_model_config(train_stem=True)
    model = RefTR(mc)
    rng = np.random.default_rng(5)
    batch = single_phrase_batch(rng)
    params = _randomize_bbox_head(
        model.init(jax.random.PRNGKey(0), batch)["params"])
    g = _grads(model, params, batch)
    bb = g["img_backbone"]
    conv_leaves = {k: v for k, v in bb.items()
                   if k in ("conv1",) or k.startswith("layer1_")}
    assert _tree_absmax(conv_leaves) > 0.0

    labels = label_fn(mc, TrainConfig())(params)
    lb = labels["img_backbone"]
    assert lb["conv1"]["kernel"] == "backbone"
    flat = jax.tree_util.tree_leaves_with_path(
        {k: v for k, v in lb.items() if k.startswith("layer1_")})
    vals = {leaf for _, leaf in flat}
    # conv kernels train; FrozenBN scale/bias/mean/var stay buffers
    assert "backbone" in vals and vals <= {"backbone", "frozen"}


def test_freeze_bert_prunes_language_backward():
    mc = tiny_model_config(freeze_bert=True)
    model = RefTR(mc)
    rng = np.random.default_rng(2)
    batch = single_phrase_batch(rng)
    params = _randomize_bbox_head(
        model.init(jax.random.PRNGKey(0), batch)["params"])
    g = _grads(model, params, batch)
    assert _tree_absmax(g["lang_backbone"]) == 0.0
    # the MLP mapping on top of BERT stays trainable
    assert _tree_absmax(g["map_sentence"]) > 0.0


def test_freeze_backbone_prunes_all_stages():
    mc = tiny_model_config(freeze_backbone=True)
    model = RefTR(mc)
    rng = np.random.default_rng(3)
    batch = single_phrase_batch(rng)
    params = _randomize_bbox_head(
        model.init(jax.random.PRNGKey(0), batch)["params"])
    g = _grads(model, params, batch)
    assert _tree_absmax(g["img_backbone"]) == 0.0
    assert _tree_absmax(g["input_proj_0"]) > 0.0


def test_freeze_reftr_trains_only_mask_branch_and_cem():
    """freeze_reftr freezes the trunk BEFORE the mask branch and CEM are
    constructed (reftr_segmentation.py:52-63): only bbox_attention,
    mask_head, and cem_block receive gradients."""
    mc = tiny_model_config(masks=True, nheads=8, hidden_dim=128,
                           ablation="cem_loss", freeze_reftr=True,
                           aux_loss=False)
    model = RefTRSeg(mc)
    rng = np.random.default_rng(4)
    batch = single_phrase_batch(rng)
    params = _randomize_bbox_head(
        model.init(jax.random.PRNGKey(0), batch)["params"])
    g = _grads(model, params, batch)
    trainable = {"bbox_attention", "mask_head", "cem_block"}
    for name, sub in g.items():
        if name in trainable:
            assert _tree_absmax(sub) > 0.0, name
        else:
            assert _tree_absmax(sub) == 0.0, name


def test_cem_block_label_is_base_under_freeze_reftr():
    mc = ModelConfig(freeze_reftr=True, masks=True, ablation="cem_loss")
    tc = TrainConfig()
    fn = label_fn(mc, tc)
    tree = {
        "cem_block": {"c1": {"kernel": jnp.zeros((4, 1))}},
        "bbox_embed": {"layers_0": {"kernel": jnp.zeros((4, 4))}},
        "mask_head": {"lay1": {"kernel": jnp.zeros((4, 4))}},
    }
    labels = fn(tree)
    assert labels["cem_block"]["c1"]["kernel"] == "base"
    assert labels["bbox_embed"]["layers_0"]["kernel"] == "frozen"
    assert labels["mask_head"]["lay1"]["kernel"] == "mask_branch"


def test_clip_norm_excludes_frozen_grads():
    """torch's clip_grad_norm_ never sees frozen params (grad=None); the
    optax chain zeroes frozen grads before the global-norm clip so a huge
    frozen 'gradient' cannot dilute the trainable update."""
    mc = tiny_model_config()
    tc = TrainConfig(lr=1.0, clip_max_norm=1.0, weight_decay=0.0,
                     lr_schedule="StepLR", lr_drop=10**6)
    from reftr_tpu.train.schedules import build_schedule

    tx = build_optimizer(mc, tc, build_schedule(tc, steps_per_epoch=10))
    params = {
        "bbox_embed": {"layers_0": {"kernel": jnp.ones((2, 2))}},
        "img_backbone": {"conv1": {"kernel": jnp.ones((3, 3))}},
    }
    state = tx.init(params)
    grads = {
        # trainable grad with norm 2.0 -> clip scales by 1/2
        "bbox_embed": {"layers_0": {"kernel": jnp.full((2, 2), 1.0)}},
        # frozen grad 1e6: must NOT contribute to the norm
        "img_backbone": {"conv1": {"kernel": jnp.full((3, 3), 1e6)}},
    }
    updates, _ = tx.update(grads, state, params)
    upd = np.asarray(updates["bbox_embed"]["layers_0"]["kernel"])
    # adamw normalizes by |g| so direction: -lr * sign-ish; the clip factor
    # shows up in adam's internal stats only through the scaled grad. To
    # observe the clip directly, check the frozen update is zero and the
    # trainable update is finite and nonzero.
    assert np.all(np.asarray(updates["img_backbone"]["conv1"]["kernel"]) == 0)
    assert np.all(np.isfinite(upd)) and np.any(upd != 0)

    # SGD makes the clip factor directly observable: update = -lr * g_clipped
    tc2 = TrainConfig(lr=1.0, sgd=True, momentum=0.0, weight_decay=0.0,
                      clip_max_norm=1.0, lr_schedule="StepLR",
                      lr_drop=10**6)
    tx2 = build_optimizer(mc, tc2, build_schedule(tc2, steps_per_epoch=10))
    state2 = tx2.init(params)
    updates2, _ = tx2.update(grads, state2, params)
    got = np.asarray(updates2["bbox_embed"]["layers_0"]["kernel"])
    # norm over trainable-only grads = 2.0, clip to 1.0 -> g/2; lr=1
    np.testing.assert_allclose(got, -0.5 * np.ones((2, 2)), rtol=1e-6)
