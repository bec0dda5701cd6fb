"""From-scratch training recipe guard (VERDICT r4 #2).

The regime that produced the round-3 donation race, the round-4
language-only-basin collapse, AND the round-5 FrozenBN fp32 overflow
(PERFORMANCE.md "From-scratch NaN root cause") is: random init, frozen or
barely-normalized backbone, bf16, the flagship layer stack. The reference
never trains from scratch (ImageNet ResNet + HF BERT inits are
load-bearing, backbone.py:119-121 / reftr_transformer.py:315-318), so
nothing upstream guards it. This test trains a reduced flagship with the
round-5 recipe (--backbone_norm group --train_stem --pre_norm) past the
language-only basin and asserts the three health signals:

  1. box accuracy (the capability: localization is learned),
  2. the encoder output carries IMAGE signal — pairwise distance between
     different images relative to within-image std (the probe_vision2
     metric that diagnosed the basin: 0.001 collapsed vs ~0.1 healthy),
  3. backbone activations stay bounded (the overflow regression guard:
     the broken FrozenBN regime measured 3e14 at the same point).
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reftr_tpu.core.config import (
    BertConfig,
    DataConfig,
    MeshConfig,
    ModelConfig,
    RefTRConfig,
    TrainConfig,
)


def _recipe(out_dir: str, epochs: int) -> RefTRConfig:
    # reduced flagship: 6+6 -> 3+3 layers, d=128, 64px; everything else is
    # the from-scratch recipe of exps/run_gn_flagship.sh
    return RefTRConfig(
        model=ModelConfig(
            enc_layers=3, dec_layers=3, hidden_dim=128, dim_feedforward=256,
            nheads=8, bert=BertConfig.tiny(), aux_loss=True, dtype="float32",
            backbone_norm="group", train_stem=True, normalize_before=True,
            space_to_depth_stem=True),
        data=DataConfig(
            dataset="synthetic", train_split="train", test_splits=("val",),
            img_size=64, max_img_size=64, max_query_len=12, batch_size=16,
            num_workers=2, synthetic_n=128, synthetic_box_frac=(0.25, 0.5)),
        mesh=MeshConfig(data=-1, model=1),
        train=TrainConfig(
            lr=3e-3, lr_backbone=3e-3, epochs=epochs, warm_up_epoch=2,
            clip_max_norm=1.0, lr_schedule="CosineWarmupLR",
            output_dir=out_dir, seed=0, donate_state=False),
    )


@pytest.mark.slow
def test_from_scratch_recipe_escapes_language_basin():
    from reftr_tpu.core import checkpoint as ckpt_lib
    from reftr_tpu.models import build_model
    from reftr_tpu.train.loop import build_loaders, build_tokenizer, \
        run_training

    out = tempfile.mkdtemp()
    # NB: 20 epochs is part of the calibration — the cosine schedule's
    # length shapes the trajectory, and a shorter budget (16) decays the
    # LR before the basin escape (measured: best 0.17, loss stuck 4.33)
    cfg = _recipe(out, epochs=20)
    result = run_training(cfg)

    losses = [h["train_loss"] for h in result["history"]]
    assert np.isfinite(losses).all(), losses
    # calibrated on this exact config (round 5): the language-only basin
    # plateaus at acc 0.10-0.22 / train_loss >= 4.6; the healthy recipe
    # breaks out around epoch 12 (loss 4.7 -> 3.0, acc 0.36 by 20)
    assert result["best_val_acc"] >= 0.3, result["best_val_acc"]
    assert losses[-1] < 3.8, losses

    # probe the best checkpoint for image signal + bounded activations
    model, _ = build_model(cfg)
    tokenizer = build_tokenizer(cfg)
    _, test_loaders = build_loaders(cfg, tokenizer, 1, 0)
    batch, _t = next(iter(test_loaders["val"]))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)["params"]
    payload, _ = ckpt_lib.restore_checkpoint(
        out, "checkpoint_best", {"params": params})
    params = payload["params"]

    @jax.jit
    def probe(p, b):
        out, inter = model.apply(
            {"params": p}, b, deterministic=True,
            capture_intermediates=lambda mdl, name: mdl.name in (
                "encoder", "img_backbone"))
        enc = inter["intermediates"]["vl_transformer"]["encoder"][
            "__call__"][0]  # [B, S, D]
        feat = inter["intermediates"]["img_backbone"]["__call__"][0][-1]
        flat = enc.reshape(enc.shape[0], -1).astype(jnp.float32)
        d01 = jnp.mean(jnp.abs(flat[0] - flat[1]))
        d23 = jnp.mean(jnp.abs(flat[2] - flat[3]))
        within = jnp.std(flat, axis=1).mean()
        return ((d01 + d23) / (2 * within + 1e-9),
                jnp.abs(feat.astype(jnp.float32)).max())

    relpairdist, feat_absmax = (float(x) for x in probe(params, batch))
    # collapsed basin measured 0.001; healthy inits ~0.1 (probe_vision2)
    assert relpairdist > 0.02, relpairdist
    # broken FrozenBN regime measured 3.3e14 here; GroupNorm bounds it
    assert feat_absmax < 1e4, feat_absmax
