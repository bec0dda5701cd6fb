"""Training stack tests: schedules vs the reference formulas, param
grouping, multi-device DP/TP training on the 8-device CPU mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reftr_tpu.core.config import (
    BertConfig,
    LossConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from reftr_tpu.models.criterion import weight_dict
from reftr_tpu.models.reftr import RefTR
from reftr_tpu.parallel.sharding import create_mesh, param_spec
from reftr_tpu.train.optimizer import build_optimizer, label_fn
from reftr_tpu.train.schedules import (
    build_schedule,
    cosine_warmup_lr,
    multistep_warmup_lr,
    step_lr,
)
from reftr_tpu.train.state import TrainState
from reftr_tpu.train.steps import make_train_step, shard_batch, shard_state

from tests.test_model_forward import single_phrase_batch, tiny_model_config


# --------------------------------------------------------------------------
# schedules: golden vs the reference's python lambdas (reimplemented per the
# published formulas in util/lr_scheduler.py semantics)
# --------------------------------------------------------------------------

def ref_multistep(steps, milestones, warm, decay=0.1, floor=0.01):
    if steps < warm:
        rate = (steps + 1) / warm
    else:
        rate = decay ** len([m for m in milestones if m <= steps])
    return floor if rate <= floor else rate


def ref_cosine(steps, max_t, warm, floor=0.01):
    if steps < warm:
        rate = (steps + 1) / warm
    else:
        rate = 0.5 * (math.cos((steps - warm) / (max_t - warm) * math.pi) + 1)
    return floor if rate <= floor else rate


def test_multistep_schedule():
    fn = multistep_warmup_lr([100, 200], 10)
    for s in [0, 5, 9, 10, 50, 100, 150, 200, 300]:
        got = float(fn(jnp.asarray(s, jnp.float32)))
        want = ref_multistep(s, [100, 200], 10)
        assert got == pytest.approx(want, rel=1e-6), s


def test_cosine_schedule():
    fn = cosine_warmup_lr(1000, 20)
    for s in [0, 19, 20, 100, 500, 990, 999]:
        got = float(fn(jnp.asarray(s, jnp.float32)))
        want = ref_cosine(s, 1000, 20)
        assert got == pytest.approx(want, rel=1e-5), s


def test_step_lr():
    fn = step_lr(100)
    assert float(fn(jnp.asarray(0.0))) == 1.0
    assert float(fn(jnp.asarray(99.0))) == 1.0
    assert float(fn(jnp.asarray(100.0))) == pytest.approx(0.1)
    assert float(fn(jnp.asarray(250.0))) == pytest.approx(0.01, rel=1e-5)


def test_build_schedule_dispatch():
    t = TrainConfig(lr_schedule="CosineWarmupLR", epochs=10, warm_up_epoch=1)
    fn = build_schedule(t, steps_per_epoch=50)
    assert float(fn(jnp.asarray(0.0))) == pytest.approx(1 / 50)


# --------------------------------------------------------------------------
# param grouping
# --------------------------------------------------------------------------

def test_param_groups():
    mc = tiny_model_config()
    model = RefTR(mc)
    rng = np.random.default_rng(0)
    batch = single_phrase_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    labels = label_fn(mc, TrainConfig())(params)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in kp): v
        for kp, v in jax.tree_util.tree_leaves_with_path(labels)
    }
    # BN stats and stem frozen
    assert flat["img_backbone/bn1/running_mean"] == "frozen"
    assert flat["img_backbone/conv1/kernel"] == "frozen"
    assert flat["img_backbone/layer1_0/conv1/kernel"] == "frozen"
    assert flat["img_backbone/layer1_0/bn1/weight"] == "frozen"
    # trainable backbone convs — INCLUDING each bottleneck's own conv1/bn-free
    # kernels (regression: the stem rule must not match block submodules)
    assert flat["img_backbone/layer3_0/conv2/kernel"] == "backbone"
    assert flat["img_backbone/layer2_0/conv1/kernel"] == "backbone"
    assert flat["img_backbone/layer4_2/conv1/kernel"] == "backbone"
    assert flat["img_backbone/layer2_0/downsample_bn/weight"] == "frozen"
    # bert
    assert flat["lang_backbone/pooler/kernel"] == "bert"
    # base
    assert flat["bbox_embed/layers_0/kernel"] == "base"
    assert flat["vl_transformer/encoder/layers_0/self_attn/q_proj/kernel"] == "base"


def test_freeze_bert_label():
    mc = tiny_model_config(freeze_bert=True)
    model = RefTR(mc)
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0), single_phrase_batch(rng))["params"]
    labels = label_fn(mc, TrainConfig())(params)
    bert_labels = set(jax.tree_util.tree_leaves(labels["lang_backbone"]))
    assert bert_labels == {"frozen"}


# --------------------------------------------------------------------------
# sharding rules
# --------------------------------------------------------------------------

def test_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert param_spec("vl/encoder/layers_0/ffn/linear1/kernel") == P(None, "model")
    assert param_spec("vl/encoder/layers_0/ffn/linear2/kernel") == P("model", None)
    assert param_spec("bert/layer_0/attention/q_proj/kernel") == P(None, "model")
    assert param_spec("bert/layer_0/attention/out_proj/kernel") == P("model", None)
    assert param_spec("bbox_embed/layers_0/kernel") == P()
    assert param_spec("x/linear1/kernel", tensor_parallel=False) == P()


def test_loader_shards_layouts():
    """Input-pipeline sharding follows the mesh (cross-host TP support):
    one loader shard per process in the classic DDP layout; one per
    model-parallel replica group otherwise."""
    from reftr_tpu.parallel.sharding import _loader_shards_from

    # classic: 2 procs x 2 devices, mesh (data=2, model=2), model within
    # a process -> DDP semantics
    classic = np.array([[0, 0], [1, 1]])
    assert _loader_shards_from(classic, 0) == (2, 0)
    assert _loader_shards_from(classic, 1) == (2, 1)
    # model axis spanning both processes -> every process loads everything
    crossed = np.array([[0, 1], [0, 1]])
    assert _loader_shards_from(crossed, 0) == (1, 0)
    assert _loader_shards_from(crossed, 1) == (1, 0)
    # mixed: model=4 over 2-device hosts -> one shard per process PAIR
    mixed = np.array([[0, 0, 1, 1], [2, 2, 3, 3]])
    for me, want in ((0, 0), (1, 0), (2, 1), (3, 1)):
        assert _loader_shards_from(mixed, me) == (2, want)
    # partial overlap has no consistent loader assignment
    bad = np.array([[0, 1], [1, 2]])
    with pytest.raises(ValueError):
        _loader_shards_from(bad, 0)


def test_model_spans_processes_mesh_layout():
    """create_mesh(model_spans_processes=True) lays devices model-major:
    on the single-process 8-CPU backend the device-id pattern must be the
    transpose of the natural layout."""
    mesh = create_mesh(MeshConfig(data=4, model=2,
                                  model_spans_processes=True))
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    assert ids.shape == (4, 2)
    # model-major: consecutive device ids run down the DATA axis
    np.testing.assert_array_equal(ids, np.arange(8).reshape(2, 4).T)
    # and the single-process grouping still yields one loader shard
    from reftr_tpu.parallel.sharding import loader_shards

    assert loader_shards(mesh) == (1, 0)


# --------------------------------------------------------------------------
# end-to-end: 8-device mesh training decreases the loss
# --------------------------------------------------------------------------

@pytest.mark.parametrize("mesh_cfg", [MeshConfig(data=8, model=1),
                                      MeshConfig(data=4, model=2)])
def test_train_loop_mesh(mesh_cfg):
    assert len(jax.devices()) == 8, "conftest must provide 8 cpu devices"
    mesh = create_mesh(mesh_cfg)
    mc = tiny_model_config()
    tc = TrainConfig(lr=1e-3, clip_max_norm=0.1)
    lc = LossConfig()
    model = RefTR(mc)
    rng = np.random.default_rng(3)
    batch = single_phrase_batch(rng, b=8)
    targets = {
        "boxes": rng.uniform(0.3, 0.6, size=(8, 1, 4)).astype(np.float32),
        "box_valid": np.ones((8, 1), bool),
    }

    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    from reftr_tpu.train.schedules import build_schedule

    tx = build_optimizer(mc, tc, build_schedule(tc, steps_per_epoch=100))
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))

    wd = weight_dict(lc, mc.dec_layers, mc.aux_loss)
    step = make_train_step(model, wd, lc, world_size=mesh.shape["data"])

    with mesh:
        state = shard_state(state, mesh)
        b = shard_batch(batch, mesh)
        t = shard_batch(targets, mesh)
        first = None
        for i in range(8):
            state, metrics = step(state, b, t)
            loss = float(metrics["loss"])
            if first is None:
                first = loss
        assert np.isfinite(loss)
        assert loss < first, (first, loss)
        assert int(state.step) == 8


@pytest.mark.parametrize("mesh_cfg", [MeshConfig(data=8, model=1),
                                      MeshConfig(data=4, model=2)])
def test_train_loop_mesh_pallas_kernel(mesh_cfg):
    """End-to-end training on the 8-CPU mesh with the Pallas attention
    kernel forced (interpret mode; dropout=0 — the in-kernel dropout needs
    the TPU PRNG). Exercises the shard_map'd kernel inside the full jitted
    train step: forward, flash backward, grads, optimizer."""
    mesh = create_mesh(mesh_cfg)
    mc = tiny_model_config(use_pallas_attention=True, dropout=0.0)
    tc = TrainConfig(lr=1e-3, clip_max_norm=0.1)
    lc = LossConfig()
    model = RefTR(mc)
    rng = np.random.default_rng(3)
    batch = single_phrase_batch(rng, b=8)
    targets = {
        "boxes": rng.uniform(0.3, 0.6, size=(8, 1, 4)).astype(np.float32),
        "box_valid": np.ones((8, 1), bool),
    }

    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    from reftr_tpu.train.schedules import build_schedule

    tx = build_optimizer(mc, tc, build_schedule(tc, steps_per_epoch=100))
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    wd = weight_dict(lc, mc.dec_layers, mc.aux_loss)
    step = make_train_step(model, wd, lc, world_size=mesh.shape["data"],
                           mesh=mesh)

    with mesh:
        state = shard_state(state, mesh)
        b = shard_batch(batch, mesh)
        t = shard_batch(targets, mesh)
        first = None
        for _ in range(4):
            state, metrics = step(state, b, t)
            loss = float(metrics["loss"])
            if first is None:
                first = loss
        assert np.isfinite(loss)
        assert loss < first, (first, loss)


def test_checkpoint_roundtrip_tp_mesh(tmp_path):
    """Save from a TP-sharded state, restore, re-shard: values identical."""
    import jax.numpy as jnp

    from reftr_tpu.core.checkpoint import restore_checkpoint, save_checkpoint

    mesh = create_mesh(MeshConfig(data=4, model=2))
    mc = tiny_model_config()
    tc = TrainConfig(lr=1e-3)
    model = RefTR(mc)
    rng = np.random.default_rng(3)
    batch = single_phrase_batch(rng, b=8)
    targets = {
        "boxes": rng.uniform(0.3, 0.6, size=(8, 1, 4)).astype(np.float32),
        "box_valid": np.ones((8, 1), bool),
    }
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    from reftr_tpu.train.schedules import build_schedule

    tx = build_optimizer(mc, tc, build_schedule(tc, steps_per_epoch=10))
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    lc = LossConfig()
    wd = weight_dict(lc, mc.dec_layers, mc.aux_loss)
    step = make_train_step(model, wd, lc, world_size=4, donate=False)
    with mesh:
        state = shard_state(state, mesh)
        state, _ = step(state, shard_batch(batch, mesh),
                        shard_batch(targets, mesh))
        save_checkpoint(str(tmp_path), "ckpt", jax.device_get(state.params),
                        jax.device_get(state.opt_state), int(state.step))
        payload, meta = restore_checkpoint(
            str(tmp_path), "ckpt",
            {"params": jax.device_get(state.params),
             "opt_state": jax.device_get(state.opt_state)})
        state2 = state.replace(params=payload["params"],
                               opt_state=payload["opt_state"])
        state2 = shard_state(state2, mesh)
        # continue training from the restored state — must match exactly
        s_a, m_a = step(state, shard_batch(batch, mesh),
                        shard_batch(targets, mesh))
        s_b, m_b = step(state2, shard_batch(batch, mesh),
                        shard_batch(targets, mesh))
        assert float(m_a["loss"]) == float(m_b["loss"])


def test_sgd_matches_torch_semantics():
    """--sgd: weight decay added to the gradient BEFORE momentum (torch
    SGD semantics, main_vg.py:263-268), verified step-by-step vs
    torch.optim.SGD on the same trajectory."""
    import torch

    from reftr_tpu.train.optimizer import build_optimizer
    from reftr_tpu.train.schedules import build_schedule

    mc = tiny_model_config()
    tc = TrainConfig(lr=0.1, sgd=True, momentum=0.9, weight_decay=1e-2,
                     clip_max_norm=0.0, lr_schedule="StepLR", lr_drop=10**6)
    # a 'base'-labeled leaf: bbox_embed
    p0 = np.linspace(-1.0, 1.0, 12).reshape(3, 4).astype(np.float32)
    params = {"bbox_embed": {"layers_0": {"kernel": jnp.asarray(p0)}}}
    tx = build_optimizer(mc, tc, build_schedule(tc, steps_per_epoch=10))
    state = tx.init(params)

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.SGD([tp], lr=0.1, momentum=0.9, weight_decay=1e-2)

    cur = params
    for step in range(5):
        g = {"bbox_embed": {"layers_0": {"kernel": cur["bbox_embed"][
            "layers_0"]["kernel"] * 0.5 + step * 0.01}}}
        updates, state = tx.update(g, state, cur)
        cur = jax.tree_util.tree_map(lambda p, u: p + u, cur, updates)

        topt.zero_grad()
        tp.grad = tp.detach() * 0.5 + step * 0.01
        topt.step()
        np.testing.assert_allclose(
            np.asarray(cur["bbox_embed"]["layers_0"]["kernel"]),
            tp.detach().numpy(), rtol=1e-5, atol=1e-6, err_msg=f"step {step}")


def test_lr_group_name_targeting():
    """--lr_backbone_names / --lr_bert_names / --lr_mask_branch_names
    retarget the LR groups by substring, like the reference's
    match_name_keywords grouping (main_vg.py:223-262); structural freezes
    (FrozenBN buffers, stem, layer1) still apply."""
    mc = tiny_model_config()
    model = RefTR(mc)
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0),
                        single_phrase_batch(rng))["params"]
    tc = TrainConfig(lr_bert_names=("bbox_embed",),       # retarget 'bert'
                     lr_backbone_names=("nonexistent",))  # backbone -> base
    labels = label_fn(mc, tc)(params)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in kp): v
        for kp, v in jax.tree_util.tree_leaves_with_path(labels)
    }
    assert flat["bbox_embed/layers_0/kernel"] == "bert"
    # backbone convs fall through to base when not name-matched...
    assert flat["img_backbone/layer3_0/conv2/kernel"] == "base"
    # ...but structural freezes still hold
    assert flat["img_backbone/bn1/running_mean"] == "frozen"
    assert flat["img_backbone/layer1_0/conv1/kernel"] == "frozen"
    assert flat["img_backbone/layer3_0/bn2/weight"] == "frozen"
    assert flat["lang_backbone/pooler/kernel"] == "base"


@pytest.mark.slow
def test_flagship_geometry_aot_compile_mesh():
    """AOT-lower and compile (no execution) the FULL train step at the
    flagship geometry — d=256, 8 heads, BERT-base, 640px — on the 8-CPU
    4x2 (data, model) mesh. Catches TP sharding-rule/shape mismatches
    (bias and GroupNorm divisibility, head splits) that the tiny
    dryrun_multichip shapes cannot (VERDICT r2 weak #3)."""
    from reftr_tpu.core.config import ModelConfig
    from reftr_tpu.models.criterion import weight_dict as build_wd
    from reftr_tpu.parallel.sharding import batch_sharding
    from reftr_tpu.train.steps import state_shardings

    mesh = create_mesh(MeshConfig(data=4, model=2))
    mc = ModelConfig(aux_loss=True)  # r50 + bert-base, d=256, 6+6
    model = RefTR(mc)
    b, hw, s = 8, 640, 40
    batch = {
        "image": jax.ShapeDtypeStruct((b, hw, hw, 3), jnp.uint8),
        "image_valid": jax.ShapeDtypeStruct((b, hw, hw), jnp.bool_),
        "sentence": jax.ShapeDtypeStruct((b, s), jnp.int32),
        "sentence_valid": jax.ShapeDtypeStruct((b, s), jnp.int32),
    }
    targets = {
        "boxes": jax.ShapeDtypeStruct((b, 1, 4), jnp.float32),
        "box_valid": jax.ShapeDtypeStruct((b, 1), jnp.bool_),
    }
    params_abs = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), batch)["params"]
    tc = TrainConfig(lr=1e-4)
    tx = build_optimizer(mc, tc, build_schedule(tc, steps_per_epoch=100))
    state_abs = jax.eval_shape(
        lambda p: TrainState.create(p, tx, jax.random.PRNGKey(1)),
        params_abs)
    sh = state_shardings(state_abs, mesh)
    state_in = jax.tree_util.tree_map(
        lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
        state_abs, sh)
    bs = batch_sharding(mesh)
    shard = lambda tree: jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=bs), tree)

    lc = LossConfig()
    wd = build_wd(lc, mc.dec_layers, mc.aux_loss)
    step = make_train_step(model, wd, lc, world_size=4, donate=False,
                           mesh=mesh)
    compiled = step.lower(state_in, shard(batch), shard(targets)).compile()

    # representative param shardings survive into the compiled outputs:
    # TP-ruled FFN kernel sharded over 'model', backbone conv replicated
    out_state_sh = compiled.output_shardings[0]
    from jax.sharding import PartitionSpec as P

    ffn = out_state_sh.params["vl_transformer"]["encoder"]["layers_0"][
        "ffn"]["linear1"]["kernel"]
    assert ffn.spec == P(None, "model"), ffn
    qproj = out_state_sh.params["vl_transformer"]["encoder"]["layers_0"][
        "self_attn"]["q_proj"]["kernel"]
    assert qproj.spec == P(None, "model"), qproj
    conv = out_state_sh.params["img_backbone"]["layer3_0"]["conv2"]["kernel"]
    assert conv.spec == P(), conv


def test_donation_guard_platforms():
    """State donation is auto-disabled on the axon tunnel backend.

    Measured (PERFORMANCE.md "Donation on the axon tunnel"): donated-buffer
    reclamation races the tunnel's advisory host fetches -> deterministic
    NaN loss with fully-finite state. Real backends keep donation."""
    from reftr_tpu.train import steps as steps_lib

    # the tunnel plugin appears in the platform SELECTION (its devices
    # self-report "tpu", so backend names cannot identify it)
    assert not steps_lib.donation_is_safe("axon,cpu")
    assert not steps_lib.donation_is_safe("axon")
    for platforms in ("cpu", "tpu", "gpu", "", "tpu,cpu"):
        assert steps_lib.donation_is_safe(platforms)
    # the live default reads jax_platforms (cpu-forced in tests -> safe)
    assert steps_lib.donation_is_safe()
