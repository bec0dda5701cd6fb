"""Typed configuration for reftr_tpu.

Replaces the reference's flat argparse namespace (~70 flags in
/root/reference/main_vg.py:26-164) with serializable dataclasses. Every knob
the reference exposes and actually consumes has an equivalent here; the
Deformable-DETR leftovers that are parsed but never used
(`--with_box_refine`, `--two_stage`, `--dec_n_points`, `--enc_n_points`)
are intentionally dropped.

Configs are plain dataclasses so they can be embedded into checkpoints
(as dicts) exactly like the reference pickles `args` into checkpoint.pth
(main_vg.py:383).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple


@dataclass
class BertConfig:
    """Architecture of the language backbone (HF bert-base-uncased layout).

    The reference uses HF BertModel/RobertaModel
    (/root/reference/models/reftr_transformer.py:315-318); we implement the
    encoder natively in JAX and load converted HF weights.
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    is_roberta: bool = False  # roberta: pad_token_id=1, offset position ids

    @classmethod
    def roberta_base(cls) -> "BertConfig":
        """roberta-base: larger BPE vocab, pad id 1, offset position table,
        layer_norm_eps 1e-5."""
        return cls(
            vocab_size=50265,
            max_position_embeddings=514,
            pad_token_id=1,
            layer_norm_eps=1e-5,
            is_roberta=True,
        )

    @classmethod
    def tiny(cls) -> "BertConfig":
        """A small config for unit tests."""
        return cls(
            vocab_size=512,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
            max_position_embeddings=128,
        )


@dataclass
class ModelConfig:
    """RefTR model architecture (reference flags: main_vg.py:56-115)."""

    reftr_type: str = "transformer_single_phrase"
    backbone: str = "resnet50"  # resnet50 | resnet101
    dilation: bool = False  # DC5: dilate last stage instead of striding
    position_embedding: str = "sine"  # sine | learned
    num_feature_levels: int = 1
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    hidden_dim: int = 256
    dropout: float = 0.1
    nheads: int = 8
    normalize_before: bool = False
    activation: str = "relu"
    masks: bool = False  # add RES segmentation head
    freeze_reftr: bool = False
    freeze_bert: bool = False
    freeze_backbone: bool = False
    # prune the backward graph at frozen boundaries with stop_gradient,
    # mirroring torch requires_grad=False autograd pruning (stem+layer1
    # always; full backbone / BERT / RefTR trunk when frozen). Also keeps
    # frozen params out of the global clip norm, like torch's clip which
    # skips grad=None params. Off switch for A/B measurement only.
    stop_grad_frozen: bool = True
    # FROM-SCRATCH deviation: train stem+layer1 (at lr_backbone) instead of
    # the reference's unconditional freeze (backbone.py:85-89). The
    # reference freezes them because they are ImageNet-pretrained; when no
    # pretrained init exists, freezing RANDOM features starves the VL
    # encoder of image signal and training collapses into the
    # language-only basin (PERFORMANCE.md "Flagship-geometry training").
    train_stem: bool = False
    # FROM-SCRATCH deviation #2: backbone normalization. "frozen" =
    # reference parity (FrozenBatchNorm, backbone.py:43-80 — running stats
    # fixed at their ImageNet values). "group" = live GroupNorm(32)
    # (fp32 statistics, trainable affine): REQUIRED for from-scratch
    # training. FrozenBN at init (var=1) normalizes nothing, so the
    # residual stream compounds multiplicatively through the 16 bottleneck
    # blocks — measured on the chip: layer4 output absmax 5.9e19 at epoch
    # 9 of a from-scratch 640px run, whose square (the next GroupNorm's
    # variance) overflows even fp32 -> inf -> NaN loss (PERFORMANCE.md
    # "From-scratch NaN root cause", round 5). GroupNorm is the
    # TPU-idiomatic choice: batch-size independent, no cross-replica
    # statistics sync. Incompatible with fold_bn/quantize_int8 (nothing
    # frozen to fold).
    backbone_norm: str = "frozen"  # frozen | group
    # FROM-SCRATCH deviation #3: dense vision-grounding auxiliary loss.
    # Adds a linear probe on the VL encoder's IMAGE tokens predicting
    # "is this cell inside the target box" (BCE vs the box-rasterized
    # grid, criterion.py::loss_vision). Breaks the language-only basin:
    # the probe is only satisfiable from image content, so the encoder
    # output cannot learn to suppress the visual stream (the round-4/5
    # failure mode, PERFORMANCE.md "Flagship-geometry training" — the
    # plateaued model's encoder output carried 0.001x image signal).
    # Standard grounding-heatmap supervision; REC path only (the RES
    # path's mask loss already supervises vision densely). The reference
    # has no equivalent because its ImageNet backbone init makes the
    # visual stream informative from step 0.
    vision_aux: bool = False
    # FROM-SCRATCH deviation #4: add the sine position embedding INTO the
    # projected image features at encoder input (the ViT/BERT convention;
    # language tokens already carry position in their embeddings). The
    # reference keeps the DETR convention — position only in attention
    # q/k, never in the value/residual stream (transformer.py pos-in-qk)
    # — which means cross-attention VALUES carry no direct position
    # signal: the decoder's box readout then depends on the encoder
    # *learning* to inject position into content, a slow path from
    # scratch (diagnosed round 5: with vision_aux the encoder output
    # carries near-perfect in-box information — probe BCE 0.03 — while
    # box regression stays at the phrase-conditional mean; the aggregated
    # in-box tokens of a uniform-color rectangle say "red" but not
    # where). Pretrained backbones sidestep this via padding-induced
    # absolute-position content in CNN features.
    img_pos_in_stream: bool = False
    # FROM-SCRATCH deviation #5: decoder cross-attention VALUES carry the
    # memory position embedding (q/k-only by default, the reference's
    # DETR convention). The surgical version of the positional-readout
    # fix: once cross-attention concentrates on the referred region, the
    # aggregated sum(w_i * (v_i + p_i)) carries the region's center AND
    # extent (a mean of sines over an interval encodes both), which
    # bbox_embed can decode directly. Unlike img_pos_in_stream this
    # leaves encoder dynamics untouched (measured: full-scale pos in the
    # encoder stream drowns content learning — the vision_aux probe
    # stays at the trivial baseline, exps/run_gn_flagship4.txt).
    decoder_pos_in_value: bool = False
    # FROM-SCRATCH deviation #6: decode the FINAL box from the vision_aux
    # heatmap (CenterNet-style soft-argmax: center = sigmoid-normalized
    # centroid, extent = sqrt(12)*std — exact for a filled axis-aligned
    # rectangle) instead of the decoder query. Round-5 measurement: with
    # vision_aux the heatmap is near-perfect (BCE 0.006) while the query
    # path stays at the phrase-conditional mean through 3 attempts
    # (plateau-locked attention; PERFORMANCE.md campaign table) — the
    # solved representation just needs a spatial decode head. The decoder
    # keeps training through the aux losses (all layers incl. the last).
    # Requires vision_aux; single-phrase REC only.
    heatmap_box: bool = False
    bert_model: str = "bert-base-uncased"
    bert: BertConfig = field(default_factory=BertConfig)
    max_lang_seq: int = 128
    num_queries_per_phrase: int = 1
    aux_loss: bool = False
    no_decoder: bool = False
    ablation: str = "none"  # 'cem_loss' enables the CEM energy head
    # --- TPU-specific knobs (no reference equivalent) ---
    dtype: str = "float32"  # compute dtype: float32 | bfloat16
    # None = auto: Pallas fused attention on TPU for sequences >= 1024
    # (multi-level configs), XLA otherwise; True/False force it
    use_pallas_attention: Optional[bool] = None
    remat: bool = False  # jax.checkpoint the encoder/backbone for memory
    # MXU-friendly stem: 2x2 space-to-depth + 4x4/s1 conv (exact fold of the
    # 7x7/s2 stem, nn/fold.py); torch checkpoints fold at load
    space_to_depth_stem: bool = False
    # fold FrozenBN scales into conv kernels at load (bias-only BN)
    fold_bn: bool = False
    # fold /255 + ImageNet normalize into the stem conv weights: the model
    # consumes raw uint8 canvases with no separate normalize pass (uint8
    # inputs only; requires fold_bn — nn/fold.py)
    fold_normalize: bool = False
    # zero-pad bottleneck inner widths below this to it (exact
    # reparameterization; fills MXU lanes at layer1's width-64 convs)
    backbone_pad_width: int = 0
    # jax.checkpoint each backbone bottleneck (recompute inner activations
    # in backward instead of round-tripping them through HBM); _stages
    # remats only the listed stages (1..4)
    backbone_remat: bool = False
    backbone_remat_stages: Tuple[int, ...] = ()
    # run layer1 on the 2x2 space-to-depth grid (exact reparameterization,
    # nn/fold.py::fold_layer1_to_block) — fills MXU lanes at the
    # spatial-heaviest stage; see PERFORMANCE.md round 3
    block_layer1: bool = False
    # int8 post-training quantization of the backbone's bottleneck convs
    # (serving/eval only — the MXU's int8 path runs at 2x the bf16 peak;
    # nn/quant.py). Requires fold_bn. quant_calibrate is the internal
    # calibration-pass twin (records per-conv input absmax via
    # mutable=['calib']); never set it from the CLI.
    quantize_int8: bool = False
    quant_calibrate: bool = False
    # TRAINING-time int8 for the frozen stem+layer1 prefix: layer1's
    # bottleneck convs run the int8 MXU path with f32-stored (grad-safe)
    # kernels, calibrated on the first train batches (nn/quant.py::
    # calibrate_train_prefix). Legal because the reference NEVER trains
    # stem+layer1 (backbone.py:85-89) and they sit under stop_gradient.
    # Requires fold_bn; incompatible with train_stem (nothing frozen then)
    # and with quantize_int8 (the serving PTQ path expects fp layer1).
    quantize_train_prefix: bool = False
    # which components run int8: any subset of {"backbone", "bert", "vl"}
    # ("vl" = the VL encoder/decoder projections+FFNs). Full scope is the
    # measured-fastest (1082 img/s vs 1067 backbone-only, PERFORMANCE.md
    # round 3); accuracy is gated per-scope by tests/test_quantize.py.
    quantize_scope: Tuple[str, ...] = ("backbone", "bert", "vl")

    @property
    def use_decoder(self) -> bool:
        return self.dec_layers > 0 and not self.no_decoder

    @property
    def cem_loss(self) -> bool:
        return self.ablation == "cem_loss"


@dataclass
class LossConfig:
    """Loss coefficients (main_vg.py:119-134)."""

    bbox_loss_coef: float = 1.0
    giou_loss_coef: float = 1.0
    mask_loss_coef: float = 1.0
    dice_loss_coef: float = 1.0
    cem_loss_coef: float = 1.0
    vision_aux_coef: float = 1.0  # weight of the in-box probe BCE
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    # Hungarian/one-to-all matcher costs (capability parity; the live
    # criterion is matcher-free since num_queries_per_phrase == 1).
    set_cost_class: float = 1.0
    set_cost_bbox: float = 5.0
    set_cost_giou: float = 2.0


@dataclass
class DataConfig:
    """Dataset & batching (main_vg.py:137-147; datasets/__init__.py:17-132).

    Static shapes replace the reference's per-batch padding: images land on a
    fixed `img_size`x`img_size` canvas with a validity mask, sentences pad to
    `max_query_len` (single-phrase) or `max_sentence_len` (multi-phrase),
    phrases pad to `max_num_phrases`.
    """

    dataset: str = "refcoco_unc"
    train_split: str = "train"
    test_splits: Tuple[str, ...] = ("val",)
    data_root: str = "./data"
    img_size: int = 640
    max_img_size: int = 640
    # tokenization (resc_refer_dataset.py:158-166; refer_multiphrase.py:9)
    max_query_len: int = 40
    max_sentence_len: int = 90
    max_num_phrases: int = 16
    phrase_seq_len: int = 22
    multi_phrase: bool = False
    batch_size: int = 8
    num_workers: int = 2
    cache_mode: bool = False
    # color jitter strength of RandomIntensitySaturation (transforms.py:266-285)
    hsv_jitter: float = 0.5
    # synthetic-fixture box side range as a fraction of img_size; the
    # calibrated learning recipe uses (0.25, 0.5) so IoU@0.5 tests
    # localization rather than sub-stride precision (tests/test_learning.py)
    synthetic_box_frac: Tuple[float, float] = (1 / 6, 1 / 3)
    # synthetic-fixture TRAIN set size (val is fixed at 64). Items are
    # generated lazily per index, so large n (a from-scratch pretraining
    # stream) costs no host RAM.
    synthetic_n: int = 256


@dataclass
class MeshConfig:
    """Device mesh. The reference only has data parallelism (DDP,
    main_vg.py:290-296); we expose a (data, model) mesh where `model`>1
    shards attention heads / FFN over tensor-parallel ranks."""

    data: int = -1  # -1: all devices on the data axis
    model: int = 1
    # lay the mesh out model-major so the model axis crosses process
    # boundaries (cross-host TP); input loading follows the mesh via
    # parallel.sharding.loader_shards
    model_spans_processes: bool = False


@dataclass
class TrainConfig:
    """Optimization & schedule (main_vg.py:28-55, 234-287)."""

    lr: float = 1e-4
    lr_backbone: float = 1e-5
    lr_bert: float = 1e-5
    lr_mask_branch_proj: float = 1.0  # multiplier on base lr
    # param-name keywords selecting each LR group (main_vg.py:223-262;
    # reference defaults img_backbone.0 / lang_backbone / bbox_attention+
    # mask_head, expressed in this framework's param paths)
    lr_backbone_names: Tuple[str, ...] = ("img_backbone",)
    lr_bert_names: Tuple[str, ...] = ("lang_backbone",)
    lr_mask_branch_names: Tuple[str, ...] = ("bbox_attention", "mask_head")
    sgd: bool = False
    momentum: float = 0.9
    weight_decay: float = 1e-4
    clip_max_norm: float = 0.1
    epochs: int = 60
    lr_drop: int = 40
    lr_drop_epochs: Optional[Tuple[int, ...]] = None
    warm_up_epoch: int = 2
    lr_decay: float = 0.1
    lr_schedule: str = "StepLR"  # StepLR | MultiStepWarmupLR | CosineWarmupLR
    seed: int = 42
    start_epoch: int = 0
    run_epoch: int = 500  # bounded-run chunking for time-limited queues
    ckpt_cycle: int = 20
    output_dir: str = ""
    resume: str = ""
    auto_resume: bool = False
    resume_model_only: bool = False
    pretrained_model: Optional[str] = None
    eval_only: bool = False
    # loss/metric accumulation dtype stays float32 regardless of compute dtype
    donate_state: bool = True
    profile_dir: str = ""  # jax.profiler trace of a few early steps
    visualize: bool = False  # dump qualitative JPEGs during --eval
    # eval batches used to calibrate int8 input scales (quantize_int8)
    quant_calib_batches: int = 4


@dataclass
class RefTRConfig:
    """Top-level bundle."""

    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    # ------------------------------------------------------------------
    # (de)serialization — round-trips through JSON for checkpoint embedding
    # ------------------------------------------------------------------
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict) -> "RefTRConfig":
        sections = {
            "model": ModelConfig,
            "loss": LossConfig,
            "data": DataConfig,
            "mesh": MeshConfig,
            "train": TrainConfig,
        }
        kwargs: dict[str, Any] = {}
        for name, tp in sections.items():
            if name not in d:
                continue
            val = dict(d[name])
            if name == "model" and isinstance(val.get("bert"), dict):
                val["bert"] = BertConfig(**val["bert"])
            # tuple fields arrive as lists from JSON
            known = {f.name for f in dataclasses.fields(tp)}
            fixed = {
                k: tuple(v) if isinstance(v, list) else v
                for k, v in val.items()
                if k in known
            }
            kwargs[name] = tp(**fixed)
        return cls(**kwargs)

    @classmethod
    def from_json(cls, s: str) -> "RefTRConfig":
        return cls.from_dict(json.loads(s))
