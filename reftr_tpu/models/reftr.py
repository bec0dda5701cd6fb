"""RefTR: single-stage multi-task visual grounding model (REC).

Rebuilds RefTR (/root/reference/models/reftr_transformer.py:69-304) as one
jittable Flax module over static-shape batches:

  image [B,H,W,3] -> ResNet (FrozenBN) -> 1x1 proj + GroupNorm(32) ->
  sentence [B,S]  -> BERT -> MLP map ->
  VL encoder over [lang; img] -> QueryEncoder -> decoder -> 3-layer MLP ->
  sigmoid cxcywh boxes per (phrase, query).

Two input modes, as in the reference:
  * multi-phrase (flickr30k): per-phrase BERT pooled features, per-phrase
    context masks from token spans [pos_l, pos_r) (:206-238). The reference's
    host-side Python loops building these masks (:224-230) are vectorized
    mask arithmetic here, inside the jitted step.
  * single-phrase: pooled sentence feature; context mask excludes [CLS] and
    the final [SEP] (:239-248).

Batch dict (all static shapes; validity masks True = real):
  image [B,H,W,3] f32 (ImageNet-normalized), image_valid [B,H,W] bool,
  sentence [B,S] i32, sentence_valid [B,S],
  multi-phrase adds: phrases [B,P,Sp] i32, phrase_valid [B,P,Sp],
  phrase_pos_l / phrase_pos_r [B,P] i32.

Outputs:
  pred_boxes [B,P,nq,4] sigmoid cxcywh, phrase_mask [B,P*nq] (True = valid
  query), aux_outputs (list of per-decoder-layer dicts when aux_loss).

Deviation from the reference: its num_feature_levels>1 path indexes
input_proj with mismatched channels (reftr_transformer.py:172-174 vs 99-117
— latent crash; every released config uses 1 level). Here multi-level uses
the standard deformable-DETR scheme: the last min(nfl,3) backbone stages
each get a matching 1x1 projection, then 3x3/stride-2 extras.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from reftr_tpu.core.config import ModelConfig
from reftr_tpu.nn.bert import BertModel
from reftr_tpu.nn.mlp import MLP, MLPMapping
from reftr_tpu.nn.query_encoder import QueryEncoder
from reftr_tpu.nn.resnet import ResNet, downsample_mask
from reftr_tpu.models.vl_transformer import VLTransformer
from reftr_tpu.ops.posenc import sine_position_embedding


class InputProj(nn.Module):
    """1x1 (or 3x3/stride-2) conv + GroupNorm(32), xavier/zeros init
    (reference reftr_transformer.py:99-125,133-135)."""

    hidden_dim: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.hidden_dim, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    kernel_init=nn.initializers.xavier_uniform(),
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype, name="conv")(x)
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                            name="norm")(x)


class RefTR(nn.Module):
    config: ModelConfig

    @property
    def return_interm_layers(self) -> bool:
        return self.config.masks or self.config.num_feature_levels > 1

    def setup(self):
        mc = self.config
        if not mc.use_decoder:
            # The reference's --no_decoder ablation is latently broken there
            # too: RefTR.forward calls query_encoder/decoder unconditionally
            # (reftr_transformer.py:262-276) while __init__ skips building
            # them when dec_layers == 0 (:89-96). Fail loudly instead.
            raise NotImplementedError(
                "no_decoder / dec_layers=0 is a vestigial ablation with no "
                "working forward pass in the reference; not supported")
        dtype = jnp.bfloat16 if mc.dtype == "bfloat16" else jnp.float32
        self._dtype = dtype
        # torch-parity backward pruning: stem+layer1 are ALWAYS frozen
        # (backbone.py:85-89 — requires_grad=False, so torch never runs
        # their backward); a fully frozen backbone prunes every stage.
        # train_stem (from-scratch deviation, see core/config.py) lifts
        # the stem+layer1 stop_gradient.
        if mc.stop_grad_frozen:
            stop_stages = ((1, 2, 3, 4)
                           if (mc.freeze_backbone or mc.freeze_reftr)
                           else () if mc.train_stem else (1,))
        else:
            stop_stages = ()
        self.img_backbone = ResNet(
            mc.backbone, self.return_interm_layers, mc.dilation, dtype=dtype,
            space_to_depth=mc.space_to_depth_stem, fold_bn=mc.fold_bn,
            min_inner_width=mc.backbone_pad_width,
            remat_blocks=mc.backbone_remat,
            remat_stages=tuple(mc.backbone_remat_stages),
            block_layer1=mc.block_layer1,
            quantize=mc.quantize_int8 and "backbone" in mc.quantize_scope,
            quantize_stages=(1,) if mc.quantize_train_prefix else (),
            sow_absmax=mc.quant_calibrate,
            stop_grad_stages=stop_stages,
            norm=mc.backbone_norm,
            name="img_backbone")
        self.lang_backbone = BertModel(
            mc.bert, dtype=dtype,
            quantize=mc.quantize_int8 and "bert" in mc.quantize_scope,
            sow_absmax=mc.quant_calibrate,
            name="lang_backbone")
        self.map_sentence = MLPMapping(mc.hidden_dim, mc.dropout, dtype=dtype,
                                       name="map_sentence")
        self.vl_transformer = VLTransformer(
            d_model=mc.hidden_dim, nhead=mc.nheads,
            num_encoder_layers=mc.enc_layers,
            num_decoder_layers=0 if mc.no_decoder else mc.dec_layers,
            dim_feedforward=mc.dim_feedforward, dropout=mc.dropout,
            activation=mc.activation, normalize_before=mc.normalize_before,
            num_feature_levels=mc.num_feature_levels,
            return_intermediate_dec=True, max_lang_seq=mc.max_lang_seq,
            dtype=dtype, use_pallas=mc.use_pallas_attention, remat=mc.remat,
            quantize=mc.quantize_int8 and "vl" in mc.quantize_scope,
            sow_absmax=mc.quant_calibrate,
            pos_in_value=mc.decoder_pos_in_value,
            name="vl_transformer")
        if self.vl_transformer.use_decoder:
            self.map_phrase = MLPMapping(mc.hidden_dim, mc.dropout,
                                         dtype=dtype, name="map_phrase")
            self.query_encoder = QueryEncoder(
                mc.num_queries_per_phrase, mc.hidden_dim, mc.dropout,
                dtype=dtype, name="query_encoder")
        self.bbox_embed = MLP(mc.hidden_dim, 4, 3, dtype=dtype,
                              final_zero_init=True, name="bbox_embed")
        if mc.vision_aux:
            # in-box probe on encoder image tokens (from-scratch aid,
            # core/config.py::vision_aux); fp32 logits like bbox_embed
            self.vision_probe = nn.Dense(
                1, kernel_init=nn.initializers.xavier_uniform(),
                name="vision_probe")
        from reftr_tpu.nn.posembed import ImagePositionEmbedding

        self.pos_embedding = ImagePositionEmbedding(
            mc.hidden_dim, mc.position_embedding, dtype=dtype,
            name="pos_embedding")

        # input projections
        nfl = mc.num_feature_levels
        projs = []
        if nfl == 1:
            projs.append(InputProj(mc.hidden_dim, dtype=dtype,
                                   name="input_proj_0"))
        else:
            n_base = min(nfl, 3)
            for i in range(n_base):
                projs.append(InputProj(mc.hidden_dim, dtype=dtype,
                                       name=f"input_proj_{i}"))
            for i in range(n_base, nfl):
                projs.append(InputProj(mc.hidden_dim, kernel=3, stride=2,
                                       dtype=dtype, name=f"input_proj_{i}"))
        self.input_proj = projs

    # ------------------------------------------------------------------
    def extract_image_features(self, image, image_valid):
        """Backbone + projections + per-level masks and sine positions.

        Returns (srcs, valids, poss, backbone_feats) — each a list per level,
        NHWC. backbone_feats are the raw stage outputs (for the mask head).
        """
        mc = self.config
        if image.dtype == jnp.uint8:
            if mc.fold_normalize:
                # /255 + mean/std folded into the stem weights (nn/fold.py)
                image = image.astype(self._dtype)
            else:
                from reftr_tpu.ops.image import normalize_images

                image = normalize_images(image, self._dtype)
        elif mc.fold_normalize:
            raise ValueError(
                "fold_normalize expects uint8 image inputs (the affine is "
                "in the stem weights; float inputs would be normalized "
                "twice)")
        feats = self.img_backbone(image)
        nfl = mc.num_feature_levels
        if nfl == 1:
            base_feats = [feats[-1]]
        else:
            base_feats = list(feats[-min(nfl, 3):])
        srcs = [self.input_proj[i](f) for i, f in enumerate(base_feats)]
        for i in range(len(base_feats), nfl):
            srcs.append(self.input_proj[i](srcs[-1]))

        valids, poss = [], []
        for src in srcs:
            v = downsample_mask(image_valid, src.shape[1:3])
            valids.append(v)
            poss.append(self.pos_embedding(v).astype(src.dtype))
        return srcs, valids, poss, feats

    def _lang_frozen(self) -> bool:
        mc = self.config
        return mc.stop_grad_frozen and (mc.freeze_bert or mc.freeze_reftr)

    def encode_language(self, sentence, sentence_valid, deterministic):
        seq, pooled = self.lang_backbone(sentence, sentence_valid,
                                         deterministic=deterministic)
        if self._lang_frozen():
            # --freeze_bert (main_vg.py:104): in the reference the flag is
            # dead code — freeze_lang_backbone (reftr_transformer.py:128) is
            # never consumed, and freeze_bert() refers to a nonexistent
            # self.textmodel and is never called. We deliberately implement
            # the documented intent (prune the whole BERT backward), a fix
            # of a reference bug, not torch parity.
            seq = jax.lax.stop_gradient(seq)
            pooled = jax.lax.stop_gradient(pooled)
        return self.map_sentence(seq, deterministic), pooled

    def phrase_inputs(self, batch, pooled_sentence, deterministic):
        """Per-phrase pooled features, context validity, and query validity.

        Vectorizes reftr_transformer.py:206-248.
        Returns (phrase_pooled [B,P,D], context_valid [B,P,S], query_valid
        [B, P*nq]).
        """
        mc = self.config
        n_q = mc.num_queries_per_phrase
        sentence_valid = batch["sentence_valid"].astype(bool)
        b, s = sentence_valid.shape
        if "phrases" in batch:
            phrases = batch["phrases"]
            phrase_valid = batch["phrase_valid"]
            p_l = batch["phrase_pos_l"]
            p_r = batch["phrase_pos_r"]
            _, n_ph, sp = phrases.shape
            flat = phrases.reshape(b * n_ph, sp)
            flat_valid = phrase_valid.reshape(b * n_ph, sp)
            _, pooled = self.lang_backbone(flat, flat_valid,
                                           deterministic=deterministic)
            if self._lang_frozen():
                pooled = jax.lax.stop_gradient(pooled)
            phrase_pooled = pooled.reshape(b, n_ph, -1)
            # context attendable only inside the phrase token span [l, r)
            t = jnp.arange(s)[None, None, :]
            context_valid = (t >= p_l[:, :, None]) & (t < p_r[:, :, None])
            # a phrase whose 3rd token is padding is "[CLS] [SEP]" = empty
            query_valid = phrase_valid[:, :, 2].astype(bool)
            query_valid = jnp.repeat(query_valid[:, :, None], n_q, axis=2)
            query_valid = query_valid.reshape(b, n_ph * n_q)
        else:
            phrase_pooled = pooled_sentence[:, None, :]
            lengths = sentence_valid.astype(jnp.int32).sum(-1)
            t = jnp.arange(s)[None, :]
            # exclude [CLS] (t=0), the final [SEP] (t=len-1), and padding
            context_valid = sentence_valid & (t != 0) & (t != (lengths - 1)[:, None])
            context_valid = context_valid[:, None, :]
            query_valid = jnp.ones((b, n_q), dtype=bool)
        phrase_pooled = self.map_phrase(phrase_pooled, deterministic)
        return phrase_pooled, context_valid, query_valid

    # ------------------------------------------------------------------
    def _heatmap_box(self, logits: jnp.ndarray,
                     valid: jnp.ndarray) -> jnp.ndarray:
        """Soft-argmax box from the vision_aux heatmap (heatmap_box).

        center = centroid of the sigmoid-normalized heatmap, extent =
        sqrt(12 * variance) — exact for a filled axis-aligned rectangle
        indicator. Coordinates in the boxes' normalized frame (the valid
        extent, matching criterion.py::loss_vision).
        """
        b, h, w = logits.shape
        vw = valid.astype(jnp.float32)
        ncol = jnp.maximum(valid.any(1).sum(-1), 1).astype(jnp.float32)
        nrow = jnp.maximum(valid.any(2).sum(-1), 1).astype(jnp.float32)
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None] / ncol[:, None]
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[None] / nrow[:, None]
        q = jax.nn.sigmoid(logits.astype(jnp.float32)) * vw
        q = q / jnp.maximum(q.sum((1, 2), keepdims=True), 1e-6)
        qx, qy = q.sum(1), q.sum(2)  # [B,w], [B,h] marginals
        cx = (qx * xs).sum(-1)
        cy = (qy * ys).sum(-1)
        bw = jnp.sqrt(12.0 * (qx * (xs - cx[:, None]) ** 2).sum(-1) + 1e-12)
        bh = jnp.sqrt(12.0 * (qy * (ys - cy[:, None]) ** 2).sum(-1) + 1e-12)
        box = jnp.stack([cx, cy, bw, bh], axis=-1)
        return jnp.clip(box, 1e-4, 1.0)  # [B, 4] cxcywh

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 deterministic: bool = True,
                 return_internals: bool = False) -> Dict[str, Any]:
        mc = self.config
        n_q = mc.num_queries_per_phrase
        sentence_valid = batch["sentence_valid"].astype(bool)
        b, s = sentence_valid.shape

        srcs, img_valids, img_poss, _ = self.extract_image_features(
            batch["image"], batch["image_valid"])
        if mc.img_pos_in_stream:
            # position into the value/residual stream (from-scratch aid,
            # core/config.py::img_pos_in_stream); q/k pos stays as-is
            srcs = [s + p for s, p in zip(srcs, img_poss)]
        sentence_feat, pooled = self.encode_language(
            batch["sentence"], batch["sentence_valid"], deterministic)
        phrase_pooled, context_valid, query_valid = self.phrase_inputs(
            batch, pooled, deterministic)

        memory, memory_valid, memory_pos = self.vl_transformer.encode(
            srcs, img_valids, img_poss, sentence_feat, sentence_valid,
            deterministic)
        memory_lang = memory[:, :s]

        query, query_pos = self.query_encoder(
            memory_lang, phrase_pooled, context_valid, deterministic)
        hs = self.vl_transformer.decode(
            query, query_pos, query_valid, memory, memory_valid, memory_pos,
            deterministic)  # [L, B, P*nq, D]

        n_layers = hs.shape[0]
        n_ph = query_valid.shape[1] // n_q
        hs_r = hs.reshape(n_layers, b, n_ph, n_q, -1)
        coords = jax.nn.sigmoid(
            self.bbox_embed(hs_r).astype(jnp.float32))  # [L,B,P,nq,4]

        out: Dict[str, Any] = {
            "pred_boxes": coords[-1],
            "phrase_mask": query_valid,
        }
        if mc.vision_aux:
            # per-level [B,h,w] in-box logits from the encoder's image
            # tokens (memory is [B, s + sum(h*w), D], levels in src order)
            logits, valids, off = [], [], s
            for src, v in zip(srcs, img_valids):
                _, h, w, _ = src.shape
                tok = memory[:, off:off + h * w]
                off += h * w
                logits.append(self.vision_probe(
                    tok.astype(jnp.float32)).reshape(b, h, w))
                valids.append(v)
            out["vision_logits"] = logits
            out["vision_valid"] = valids
            if mc.heatmap_box:
                if "phrases" in batch or n_q != 1:
                    raise ValueError(
                        "heatmap_box supports single-phrase REC only (one "
                        "query, one box per image)")
                out["pred_boxes"] = self._heatmap_box(
                    logits[0], img_valids[0]).reshape(b, 1, 1, 4)
        # with heatmap_box the decoder's LAST layer moves into the aux
        # list so the query path keeps training end to end
        n_aux = n_layers if (mc.vision_aux and mc.heatmap_box) \
            else n_layers - 1
        if mc.aux_loss:
            out["aux_outputs"] = [
                {"pred_boxes": coords[i], "phrase_mask": query_valid}
                for i in range(n_aux)
            ]
        if return_internals:
            out["internals"] = {
                "memory": memory,
                "memory_valid": memory_valid,
                "srcs": srcs,
                "img_valids": img_valids,
                "hs": hs_r,
                "lang_len": s,
            }
        return out
