"""RefTRSeg: REC + referring expression segmentation (RES).

Rebuilds RefTRSeg (/root/reference/models/reftr_segmentation.py:44-175):
  * single feature level (backbone layer4 projected) and single phrase
    (:83-84, :97),
  * the REC path identical to RefTR but bbox head on the LAST decoder layer
    only (no aux) (:134-137),
  * refer_segmentation (:152-175): the encoder's visual memory reshaped back
    to a [h, w] map, concatenated with the projected backbone features
    (2*hidden channels), per-head query->pixel attention (MHAttentionMap),
    then the FPN mask head over backbone C3/C2/C1 producing 1/4-resolution
    mask logits,
  * optional CEM energy loss (--ablation cem_loss) (:146-147),
  * freeze_reftr (:53-54) is handled both by the optimizer's param groups
    and by stop_gradient pruning of the frozen trunk's backward, with the
    CEM block kept trainable (the reference freezes the trunk BEFORE
    constructing the mask branch and CEM, :52-63). NB the reference's
    driver hardcodes freeze_reftr=False (reftr_segmentation.py:375), so the
    flag is dead upstream; we implement the class-level intent.

Inherits RefTR's submodules via linen setup chaining.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from reftr_tpu.models.reftr import RefTR
from reftr_tpu.nn.seg_heads import CEM, MaskHeadSmallConv, MHAttentionMap


class RefTRSeg(RefTR):
    def setup(self):
        super().setup()
        mc = self.config
        assert mc.num_feature_levels == 1, (
            "RefTRSeg supports a single feature level (reference :83-84)")
        self.bbox_attention = MHAttentionMap(
            mc.hidden_dim, mc.nheads, dtype=self._dtype,
            name="bbox_attention")
        self.mask_head = MaskHeadSmallConv(
            mc.hidden_dim, dtype=self._dtype, name="mask_head")
        if mc.cem_loss:
            self.cem_block = CEM(mc.hidden_dim, dtype=self._dtype,
                                 name="cem_block")

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 deterministic: bool = True,
                 return_internals: bool = False) -> Dict[str, Any]:
        mc = self.config
        n_q = mc.num_queries_per_phrase
        sentence_valid = batch["sentence_valid"].astype(bool)
        b, s = sentence_valid.shape

        if batch["image"].dtype == jnp.uint8:
            if mc.fold_normalize:
                # /255 + mean/std folded into the stem weights (nn/fold.py)
                image = batch["image"].astype(self._dtype)
            else:
                from reftr_tpu.ops.image import normalize_images

                image = normalize_images(batch["image"], self._dtype)
        else:
            if mc.fold_normalize:
                raise ValueError(
                    "fold_normalize expects uint8 image inputs")
            image = batch["image"]
        # freeze_reftr (:53-54): torch freezes the whole trunk BEFORE the
        # mask branch is constructed, so autograd never runs the trunk
        # backward; stop_gradient at the trunk outputs reproduces that
        # pruning (backbone stages are stopped inside ResNet already).
        frozen_trunk = mc.freeze_reftr and mc.stop_grad_frozen
        sg = jax.lax.stop_gradient if frozen_trunk else (lambda t: t)
        feats = self.img_backbone(image)  # 4 levels (masks=True)
        src = sg(self.input_proj[0](feats[-1]))
        from reftr_tpu.nn.resnet import downsample_mask

        img_valid = downsample_mask(batch["image_valid"], src.shape[1:3])
        pos = self.pos_embedding(img_valid)
        srcs, img_valids, img_poss = [src], [img_valid], [pos.astype(src.dtype)]
        if mc.img_pos_in_stream:
            # from-scratch aid, core/config.py::img_pos_in_stream
            srcs = [s_ + p_ for s_, p_ in zip(srcs, img_poss)]

        sentence_feat, pooled = self.encode_language(
            batch["sentence"], batch["sentence_valid"], deterministic)
        # RES assumes a single phrase (reference :96-106)
        phrase_pooled, context_valid, query_valid = self.phrase_inputs(
            {k: v for k, v in batch.items() if k not in
             ("phrases", "phrase_valid", "phrase_pos_l", "phrase_pos_r")},
            pooled, deterministic)

        memory, memory_valid, memory_pos = self.vl_transformer.encode(
            srcs, img_valids, img_poss, sentence_feat, sentence_valid,
            deterministic)
        memory = sg(memory)
        memory_lang = memory[:, :s]
        query, query_pos = self.query_encoder(
            memory_lang, phrase_pooled, context_valid, deterministic)
        hs = sg(self.vl_transformer.decode(
            query, query_pos, query_valid, memory, memory_valid, memory_pos,
            deterministic))  # [L, B, nq, D]

        # detection head: last layer only, no aux (reference :134-137)
        last_hs = hs[-1].reshape(b, 1, n_q, -1)
        coords = sg(jax.nn.sigmoid(
            self.bbox_embed(last_hs).astype(jnp.float32)))
        out: Dict[str, Any] = {
            "pred_boxes": coords,
            "phrase_mask": query_valid,
        }

        # segmentation head
        h, w = src.shape[1:3]
        memory_visual = memory[:, s:].reshape(b, h, w, -1)
        img_src = jnp.concatenate([src, memory_visual], axis=-1)  # [B,h,w,2D]
        bbox_mask = self.bbox_attention(
            hs[-1], memory_visual, img_valid)  # [B, nq, heads, h, w]

        # tile image features per query, concat attention maps as channels
        nq_total = bbox_mask.shape[1]
        x = jnp.repeat(img_src, nq_total, axis=0)  # [B*nq, h, w, 2D]
        att = bbox_mask.reshape(b * nq_total, -1, h, w).transpose(0, 2, 3, 1)
        x = jnp.concatenate([x, att.astype(x.dtype)], axis=-1)
        fpns = [feats[2], feats[1], feats[0]]  # C3, C2, C1
        seg_logits, res_feat = self.mask_head(x, fpns)
        oh, ow = seg_logits.shape[1:3]
        out["pred_masks"] = seg_logits.reshape(b, nq_total, oh, ow).astype(
            jnp.float32)
        out["mask_att"] = bbox_mask[:, 0]

        if mc.cem_loss:
            out["cem_loss"] = self.cem_block(last_hs, res_feat.reshape(
                b, nq_total, oh, ow, -1)[:, 0])
        if return_internals:
            out["internals"] = {"memory": memory, "hs": hs,
                                "res_feat": res_feat}
        return out
