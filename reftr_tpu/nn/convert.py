"""PyTorch -> reftr_tpu parameter converters.

Maps torch state_dicts (HF BERT, torchvision ResNet, torch MultiheadAttention
/ DETR-style transformer layers, full reference RefTR checkpoints) into this
framework's Flax param trees. Used both for loading released reference
checkpoints (README.md:86-91 of the reference) and as the bridge for golden
parity tests.

Conventions:
  * torch Linear weight is [out, in]; Flax Dense kernel is [in, out] -> .T
  * torch Conv2d weight is [O, I, kh, kw]; Flax Conv (NHWC) is [kh, kw, I, O]
  * torch MultiheadAttention packs qkv rows in in_proj_weight [3D, D]
  * LayerNorm: weight -> scale
All values are converted to numpy float32; inputs may be torch tensors or
numpy arrays.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def layer_norm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def conv(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def frozen_bn(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "weight": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
        "running_mean": _np(sd[f"{prefix}.running_mean"]),
        "running_var": _np(sd[f"{prefix}.running_var"]),
    }


def embedding(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"embedding": _np(sd[f"{prefix}.weight"])}


def mha(sd: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    """torch nn.MultiheadAttention -> our MultiHeadAttention.

    prefix must end with '.' when non-empty."""
    w = _np(sd[f"{prefix}in_proj_weight"])  # [3D, D]
    b = _np(sd[f"{prefix}in_proj_bias"])  # [3D]
    d = w.shape[1]
    qw, kw, vw = w[:d], w[d : 2 * d], w[2 * d :]
    qb, kb, vb = b[:d], b[d : 2 * d], b[2 * d :]
    return {
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": linear(sd, f"{prefix}out_proj"),
    }


# ---------------------------------------------------------------------------
# BERT (HF naming; reference consumes BertModel outputs [0:2])
# ---------------------------------------------------------------------------

def convert_bert(sd: Mapping[str, Any], num_layers: int,
                 prefix: str = "") -> Dict[str, Any]:
    """HF BertModel state_dict -> params for reftr_tpu.nn.bert.BertModel."""
    p = prefix
    params: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": embedding(sd, f"{p}embeddings.word_embeddings"),
            "position_embeddings": embedding(
                sd, f"{p}embeddings.position_embeddings"),
            "token_type_embeddings": embedding(
                sd, f"{p}embeddings.token_type_embeddings"),
            "LayerNorm": layer_norm(sd, f"{p}embeddings.LayerNorm"),
        },
        "pooler": linear(sd, f"{p}pooler.dense"),
    }
    for i in range(num_layers):
        lp = f"{p}encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "q_proj": linear(sd, f"{lp}.attention.self.query"),
                "k_proj": linear(sd, f"{lp}.attention.self.key"),
                "v_proj": linear(sd, f"{lp}.attention.self.value"),
                "out_proj": linear(sd, f"{lp}.attention.output.dense"),
            },
            "attention_norm": layer_norm(sd, f"{lp}.attention.output.LayerNorm"),
            "intermediate": linear(sd, f"{lp}.intermediate.dense"),
            "output": linear(sd, f"{lp}.output.dense"),
            "output_norm": layer_norm(sd, f"{lp}.output.LayerNorm"),
        }
    return params


# ---------------------------------------------------------------------------
# ResNet (torchvision naming)
# ---------------------------------------------------------------------------

def convert_resnet(sd: Mapping[str, Any], depth: str = "resnet50",
                   prefix: str = "") -> Dict[str, Any]:
    """torchvision resnet50/101 state_dict -> params for nn.resnet.ResNet."""
    from reftr_tpu.nn.resnet import RESNET_LAYERS

    p = prefix
    params: Dict[str, Any] = {
        "conv1": conv(sd, f"{p}conv1"),
        "bn1": frozen_bn(sd, f"{p}bn1"),
    }
    for stage, n_blocks in enumerate(RESNET_LAYERS[depth], start=1):
        for b in range(n_blocks):
            bp = f"{p}layer{stage}.{b}"
            block: Dict[str, Any] = {}
            for j in (1, 2, 3):
                block[f"conv{j}"] = conv(sd, f"{bp}.conv{j}")
                block[f"bn{j}"] = frozen_bn(sd, f"{bp}.bn{j}")
            if f"{bp}.downsample.0.weight" in sd:
                block["downsample_conv"] = conv(sd, f"{bp}.downsample.0")
                block["downsample_bn"] = frozen_bn(sd, f"{bp}.downsample.1")
            params[f"layer{stage}_{b}"] = block
    return params


# ---------------------------------------------------------------------------
# DETR-style transformer encoder/decoder layers
# ---------------------------------------------------------------------------

def convert_encoder_layer(sd: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    """prefix must end with '.' when non-empty."""
    return {
        "self_attn": mha(sd, f"{prefix}self_attn."),
        "ffn": {
            "linear1": linear(sd, f"{prefix}linear1"),
            "linear2": linear(sd, f"{prefix}linear2"),
        },
        "norm1": layer_norm(sd, f"{prefix}norm1"),
        "norm2": layer_norm(sd, f"{prefix}norm2"),
    }


def convert_decoder_layer(sd: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    """prefix must end with '.' when non-empty."""
    return {
        "self_attn": mha(sd, f"{prefix}self_attn."),
        "multihead_attn": mha(sd, f"{prefix}multihead_attn."),
        "ffn": {
            "linear1": linear(sd, f"{prefix}linear1"),
            "linear2": linear(sd, f"{prefix}linear2"),
        },
        "norm1": layer_norm(sd, f"{prefix}norm1"),
        "norm2": layer_norm(sd, f"{prefix}norm2"),
        "norm3": layer_norm(sd, f"{prefix}norm3"),
    }


def convert_encoder(sd: Mapping[str, Any], num_layers: int,
                    prefix: str = "") -> Dict[str, Any]:
    """TransformerEncoder (layers.{i}.*) -> our TransformerEncoder params."""
    out: Dict[str, Any] = {}
    for i in range(num_layers):
        out[f"layers_{i}"] = convert_encoder_layer(sd, f"{prefix}layers.{i}.")
    if f"{prefix}norm.weight" in sd:
        out["norm"] = layer_norm(sd, f"{prefix}norm")
    return out


def convert_decoder(sd: Mapping[str, Any], num_layers: int,
                    prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for i in range(num_layers):
        out[f"layers_{i}"] = convert_decoder_layer(sd, f"{prefix}layers.{i}.")
    out["norm"] = layer_norm(sd, f"{prefix}norm")
    return out


def convert_mlp(sd: Mapping[str, Any], num_layers: int,
                prefix: str = "") -> Dict[str, Any]:
    """DETR MLP head (layers.{i} Linear list) -> nn.mlp.MLP params."""
    return {
        f"layers_{i}": linear(sd, f"{prefix}layers.{i}")
        for i in range(num_layers)
    }


def convert_mlp_mapping(sd: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    """reference mlp_mapping Sequential(Linear,LN,ReLU,Drop,Linear,LN,ReLU)
    (indices 0,1,4,5) -> nn.mlp.MLPMapping params."""
    return {
        "fc1": linear(sd, f"{prefix}0"),
        "ln1": layer_norm(sd, f"{prefix}1"),
        "fc2": linear(sd, f"{prefix}4"),
        "ln2": layer_norm(sd, f"{prefix}5"),
    }


def group_norm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


# ---------------------------------------------------------------------------
# Full reference checkpoints (RefTR / RefTRSeg state dicts)
# ---------------------------------------------------------------------------

def convert_reftr(sd: Mapping[str, Any], enc_layers: int = 6,
                  dec_layers: int = 6, bert_layers: int = 12,
                  backbone: str = "resnet50",
                  num_feature_levels: int = 1) -> Dict[str, Any]:
    """Full reference RefTR(/Seg) state_dict -> reftr_tpu param tree.

    Accepts checkpoints saved by the reference (module names per
    models/reftr_transformer.py / reftr_segmentation.py; backbone nested as
    img_backbone.0.body.*). Segmentation heads are converted when present.
    """
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    params: Dict[str, Any] = {}
    params["img_backbone"] = convert_resnet(
        sd, backbone, prefix="img_backbone.0.body.")
    params["lang_backbone"] = convert_bert(
        sd, bert_layers, prefix="lang_backbone.")
    params["map_sentence"] = convert_mlp_mapping(sd, "map_sentence.")
    if "map_phrase.0.weight" in sd:
        params["map_phrase"] = convert_mlp_mapping(sd, "map_phrase.")
    vl: Dict[str, Any] = {
        "lang_pos_embeddings": embedding(sd, "vl_transformer.lang_pos_embeddings"),
        "token_type_embeddings": embedding(sd, "vl_transformer.token_type_embeddings"),
        "level_embed": _np(sd["vl_transformer.level_embed"]),
        "encoder": convert_encoder(sd, enc_layers, "vl_transformer.encoder."),
    }
    if f"vl_transformer.decoder.layers.0.self_attn.in_proj_weight" in sd:
        vl["decoder"] = convert_decoder(sd, dec_layers,
                                        "vl_transformer.decoder.")
    params["vl_transformer"] = vl
    if "query_encoder.query_embed.weight" in sd:
        params["query_encoder"] = {
            "query_embed": _np(sd["query_encoder.query_embed.weight"]),
            "linear1": linear(sd, "query_encoder.linear1"),
            "linear2": linear(sd, "query_encoder.linear2"),
            "linear3": linear(sd, "query_encoder.linear3"),
            "context_fc": linear(sd, "query_encoder.context_out.0"),
            "context_ln": layer_norm(sd, "query_encoder.context_out.1"),
            "fuse_encoder_query": convert_mlp_mapping(
                sd, "query_encoder.fuse_encoder_query."),
        }
    params["bbox_embed"] = convert_mlp(sd, 3, "bbox_embed.")
    for i in range(num_feature_levels):
        params[f"input_proj_{i}"] = {
            "conv": conv(sd, f"input_proj.{i}.0"),
            "norm": group_norm(sd, f"input_proj.{i}.1"),
        }
    # segmentation heads (RefTRSeg)
    if "bbox_attention.q_linear.weight" in sd:
        params["bbox_attention"] = {
            "q_linear": linear(sd, "bbox_attention.q_linear"),
            "k_linear": linear(sd, "bbox_attention.k_linear"),
        }
        mh: Dict[str, Any] = {}
        for j in range(1, 6):
            mh[f"lay{j}"] = conv(sd, f"mask_head.lay{j}")
            mh[f"gn{j}"] = group_norm(sd, f"mask_head.gn{j}")
        for j in range(1, 4):
            mh[f"adapter{j}"] = conv(sd, f"mask_head.adapter{j}")
        mh["out_lay"] = conv(sd, "mask_head.out_lay")
        params["mask_head"] = mh
    if "cem_block.c1.weight" in sd:
        params["cem_block"] = {
            "c1": linear(sd, "cem_block.c1"),
            "c2": linear(sd, "cem_block.c2"),
            "c3": linear(sd, "cem_block.c3"),
        }
    return params


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a reference checkpoint; returns the model state dict
    (handles the {'model': ...} wrapper of main_vg.py:377-385)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        return ckpt["model"]
    return ckpt
