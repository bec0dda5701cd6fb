"""Set-prediction matchers (capability parity).

Rebuilds /root/reference/models/modeling/matcher.py: HungarianMatcher
(:87-164, scipy LSAP over focal-class + L1 + GIoU costs) and OnetoAllMatcher
(:19-84, top-k queries per single GT). The live RefTR criterion is
matcher-free (num_queries_per_phrase == 1, criterion.py has no matcher
member), but the --set_cost_* knobs exist, so the capability is preserved.

Costs are computed in jnp (jit-friendly); the assignment itself runs on the
host through the native C++ Jonker-Volgenant solver (reftr_tpu.data.native
.lsap) — LSAP is sequential and tiny, exactly the kind of op that does NOT
belong on the TPU.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from reftr_tpu.ops.boxes import (
    box_cxcywh_to_xyxy,
    generalized_box_iou_pairwise,
)


def focal_class_cost(out_prob: jnp.ndarray, tgt_ids: jnp.ndarray,
                     alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """[Q, C] sigmoid probs x [N] target class ids -> [Q, N] focal cost
    (matcher.py:127-132)."""
    neg = (1 - alpha) * (out_prob ** gamma) * (
        -jnp.log(1 - out_prob + 1e-8))
    pos = alpha * ((1 - out_prob) ** gamma) * (-jnp.log(out_prob + 1e-8))
    return pos[:, tgt_ids] - neg[:, tgt_ids]


def match_cost(
    pred_boxes: jnp.ndarray,  # [Q, 4] cxcywh
    tgt_boxes: jnp.ndarray,  # [N, 4] cxcywh
    pred_logits: jnp.ndarray | None = None,  # [Q, C]
    tgt_ids: jnp.ndarray | None = None,  # [N]
    set_cost_class: float = 1.0,
    set_cost_bbox: float = 5.0,
    set_cost_giou: float = 2.0,
    focal_alpha: float = 0.25,
) -> jnp.ndarray:
    """[Q, N] assignment cost matrix (matcher.py:117-145)."""
    cost_bbox = jnp.abs(
        pred_boxes[:, None, :] - tgt_boxes[None, :, :]).sum(-1)
    cost_giou = -generalized_box_iou_pairwise(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(tgt_boxes))
    cost = set_cost_bbox * cost_bbox + set_cost_giou * cost_giou
    if pred_logits is not None and tgt_ids is not None:
        prob = 1.0 / (1.0 + jnp.exp(-pred_logits))
        cost = cost + set_cost_class * focal_class_cost(
            prob, tgt_ids, alpha=focal_alpha)
    return cost


def hungarian_match(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(row_idx, col_idx) minimizing total cost; rows = queries,
    cols = targets. Handles Q >= N by transposing into the n<=m solver."""
    from reftr_tpu.data.native import lsap

    cost = np.asarray(cost, np.float64)
    q, n = cost.shape
    if n <= q:
        cols_for_rows = lsap(cost.T)  # assign each target a query
        tgt_idx = np.arange(n)
        return cols_for_rows, tgt_idx
    rows = np.arange(q)
    return rows, lsap(cost)


def one_to_all_match(cost: np.ndarray, topk: int) -> np.ndarray:
    """Top-k lowest-cost queries for a single target (matcher.py:19-84).
    cost: [Q, 1] -> [topk] query indices."""
    c = np.asarray(cost).reshape(-1)
    return np.argsort(c)[:topk]
