"""Detection metrics with the reference's exact semantics, vectorized.

The reference computes per-step IoU/recall/precision in a Python loop over the
batch with per-sample NMS and ``torchvision.ops.box_iou``
(``/root/reference/models/ModelMeta.py:173-218``). Its definitions are
idiosyncratic and are reproduced faithfully here (masked, batched):

* ``matches`` counts **pairwise IoU-matrix entries** over 0.5 — not unique
  assignments (``ModelMeta.py:207``: ``torch.where(iou > 0.5)[0].shape[0]``);
* recall = matches / num_gt, precision = matches / num_pred;
* a sample with **no predictions contributes 0** to all three accumulators
  (the whole block is inside ``if pred_bbx.shape[0] > 0``, ``ModelMeta.py:199``);
* with predictions but no gt, recall contributes 0 (``ModelMeta.py:208-210``);
* ``total_iou`` accumulates the **sum of the whole IoU matrix**
  (``ModelMeta.py:214``);
* all three are averaged over the batch size; F1 is computed from
  epoch-averaged precision/recall (``ModelMeta.py:241-258``).

Additionally :func:`average_precision` provides a standard 101-point-free AP
(VOC-style continuous) for the mAP parity gate in BASELINE.md — the reference
never computes mAP, but the north-star target is specified in terms of it.
"""

from __future__ import annotations

import jax.numpy as jnp

from fdtpu.core.boxes import box_iou, xywh_to_xyxy


def detection_metrics(
    pred_boxes: jnp.ndarray,
    pred_mask: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    sample_mask: jnp.ndarray | None = None,
    iou_match_threshold: float = 0.5,
):
    """Batched reference metrics.

    Args:
      pred_boxes: ``(B, P, 5)`` NMS output rows ``[score, x, y, w, h]``.
      pred_mask: ``(B, P)`` validity.
      gt_boxes: ``(B, G, 5)`` ground-truth cxywh rows (pixels).
      gt_mask: ``(B, G)`` validity.
      sample_mask: ``(B,)`` real-sample mask (padding batches excluded).

    Returns dict of scalars: ``iou``, ``recall``, ``precision`` (batch means,
    reference semantics).
    """
    b = pred_boxes.shape[0]
    if sample_mask is None:
        sample_mask = jnp.ones((b,), dtype=bool)

    pred_xyxy = xywh_to_xyxy(pred_boxes[..., 1:5])
    gt_xyxy = xywh_to_xyxy(gt_boxes[..., 1:5])
    iou = box_iou(gt_xyxy, pred_xyxy)  # (B, G, P)
    pair_mask = gt_mask[..., :, None] & pred_mask[..., None, :]
    iou = jnp.where(pair_mask, iou, 0.0)

    num_gt = jnp.sum(gt_mask, axis=-1)
    num_pred = jnp.sum(pred_mask, axis=-1)
    matches = jnp.sum((iou > iou_match_threshold) & pair_mask, axis=(-2, -1))

    has_pred = (num_pred > 0) & sample_mask
    recall = jnp.where(
        has_pred & (num_gt > 0), matches / jnp.maximum(num_gt, 1), 0.0
    )
    precision = jnp.where(has_pred, matches / jnp.maximum(num_pred, 1), 0.0)
    iou_sum = jnp.where(has_pred, jnp.sum(iou, axis=(-2, -1)), 0.0)

    denom = jnp.maximum(jnp.sum(sample_mask), 1)
    return {
        "iou": jnp.sum(iou_sum) / denom,
        "recall": jnp.sum(recall) / denom,
        "precision": jnp.sum(precision) / denom,
    }


def f1_score(precision: float, recall: float) -> float:
    """Epoch F1 from averaged precision/recall (``ModelMeta.py:257``)."""
    denom = precision + recall
    return 0.0 if denom == 0 else 2 * precision * recall / denom


def average_precision(
    pred_boxes,
    pred_mask,
    gt_boxes,
    gt_mask,
    iou_threshold: float = 0.5,
):
    """Single-class AP@iou over a whole (host-side) eval set.

    Standard greedy matching: predictions sorted by score globally; each
    matches the best unmatched gt in its image with IoU over threshold.

    Vectorized numpy implementation (round-2 VERDICT weak-item 6: the old
    O(preds x gt) pure-Python double loop was ~400k iterations at real
    WIDERFace-val scale). Matching is per-image independent — the global
    score sort only fixes the tp/fp *order* for the cumsum — so all IoU
    matrices are computed in one batched op and the only remaining Python
    loop is the greedy scan over each image's score-ranked predictions,
    with the unmatched-gt argmax vectorized. Tie-breaking is identical to
    the reference loop: stable descending-score order (image index, then
    prediction index), first gt on equal IoU.
    """
    import numpy as np

    pred_boxes = np.asarray(pred_boxes, dtype=np.float64)
    pred_mask = np.asarray(pred_mask, dtype=bool)
    gt_boxes = np.asarray(gt_boxes, dtype=np.float64)
    gt_mask = np.asarray(gt_mask, dtype=bool)

    total_gt = int(gt_mask.sum())
    if total_gt == 0:
        return 0.0
    num_pred = int(pred_mask.sum())
    if num_pred == 0:
        return 0.0

    # batched IoU: (B, P, G), invalid pairs zeroed
    p, g = pred_boxes[..., 1:5], gt_boxes[..., 1:5]
    px0, py0 = p[..., 0], p[..., 1]
    px1, py1 = p[..., 0] + p[..., 2], p[..., 1] + p[..., 3]
    gx0, gy0 = g[..., 0], g[..., 1]
    gx1, gy1 = g[..., 0] + g[..., 2], g[..., 1] + g[..., 3]
    iw = np.clip(
        np.minimum(px1[:, :, None], gx1[:, None, :])
        - np.maximum(px0[:, :, None], gx0[:, None, :]), 0, None
    )
    ih = np.clip(
        np.minimum(py1[:, :, None], gy1[:, None, :])
        - np.maximum(py0[:, :, None], gy0[:, None, :]), 0, None
    )
    inter = iw * ih
    area_p = (px1 - px0) * (py1 - py0)
    area_g = (gx1 - gx0) * (gy1 - gy0)
    union = area_p[:, :, None] + area_g[:, None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / union, 0.0)
    iou = np.where(pred_mask[:, :, None] & gt_mask[:, None, :], iou, 0.0)

    # per-image greedy matching in descending-score order (stable, so tie
    # order matches the old record-list sort: image idx then pred idx)
    b_dim = pred_boxes.shape[0]
    scores = np.where(pred_mask, pred_boxes[..., 0], -np.inf)
    tp = np.zeros_like(scores)
    for bi in range(b_dim):
        valid = np.flatnonzero(pred_mask[bi])
        if valid.size == 0:
            continue
        order = valid[np.argsort(-scores[bi, valid], kind="stable")]
        iou_b = iou[bi].copy()  # matched gts get erased as we go
        # preds whose best IoU can never clear the threshold are fp outright
        cand = order[iou_b[order].max(axis=1) > iou_threshold] \
            if gt_mask[bi].any() else order[:0]
        for pi in cand:
            row = iou_b[pi]
            gi = int(np.argmax(row))
            if row[gi] > iou_threshold:
                tp[bi, pi] = 1.0
                iou_b[:, gi] = -1.0  # gt consumed
    flat_scores = scores[pred_mask]
    flat_tp = tp[pred_mask]
    global_order = np.argsort(-flat_scores, kind="stable")
    tp_sorted = flat_tp[global_order]
    tp_cum = np.cumsum(tp_sorted)
    fp_cum = np.cumsum(1.0 - tp_sorted)
    recall = tp_cum / total_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
    # continuous AP (area under monotone precision envelope)
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[1.0], precision, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))
