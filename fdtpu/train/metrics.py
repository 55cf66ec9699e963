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
    Numpy implementation — runs once per eval epoch, not in the jit path.
    """
    import numpy as np

    pred_boxes = np.asarray(pred_boxes)
    pred_mask = np.asarray(pred_mask)
    gt_boxes = np.asarray(gt_boxes)
    gt_mask = np.asarray(gt_mask)

    records = []  # (score, image_idx, box)
    for bi in range(pred_boxes.shape[0]):
        for pi in np.where(pred_mask[bi])[0]:
            records.append((float(pred_boxes[bi, pi, 0]), bi, pred_boxes[bi, pi, 1:5]))
    records.sort(key=lambda r: -r[0])
    total_gt = int(gt_mask.sum())
    if total_gt == 0:
        return 0.0

    def to_xyxy(b):
        return np.array([b[0], b[1], b[0] + b[2], b[1] + b[3]])

    matched = [set() for _ in range(gt_boxes.shape[0])]
    tp = np.zeros(len(records))
    fp = np.zeros(len(records))
    for ri, (score, bi, box) in enumerate(records):
        best_iou, best_gi = 0.0, -1
        bx = to_xyxy(box)
        for gi in np.where(gt_mask[bi])[0]:
            if gi in matched[bi]:
                continue
            gx = to_xyxy(gt_boxes[bi, gi, 1:5])
            ix0, iy0 = max(bx[0], gx[0]), max(bx[1], gx[1])
            ix1, iy1 = min(bx[2], gx[2]), min(bx[3], gx[3])
            inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
            union = (
                (bx[2] - bx[0]) * (bx[3] - bx[1])
                + (gx[2] - gx[0]) * (gx[3] - gx[1])
                - inter
            )
            iou = inter / union if union > 0 else 0.0
            if iou > best_iou:
                best_iou, best_gi = iou, gi
        if best_iou > iou_threshold and best_gi >= 0:
            matched[bi].add(best_gi)
            tp[ri] = 1
        else:
            fp[ri] = 1
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / total_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
    # continuous AP (area under monotone precision envelope)
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[1.0], precision, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))
