"""Clean-room transliteration of the official WIDERFace evaluation algorithm.

Second, independently-derived implementation of the published toolkit
semantics (the WIDERFace `eval_tools` MATLAB protocol and its standard
Python port), kept in tests/ purely to cross-check the production evaluator
(``fdtpu/train/widerface_eval.py``) — see
``tests/test_widerface_eval.py::test_cross_implementation_agreement``.

Written as a direct, loop-for-loop statement of the published algorithm —
deliberately NOT sharing any code with the production module (which is
vectorized: searchsorted threshold sweep, matrix IoU, cumulative-sum PR).
Where the published code has quirks, they are transliterated, not fixed:

* IoU uses the **+1 inclusive-pixel convention** (Faster-RCNN
  ``bbox_overlaps``): after converting ``x2 = x1 + w``, widths/heights and
  intersections are measured as ``x2 - x1 + 1``.
* Images with **zero GT boxes or zero predictions are skipped** after
  counting their kept faces — false positives on GT-less images never
  count as proposals.
* Score normalization initializes ``max_score = 0, min_score = 1`` before
  scanning — exact min-max only for score distributions inside ``[0, 1]``
  (always true for this framework's sigmoid confidences; the cross-check
  generator stays in that range).
* A detection whose best-IoU GT is an ignored face is discarded from the
  proposal pool on EVERY such match (not only the first), and the ignored
  GT is retired from recall.
* ``0/0`` precision points are left as NaN exactly like the published
  division; the cross-check compares with NaN treated as 0 (such points
  can only form a zero-recall prefix, which never contributes to AP).

The only deliberate addition is a stable descending score sort per image:
the published per-image routine indexes "last detection above threshold"
positionally and therefore *assumes* its input files are score-sorted;
both implementations are fed through the same sort so the assumption holds.
"""

from __future__ import annotations

import numpy as np


def bbox_overlaps_official(boxes: np.ndarray, query_boxes: np.ndarray) -> np.ndarray:
    """(N, K) IoU between xyxy boxes, +1 inclusive-pixel convention."""
    n, k = boxes.shape[0], query_boxes.shape[0]
    overlaps = np.zeros((n, k), dtype=np.float64)
    for ki in range(k):
        query_area = (query_boxes[ki, 2] - query_boxes[ki, 0] + 1) * (
            query_boxes[ki, 3] - query_boxes[ki, 1] + 1
        )
        for ni in range(n):
            iw = (
                min(boxes[ni, 2], query_boxes[ki, 2])
                - max(boxes[ni, 0], query_boxes[ki, 0])
                + 1
            )
            if iw > 0:
                ih = (
                    min(boxes[ni, 3], query_boxes[ki, 3])
                    - max(boxes[ni, 1], query_boxes[ki, 1])
                    + 1
                )
                if ih > 0:
                    box_area = (boxes[ni, 2] - boxes[ni, 0] + 1) * (
                        boxes[ni, 3] - boxes[ni, 1] + 1
                    )
                    ua = box_area + query_area - iw * ih
                    overlaps[ni, ki] = iw * ih / ua
    return overlaps


def norm_score_official(preds: dict) -> dict:
    """Whole-split min-max score normalization, with the published 0/1
    accumulator initialization."""
    max_score = 0.0
    min_score = 1.0
    for v in preds.values():
        if len(v) == 0:
            continue
        min_score = min(min_score, float(np.min(v[:, 4])))
        max_score = max(max_score, float(np.max(v[:, 4])))
    diff = max_score - min_score
    out = {}
    for key, v in preds.items():
        v = np.asarray(v, np.float64).reshape(-1, 5).copy()
        if len(v):
            v[:, 4] = (v[:, 4] - min_score) / diff
        out[key] = v
    return out


def image_eval_official(pred, gt, ignore, iou_thresh):
    """Greedy per-image matching -> (cumulative kept recall, proposal flags).

    ``ignore[j] == 1`` marks a KEPT (counted) face, 0 an ignored one —
    the published flag polarity.
    """
    _pred = np.asarray(pred, np.float64).copy()
    _gt = np.asarray(gt, np.float64).copy()
    pred_recall = np.zeros(_pred.shape[0])
    recall_list = np.zeros(_gt.shape[0])
    proposal_list = np.ones(_pred.shape[0])

    _pred[:, 2] = _pred[:, 2] + _pred[:, 0]
    _pred[:, 3] = _pred[:, 3] + _pred[:, 1]
    _gt[:, 2] = _gt[:, 2] + _gt[:, 0]
    _gt[:, 3] = _gt[:, 3] + _gt[:, 1]

    overlaps = bbox_overlaps_official(_pred[:, :4], _gt)

    for h in range(_pred.shape[0]):
        gt_overlap = overlaps[h]
        max_overlap = gt_overlap.max()
        max_idx = int(gt_overlap.argmax())
        if max_overlap >= iou_thresh:
            if ignore[max_idx] == 0:
                recall_list[max_idx] = -1
                proposal_list[h] = -1
            elif recall_list[max_idx] == 0:
                recall_list[max_idx] = 1
        pred_recall[h] = int((recall_list == 1).sum())
    return pred_recall, proposal_list


def img_pr_info_official(thresh_num, pred_info, proposal_list, pred_recall):
    """Per-image (proposals, recall) at each of the 1000 thresholds.

    Assumes ``pred_info`` is sorted by descending score (see module doc).
    """
    pr_info = np.zeros((thresh_num, 2), dtype=np.float64)
    for t in range(thresh_num):
        thresh = 1.0 - (t + 1) / thresh_num
        r_index = np.where(pred_info[:, 4] >= thresh)[0]
        if len(r_index) == 0:
            pr_info[t, 0] = 0
            pr_info[t, 1] = 0
        else:
            r_index = r_index[-1]
            p_index = np.where(proposal_list[: r_index + 1] == 1)[0]
            pr_info[t, 0] = len(p_index)
            pr_info[t, 1] = pred_recall[r_index]
    return pr_info


def dataset_pr_info_official(thresh_num, pr_curve, count_face):
    """Accumulated counts -> (precision, recall) columns; 0/0 left as NaN
    like the published plain division."""
    _pr_curve = np.zeros((thresh_num, 2), dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(thresh_num):
            _pr_curve[i, 0] = pr_curve[i, 1] / pr_curve[i, 0]
            _pr_curve[i, 1] = pr_curve[i, 1] / count_face
    return _pr_curve


def voc_ap_official(rec, prec):
    """VOC all-points AP (precision-envelope integral over recall)."""
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    i = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1]))


def evaluate_split_official(
    preds, gts, keeps=None, iou_thresh=0.5, thresh_num=1000, normalize=True
):
    """Full one-split evaluation, published control flow.

    Same argument conventions as the production
    ``fdtpu.train.widerface_eval.evaluate_split`` (keeps: bool mask or
    0-based kept-index array per image; None keeps everything).
    Returns ``{"ap", "precision", "recall", "num_faces"}``.
    """
    preds = {
        k: np.asarray(v, np.float64).reshape(-1, 5) for k, v in preds.items()
    }
    if normalize:
        preds = norm_score_official(preds)

    count_face = 0
    pr_curve = np.zeros((thresh_num, 2), dtype=np.float64)
    for key, gt in gts.items():
        gt = np.asarray(gt, np.float64).reshape(-1, 4)
        if keeps is None:
            keep_index = np.arange(1, gt.shape[0] + 1)
        else:
            raw = np.asarray(keeps[key])
            if raw.dtype == bool:
                keep_index = np.where(raw)[0] + 1
            else:
                keep_index = raw.astype(np.int64).reshape(-1) + 1
        count_face += len(keep_index)

        pred = preds.get(key)
        if pred is None:
            pred = np.zeros((0, 5))
        # deliberate shared pre-pass: stable descending score order (the
        # published per-image routine assumes sorted input files)
        pred = pred[np.argsort(-pred[:, 4], kind="stable")]
        if gt.shape[0] == 0 or pred.shape[0] == 0:
            continue
        ignore = np.zeros(gt.shape[0])
        if len(keep_index) != 0:
            ignore[keep_index - 1] = 1
        pred_recall, proposal_list = image_eval_official(
            pred, gt, ignore, iou_thresh
        )
        pr_curve += img_pr_info_official(
            thresh_num, pred, proposal_list, pred_recall
        )

    pr = dataset_pr_info_official(thresh_num, pr_curve, count_face)
    propose = pr[:, 0]
    recall = pr[:, 1]
    ap = voc_ap_official(recall, np.nan_to_num(propose, nan=0.0))
    return {
        "ap": ap,
        "precision": propose,
        "recall": recall,
        "num_faces": count_face,
    }
