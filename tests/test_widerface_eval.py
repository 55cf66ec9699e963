"""Official-protocol WIDERFace evaluator (fdtpu/train/widerface_eval.py).

Hand-computed PR/AP cases for the protocol's distinguishing semantics:
whole-split score normalization, greedy argmax matching without GT
exclusion, ignore-region handling, duplicate-detection penalty, and the
VOC all-points integral.
"""

import numpy as np
import pytest

from fdtpu.train.widerface_eval import (
    evaluate_split,
    norm_scores,
    voc_ap,
)


def _box(x, y, w, h, s=None):
    return [x, y, w, h] if s is None else [x, y, w, h, s]


def test_voc_ap_rectangles():
    # two plateaus: p=1 up to r=0.5, p=2/3 up to r=1
    recall = np.array([0.5, 0.5, 1.0])
    precision = np.array([1.0, 0.5, 2 / 3])
    assert voc_ap(recall, precision) == pytest.approx(0.5 + 0.5 * 2 / 3)


def test_perfect_detections_ap_one():
    gts = {"a": np.array([_box(0, 0, 10, 10), _box(20, 20, 10, 10)])}
    preds = {"a": np.array([_box(0, 0, 10, 10, 0.9),
                            _box(20, 20, 10, 10, 0.8)])}
    res = evaluate_split(preds, gts)
    assert res["ap"] == pytest.approx(1.0)
    assert res["num_faces"] == 2


def test_mid_ranked_false_positive():
    # TP(0.9), FP(0.8), TP(0.7): normalized to 1.0/0.5/0.0
    # sweep -> (p=1, r=.5), (p=.5, r=.5), (p=2/3, r=1); all-points AP:
    # 1.0 * 0.5 + (2/3) * 0.5
    gts = {"a": np.array([_box(0, 0, 10, 10), _box(20, 20, 10, 10)])}
    preds = {"a": np.array([
        _box(0, 0, 10, 10, 0.9),
        _box(50, 50, 10, 10, 0.8),
        _box(20, 20, 10, 10, 0.7),
    ])}
    res = evaluate_split(preds, gts)
    assert res["ap"] == pytest.approx(0.5 + 0.5 * 2 / 3)


def test_ignored_faces_are_neutral():
    # a detection on a non-kept face is neither proposal nor recall, and
    # the non-kept face doesn't enter the recall denominator
    gts = {"a": np.array([_box(0, 0, 10, 10), _box(40, 40, 8, 8)])}
    keeps = {"a": np.array([True, False])}
    preds = {"a": np.array([
        _box(0, 0, 10, 10, 0.9),
        _box(40, 40, 8, 8, 0.8),  # matches the ignored face -> discarded
    ])}
    res = evaluate_split(preds, gts, keeps)
    assert res["num_faces"] == 1
    assert res["ap"] == pytest.approx(1.0)
    # index-array keep spelling is equivalent
    res2 = evaluate_split(preds, gts, {"a": np.array([0])})
    assert res2["ap"] == pytest.approx(res["ap"])


def test_duplicate_detection_counts_against_precision():
    # second hit on an already-recalled face stays a proposal (official
    # duplicate penalty): sweep -> (p=1, r=1), (p=.5, r=1) => AP 1.0 only
    # because recall saturates first; check the precision tail directly
    gts = {"a": np.array([_box(0, 0, 10, 10)])}
    preds = {"a": np.array([
        _box(0, 0, 10, 10, 0.9),
        _box(1, 0, 10, 10, 0.8),  # IoU ~0.82 with the same face
    ])}
    res = evaluate_split(preds, gts)
    assert res["ap"] == pytest.approx(1.0)
    assert res["precision"][-1] == pytest.approx(0.5)


def test_score_normalization_spans_split():
    preds = {"a": np.array([_box(0, 0, 1, 1, 10.0)]),
             "b": np.array([_box(0, 0, 1, 1, 30.0)])}
    out = norm_scores(preds)
    assert out["a"][0, 4] == pytest.approx(0.0)
    assert out["b"][0, 4] == pytest.approx(1.0)


def test_missing_prediction_images_count_as_misses():
    gts = {"a": np.array([_box(0, 0, 10, 10)]),
           "b": np.array([_box(0, 0, 10, 10)])}
    preds = {"a": np.array([_box(0, 0, 10, 10, 0.9)])}
    res = evaluate_split(preds, gts)
    # recall tops out at 1/2 with perfect precision
    assert res["recall"].max() == pytest.approx(0.5)
    assert res["ap"] == pytest.approx(0.5)


def test_empty_predictions_zero_ap():
    gts = {"a": np.array([_box(0, 0, 10, 10)])}
    res = evaluate_split({}, gts)
    assert res["ap"] == 0.0


def _random_case(rng: np.random.Generator):
    """One randomized split: integer-ish boxes (real ties and IoU-threshold
    boundaries), ignore masks, deliberate duplicates, empty-GT images,
    empty-pred images, quantized score ties."""
    n_images = int(rng.integers(1, 7))
    gts, keeps, preds = {}, {}, {}
    for i in range(n_images):
        key = f"ev/im_{i}"
        m = int(rng.integers(0, 6))
        gt = np.stack(
            [
                rng.integers(0, 40, m),
                rng.integers(0, 40, m),
                rng.integers(1, 25, m),
                rng.integers(1, 25, m),
            ],
            axis=1,
        ).astype(np.float64) if m else np.zeros((0, 4))
        keep = rng.random(m) < 0.7
        n = int(rng.integers(0, 8))
        rows = []
        for _ in range(n):
            if m and rng.random() < 0.6:  # perturbed copy of a GT box
                base = gt[int(rng.integers(0, m))].copy()
                base[:2] += rng.integers(-4, 5, 2)
                base[2:] = np.maximum(base[2:] + rng.integers(-4, 5, 2), 1)
            else:  # unrelated box
                base = np.array(
                    [rng.integers(0, 40), rng.integers(0, 40),
                     rng.integers(1, 25), rng.integers(1, 25)],
                    np.float64,
                )
            # quantized scores -> frequent exact ties
            rows.append(np.append(base, rng.integers(0, 10) / 10.0))
        preds[key] = np.array(rows, np.float64).reshape(-1, 5)
        gts[key] = gt
        keeps[key] = keep
    if rng.random() < 0.3:  # an image present in GT but missing from preds
        del preds[next(iter(preds))]
    # keep the normalization span non-degenerate and inside [0, 1] (the
    # transliteration reproduces the published 0/1 accumulator init, exact
    # only for in-range scores — which sigmoid confidences always are)
    scores = np.concatenate([p[:, 4] for p in preds.values()]) if preds else []
    if len(scores) < 2 or np.ptp(scores) == 0:
        gts["ev/pad"] = np.array([[0.0, 0.0, 5.0, 5.0]])
        keeps["ev/pad"] = np.array([True])
        preds["ev/pad"] = np.array([[0.0, 0.0, 5.0, 5.0, 0.9],
                                    [30.0, 30.0, 5.0, 5.0, 0.1]])
    if not any(k.sum() for k in keeps.values()):  # >=1 kept face overall
        gts["ev/anchor"] = np.array([[10.0, 10.0, 6.0, 6.0]])
        keeps["ev/anchor"] = np.array([True])
        preds["ev/anchor"] = np.array([[10.0, 10.0, 6.0, 6.0, 0.8]])
    return preds, gts, keeps


def test_cross_implementation_agreement():
    """Production evaluator == clean-room transliteration of the published
    toolkit algorithm, exactly, over randomized fabricated splits
    (VERDICT r4 #3). This sweep caught two real protocol deviations when
    first run: continuous-vs-+1 IoU and proposal counting on GT-less
    images."""
    from widerface_official_transliteration import evaluate_split_official

    rng = np.random.default_rng(20260819)
    for case in range(120):
        preds, gts, keeps = _random_case(rng)
        for thresh_num in (100,) if case % 10 else (100, 1000):
            got = evaluate_split(preds, gts, keeps, thresh_num=thresh_num)
            want = evaluate_split_official(
                preds, gts, keeps, thresh_num=thresh_num
            )
            assert got["num_faces"] == want["num_faces"], case
            assert got["ap"] == pytest.approx(want["ap"], abs=1e-12), case
            np.testing.assert_allclose(
                got["recall"], want["recall"], atol=1e-12, err_msg=str(case)
            )
            np.testing.assert_allclose(
                got["precision"],
                np.nan_to_num(want["precision"], nan=0.0),
                atol=1e-12,
                err_msg=str(case),
            )
        # keeps=None spelling agrees too
        got = evaluate_split(preds, gts, None, thresh_num=100)
        want = evaluate_split_official(preds, gts, None, thresh_num=100)
        assert got["ap"] == pytest.approx(want["ap"], abs=1e-12), case


def test_inclusive_iou_boundary():
    # official +1 convention: a 10x10 det shifted 4px off a 10x10 GT has
    # IoU (7*11)/(121+121-77) = 77/165 ~ 0.467 < 0.5 inclusive, but
    # 60/140 ~ 0.429 continuous; shifted 3px: 8*11/(242-88) = 88/154
    # ~ 0.571 >= 0.5 -> match. Pin the convention via the 3px case.
    gts = {"a": np.array([_box(0, 0, 10, 10)])}
    preds = {"a": np.array([_box(3, 0, 10, 10, 0.9)])}
    res = evaluate_split(preds, gts, normalize=False)
    assert res["ap"] == pytest.approx(1.0)


def test_false_positives_on_gtless_images_are_skipped():
    # published-toolkit control flow: an image with zero GT contributes
    # nothing, even if predictions land there
    gts = {"a": np.array([_box(0, 0, 10, 10)]), "b": np.zeros((0, 4))}
    preds = {"a": np.array([_box(0, 0, 10, 10, 0.9)]),
             "b": np.array([_box(5, 5, 10, 10, 0.95)])}
    res = evaluate_split(preds, gts)
    assert res["ap"] == pytest.approx(1.0)


def _cell(lst):
    a = np.empty((len(lst), 1), dtype=object)
    for i, v in enumerate(lst):
        a[i, 0] = v
    return a


def test_official_mat_pipeline_end_to_end(tmp_path):
    """Fabricate the official .mat ground-truth structure over the synthetic
    dataset and run the full evaluate_widerface path (load_official_gt +
    score-normalized sweep): perfect predictions -> mAP 1.0 on every
    setting, including a 'hard' split whose non-kept faces are matched by
    detections (ignore path)."""
    from scipy.io import savemat

    from fdtpu.data import load_targets, make_synthetic_widerface
    from fdtpu.train.widerface_eval import evaluate_widerface

    root = make_synthetic_widerface(tmp_path / "data", num_images=5,
                                    split="val", max_faces=2)
    targets = load_targets(root, "val", max_faces=10**9)
    assert targets

    preds = {}
    files, bbxs, keeps_all, keeps_first = [], [], [], []
    for i, t in enumerate(targets):
        path = t["img_path"]
        key = f"{path.parent.name}/{path.stem}"
        gt = np.asarray(t["bbx"], np.float64)[:, 1:5]
        preds[key] = np.concatenate(
            [gt, 0.9 - 0.01 * np.arange(gt.shape[0])[:, None]], axis=1
        )
        files.append(np.array([path.stem]))
        bbxs.append(gt)
        keeps_all.append(np.arange(1, gt.shape[0] + 1).reshape(-1, 1))
        keeps_first.append(np.array([[1]]))

    event = targets[0]["img_path"].parent.name
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    savemat(gt_dir / "wider_face_val.mat", {
        "event_list": _cell([np.array([event])]),
        "file_list": _cell([_cell(files)]),
        "face_bbx_list": _cell([_cell(bbxs)]),
    })
    for setting, keeps in (("easy", keeps_all), ("medium", keeps_all),
                           ("hard", keeps_first)):
        savemat(gt_dir / f"wider_{setting}_val.mat",
                {"gt_list": _cell([_cell(keeps)])})

    aps = evaluate_widerface(preds, str(gt_dir))
    assert set(aps) == {"easy", "medium", "hard"}
    for v in aps.values():
        assert v == pytest.approx(1.0)

    # degrade: drop every prediction for one image -> easy mAP falls
    victim = next(iter(preds))
    preds2 = dict(preds)
    preds2[victim] = np.zeros((0, 5))
    aps2 = evaluate_widerface(preds2, str(gt_dir))
    assert aps2["easy"] < 1.0


def test_write_official_predictions(tmp_path):
    from fdtpu.train.widerface_eval import write_official_predictions

    preds = {"0--Ev/img_1": np.array([_box(1, 2, 3, 4, 0.75)]),
             "1--Other/img_2": np.zeros((0, 5))}
    n = write_official_predictions(preds, str(tmp_path))
    assert n == 2
    text = (tmp_path / "0--Ev" / "img_1.txt").read_text().splitlines()
    assert text[0] == "img_1" and text[1] == "1"
    assert text[2].split() == ["1.000", "2.000", "3.000", "4.000", "0.75000"]
    assert (tmp_path / "1--Other" / "img_2.txt").read_text().splitlines()[1] == "0"
