"""Evaluation metrics: text match, localization confusion, end-to-end OCR
metric — DataFrame-level aggregations backed by numpy kernels.

Behavioral parity targets in the reference (doctr/utils/metrics.py):
- string_match levels (:23-41), TextMatch accumulator (:44-121)
- box_iou (:124-149), nms (:181-216) — implemented in operators/geometry
- LocalizationConfusion (:219-309): optimal assignment (Hungarian) between
  gt and pred boxes, thresholded on IoU -> recall/precision/meanIoU
- OCRMetric (:312-439): assignment + exact string match

The Hungarian solver below is the classic O(n^3) potentials algorithm
(public textbook algorithm; scipy is not available in this container).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.geometry import box_iou_matrix

# ----------------------------------------------------------- assignment


def hungarian_min(cost: np.ndarray) -> list[tuple[int, int]]:
    """Minimal-cost assignment on an (n,m) cost matrix; returns [(row, col)]
    pairs for min(n, m) assignments. Potentials/shortest-augmenting-path
    formulation, O(n^2 m)."""
    cost = np.asarray(cost, dtype=np.float64)
    transposed = cost.shape[0] > cost.shape[1]
    if transposed:
        cost = cost.T
    n, m = cost.shape  # n <= m
    INF = float("inf")
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    p = np.zeros(m + 1, dtype=np.int64)  # p[j] = row matched to col j (1-based)
    way = np.zeros(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = -1
            for j in range(1, m + 1):
                if used[j]:
                    continue
                cur = cost[i0 - 1, j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0 != 0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    pairs = [(int(p[j]) - 1, j - 1) for j in range(1, m + 1) if p[j] != 0]
    if transposed:
        pairs = [(c, r) for r, c in pairs]
    return sorted(pairs)


# ---------------------------------------------------- localization metrics


def localization_confusion(
    gt_boxes: np.ndarray, pred_boxes: np.ndarray, iou_thresh: float = 0.5
) -> tuple[int, float]:
    """(n_matches at IoU>=thresh, summed IoU of assigned pairs) for one page.
    Assignment maximizes total IoU (Hungarian on -IoU)."""
    gt = np.asarray(gt_boxes, dtype=np.float64).reshape(-1, 4)
    pred = np.asarray(pred_boxes, dtype=np.float64).reshape(-1, 4)
    if gt.shape[0] == 0 or pred.shape[0] == 0:
        return 0, 0.0
    iou = box_iou_matrix(gt, pred)
    pairs = hungarian_min(-iou)
    matched = [(g, p) for g, p in pairs if iou[g, p] >= iou_thresh]
    return len(matched), float(sum(iou[g, p] for g, p in pairs))


def ocr_matches(
    gt_boxes: np.ndarray,
    gt_texts: list[str],
    pred_boxes: np.ndarray,
    pred_texts: list[str],
    iou_thresh: float = 0.5,
) -> tuple[int, int]:
    """(n_loc_matches, n_loc_and_text_matches) for one page — the OCRMetric
    end-to-end semantics (IoU-assigned pair + exact string equality)."""
    gt = np.asarray(gt_boxes, dtype=np.float64).reshape(-1, 4)
    pred = np.asarray(pred_boxes, dtype=np.float64).reshape(-1, 4)
    if gt.shape[0] == 0 or pred.shape[0] == 0:
        return 0, 0
    iou = box_iou_matrix(gt, pred)
    pairs = [(g, p) for g, p in hungarian_min(-iou) if iou[g, p] >= iou_thresh]
    text_ok = sum(1 for g, p in pairs if gt_texts[g] == pred_texts[p])
    return len(pairs), text_ok


def detection_matches(
    gt_boxes: np.ndarray,
    gt_labels: np.ndarray,
    pred_boxes: np.ndarray,
    pred_labels: np.ndarray,
    iou_thresh: float = 0.5,
) -> tuple[int, float, int, int]:
    """One page of the reference DetectionMetric (utils/metrics.py:442-551):
    Hungarian-assign predictions to ground truths on IoU, keep pairs with
    IoU >= thresh, count those whose CLASS also matches; tot_iou is the
    per-prediction best-IoU sum (the reference's ``iou_mat.max(axis=0)``).
    Returns (num_matches, tot_iou, n_gts, n_preds)."""
    gt = np.asarray(gt_boxes, dtype=np.float64).reshape(-1, 4)
    pred = np.asarray(pred_boxes, dtype=np.float64).reshape(-1, 4)
    gl = np.asarray(gt_labels)
    pl = np.asarray(pred_labels)
    if gt.shape[0] != gl.shape[0] or pred.shape[0] != pl.shape[0]:
        raise AssertionError("boxes and labels must align on both sides")
    if pred.shape[0] == 0 or gt.shape[0] == 0:
        # reference still counts gts/preds (and adds 0 IoU) when one side
        # is empty
        return 0, 0.0, int(gt.shape[0]), int(pred.shape[0])
    iou = box_iou_matrix(gt, pred)
    tot_iou = float(iou.max(axis=0).sum())
    pairs = hungarian_min(-iou)
    matches = sum(1 for g, p in pairs if iou[g, p] >= iou_thresh and gl[g] == pl[p])
    return int(matches), tot_iou, int(gt.shape[0]), int(pred.shape[0])


def detection_metric_summary(
    num_matches: int, tot_iou: float, n_gts: int, n_preds: int
) -> tuple[float | None, float | None, float | None]:
    """(recall, precision, mean_iou) with the reference's None-on-empty and
    round-2 mean IoU semantics."""
    recall = num_matches / n_gts if n_gts > 0 else None
    precision = num_matches / n_preds if n_preds > 0 else None
    mean_iou = round(tot_iou / n_preds, 2) if n_preds > 0 else None
    return recall, precision, mean_iou


# ------------------------------------------------------ DataFrame rollups


def text_match(df: DataFrame, gt_col: str, pred_col: str) -> DataFrame:
    """TextMatch accumulator: raw / caseless / anyascii / unicase
    exact-match rates (all four reference levels, utils/metrics.py:44-121)."""
    from .text import string_match

    raw, caseless, anyascii, unicase = string_match(F.col(gt_col), F.col(pred_col))
    flags = df.select(
        raw.alias("_raw"), caseless.alias("_caseless"),
        anyascii.alias("_anyascii"), unicase.alias("_unicase"),
    )
    return flags.agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.col("_raw").cast("double")), 6).alias("raw_acc"),
        F.round(F.avg(F.col("_caseless").cast("double")), 6).alias("caseless_acc"),
        F.round(F.avg(F.col("_anyascii").cast("double")), 6).alias("anyascii_acc"),
        F.round(F.avg(F.col("_unicase").cast("double")), 6).alias("unicase_acc"),
    )


def extraction_quality_report(extracted: DataFrame, expected: DataFrame) -> DataFrame:
    """Per-payload-kind per-turn equality rates: the engine's own end-to-end
    quality gate (north metric numerator)."""
    j = extracted.join(expected, ["conv_id", "turn_idx"])
    return (
        j.groupBy("payload_kind")
        .agg(
            F.count("*").alias("n_turns"),
            F.round(F.avg((F.col("extracted_text") == F.col("expected_text")).cast("double")), 6).alias(
                "exact_match_rate"
            ),
        )
        .orderBy("payload_kind")
    )
