"""Accuracy metrics: the quality gates from BASELINE.md.

The reference's accuracy discipline is per-layer max-abs-diff vs an oracle
(testutil.h:1194-1195); the model-level gates for the TPU build are
classification top-1, super-resolution PSNR, and detection mAP deltas
between precision modes (fp32 vs bf16/int8).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def top1_accuracy(logits: np.ndarray, labels: np.ndarray) -> float:
    return float(np.mean(np.argmax(logits, axis=-1) == labels))


def topk_accuracy(logits: np.ndarray, labels: np.ndarray, k: int = 5) -> float:
    topk = np.argsort(-logits, axis=-1)[:, :k]
    return float(np.mean(np.any(topk == labels[:, None], axis=1)))


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    """Peak signal-to-noise ratio in dB (super-resolution gate)."""
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(max_val**2 / mse))


def agreement_rate(logits_a: np.ndarray, logits_b: np.ndarray) -> float:
    """Fraction of identical argmax decisions between two precision modes —
    the classification-delta gate when no labeled set is available."""
    return float(np.mean(np.argmax(logits_a, -1) == np.argmax(logits_b, -1)))


def _box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU matrix for [x, y, w, h] boxes (reference CalculateIoU,
    yololayer.cpp:56-76)."""
    ax0, ay0 = a[:, 0], a[:, 1]
    ax1, ay1 = a[:, 0] + a[:, 2], a[:, 1] + a[:, 3]
    bx0, by0 = b[:, 0], b[:, 1]
    bx1, by1 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
    ix0 = np.maximum(ax0[:, None], bx0[None, :])
    iy0 = np.maximum(ay0[:, None], by0[None, :])
    ix1 = np.minimum(ax1[:, None], bx1[None, :])
    iy1 = np.minimum(ay1[:, None], by1[None, :])
    iw = np.clip(ix1 - ix0, 0, None)
    ih = np.clip(iy1 - iy0, 0, None)
    inter = iw * ih
    area_a = (a[:, 2] * a[:, 3])[:, None]
    area_b = (b[:, 2] * b[:, 3])[None, :]
    return inter / (area_a + area_b - inter + 1e-12)


def average_precision(
    pred: np.ndarray, gt: np.ndarray, iou_threshold: float = 0.5
) -> float:
    """AP for one image+class. pred rows [score, x, y, w, h] (score-sorted
    or not), gt rows [x, y, w, h]. 11-point-free (continuous) AP."""
    if len(gt) == 0:
        return 1.0 if len(pred) == 0 else 0.0
    if len(pred) == 0:
        return 0.0
    order = np.argsort(-pred[:, 0])
    pred = pred[order]
    iou = _box_iou(pred[:, 1:5], gt)
    matched = np.zeros(len(gt), bool)
    tp = np.zeros(len(pred))
    for i in range(len(pred)):
        j = int(np.argmax(iou[i]))
        if iou[i, j] >= iou_threshold and not matched[j]:
            matched[j] = True
            tp[i] = 1
    cum_tp = np.cumsum(tp)
    recall = cum_tp / len(gt)
    precision = cum_tp / (np.arange(len(pred)) + 1)
    # precision envelope
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    ap = 0.0
    prev_r = 0.0
    for r, p in zip(recall, precision):
        ap += (r - prev_r) * p
        prev_r = r
    return float(ap)


def mean_average_precision(
    detections: Sequence[np.ndarray],
    ground_truths: Sequence[np.ndarray],
    num_classes: int,
    iou_threshold: float = 0.5,
) -> float:
    """mAP over images; detections rows [class, score, x, y, w, h]
    (the YOLO op's output format), gt rows [class, x, y, w, h]."""
    aps: List[float] = []
    for c in range(num_classes):
        for det, gt in zip(detections, ground_truths):
            det_c = det[det[:, 0] == c][:, 1:6] if len(det) else np.zeros((0, 5))
            gt_c = gt[gt[:, 0] == c][:, 1:5] if len(gt) else np.zeros((0, 4))
            if len(gt_c) == 0 and len(det_c) == 0:
                continue
            aps.append(average_precision(det_c, gt_c, iou_threshold))
    return float(np.mean(aps)) if aps else 0.0


def precision_delta_report(engine_fp32, engine_low, inputs: Dict[str, np.ndarray],
                           kind: str = "classification") -> dict:
    """Compare two precision modes on the same inputs — the accuracy gate
    (BASELINE.md: match within the reference's delta discipline)."""
    a = np.asarray(engine_fp32.run_single(next(iter(inputs.values()))))
    b = np.asarray(engine_low.run_single(next(iter(inputs.values()))))
    rep = {"max_abs_diff": float(np.max(np.abs(a - b)))}
    if kind == "classification":
        rep["top1_agreement"] = agreement_rate(a, b)
    elif kind == "sr":
        rep["psnr_db"] = psnr(a, b)
    return rep
