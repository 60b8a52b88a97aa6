"""YOLO detection head: grid decode + NMS, fully on-device.

The reference runs this on CPU (core/src/ic2/yololayer.cpp:40-226: anchors
at :36-38, decode at :113-175, IoU-NMS at :73-110) with data-dependent box
counts. TPU-native re-design: the decode is vectorized over all grid cells,
candidate selection is a fixed-size `top_k`, and NMS is an O(K^2) masked
suppression loop under `lax.fori_loop` — everything static-shaped so the
whole head stays inside the jitted program (no host callback).

Output: (N, max_detections, 6) rows [class_id, score, x, y, w, h] in
normalized [0,1] image coordinates (x,y = top-left corner as in the
reference), padded with score=0 rows.

Anchor/mask defaults are YOLOv3-tiny's (yololayer.cpp:36-38).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from shadernn_tpu.graph.ir import Node, TensorSpec
from shadernn_tpu.ops.registry import OpDef, RunCtx, register

YOLOV3_TINY_ANCHORS = (
    (10.0, 14.0), (23.0, 27.0), (37.0, 58.0),
    (81.0, 82.0), (135.0, 169.0), (344.0, 319.0),
)
YOLOV3_TINY_MASKS = ((3, 4, 5), (1, 2, 3))  # per grid scale (32, 16)


def decode_grid(feat, anchors, net_hw, num_classes):
    """Decode one YOLO feature map (N, gh, gw, A*(5+C)) -> boxes/scores.

    Matches yololayer.cpp:113-175: cx,cy = (grid + sigmoid(t)) / grid_dim;
    w,h = exp(t) * anchor / net_dim; score = sigmoid(obj) * sigmoid(cls)
    (the reference's formula at :139 reads as a product of sigmoids modulo
    a parenthesization bug; we use the standard product).
    Returns (boxes (N, gh*gw*A, 4) [x,y,w,h] top-left normalized,
             scores (N, gh*gw*A), classes (N, gh*gw*A)).
    """
    n, gh, gw, _ = feat.shape
    a = len(anchors)
    no = feat.shape[-1] // a  # 5 + num_classes
    feat = feat.reshape(n, gh, gw, a, no)
    gx = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1)[None, :, :, None]
    gy = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0)[None, :, :, None]
    cx = (gx + jax.nn.sigmoid(feat[..., 0])) / gw
    cy = (gy + jax.nn.sigmoid(feat[..., 1])) / gh
    anchors_np = np.asarray(anchors, np.float32)  # (A, 2)
    net_h, net_w = net_hw
    bw = jnp.exp(feat[..., 2]) * anchors_np[:, 0] / net_w
    bh = jnp.exp(feat[..., 3]) * anchors_np[:, 1] / net_h
    obj = jax.nn.sigmoid(feat[..., 4])
    cls_logits = feat[..., 5:]
    cls_prob = jax.nn.sigmoid(jnp.max(cls_logits, axis=-1))
    cls_id = jnp.argmax(cls_logits, axis=-1)
    scores = obj * cls_prob
    boxes = jnp.stack([cx - bw / 2, cy - bh / 2, bw, bh], axis=-1)
    flat = lambda t: t.reshape(n, gh * gw * a, *t.shape[4:])
    return flat(boxes), flat(scores), flat(cls_id)


def nms_fixed(boxes, scores, classes, iou_threshold, score_threshold, max_det):
    """Static-shape class-aware NMS on the top `max_det` candidates.

    Greedy suppression identical in effect to Nms() at yololayer.cpp:73-110
    (sort by score; suppress same-class boxes with IoU > threshold).
    Operates on a single sample; vmap over batch.
    """
    scores = jnp.where(scores >= score_threshold, scores, 0.0)
    if scores.shape[0] < max_det:
        # fewer candidates than max_det (tiny inputs): pad with empties so
        # the (max_det, 6) output shape stays static
        pad = max_det - scores.shape[0]
        scores = jnp.pad(scores, (0, pad))
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        classes = jnp.pad(classes, (0, pad))
    top_scores, idx = jax.lax.top_k(scores, max_det)
    top_boxes = boxes[idx]
    top_classes = classes[idx]

    x0, y0 = top_boxes[:, 0], top_boxes[:, 1]
    x1, y1 = x0 + top_boxes[:, 2], y0 + top_boxes[:, 3]
    area = top_boxes[:, 2] * top_boxes[:, 3]

    ix0 = jnp.maximum(x0[:, None], x0[None, :])
    iy0 = jnp.maximum(y0[:, None], y0[None, :])
    ix1 = jnp.minimum(x1[:, None], x1[None, :])
    iy1 = jnp.minimum(y1[:, None], y1[None, :])
    iw = jnp.maximum(ix1 - ix0, 0.0)
    ih = jnp.maximum(iy1 - iy0, 0.0)
    inter = iw * ih
    iou = inter / (area[:, None] + area[None, :] - inter + 1e-9)
    same_class = top_classes[:, None] == top_classes[None, :]
    overlap = (iou > iou_threshold) & same_class

    def body(i, keep):
        # Suppress j>i overlapping with a kept i (rows are score-sorted).
        suppress = overlap[i] & (jnp.arange(max_det) > i) & keep[i]
        return keep & ~suppress

    keep = jnp.ones((max_det,), bool) & (top_scores > 0)
    keep = jax.lax.fori_loop(0, max_det, body, keep)
    out_scores = jnp.where(keep, top_scores, 0.0)
    return jnp.concatenate(
        [top_classes[:, None].astype(jnp.float32), out_scores[:, None], top_boxes],
        axis=-1,
    )


@register("YOLO", "Yolo", "YoloDetection")
class YOLO(OpDef):
    """Multi-scale YOLO head. Inputs: one feature map per grid scale
    (coarse first, matching YOLOGridScale = {32, 16})."""

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        n = in_specs[0].n
        max_det = int(node.attr("max_detections", 100))
        return in_specs[0].with_shape((n, max_det, 6))

    def run(self, node: Node, xs: List, ctx: RunCtx):
        anchors = node.attr("anchors", YOLOV3_TINY_ANCHORS)
        masks = node.attr("masks", YOLOV3_TINY_MASKS)
        num_classes = int(node.attr("num_classes", 1))
        net_hw = node.attr("net_hw", (416, 416))
        iou_t = float(node.attr("iou_threshold", 0.45))
        score_t = float(node.attr("score_threshold", 0.35))
        max_det = int(node.attr("max_detections", 100))

        all_boxes, all_scores, all_classes = [], [], []
        for feat, mask in zip(xs, masks):
            sub_anchors = [anchors[m] for m in mask]
            b, s, c = decode_grid(
                feat.astype(jnp.float32), sub_anchors, net_hw, num_classes
            )
            all_boxes.append(b)
            all_scores.append(s)
            all_classes.append(c)
        boxes = jnp.concatenate(all_boxes, axis=1)
        scores = jnp.concatenate(all_scores, axis=1)
        classes = jnp.concatenate(all_classes, axis=1)
        return jax.vmap(
            lambda bb, ss, cc: nms_fixed(bb, ss, cc, iou_t, score_t, max_det)
        )(boxes, scores, classes)


def encode_grid(gts, gh: int, gw: int, anchors, net_hw, num_classes: int,
                obj_logit: float = 8.0, bg_logit: float = -12.0) -> np.ndarray:
    """Inverse of decode_grid, for end-to-end validation: synthesize a
    feature map whose decode yields exactly `gts`.

    gts: per-image list of rows [class, x, y, w, h] (top-left, normalized —
    the mAP ground-truth format in utils/metrics.py). Each box is written
    into its center cell with the best-matching anchor; all other cells
    carry obj=bg_logit (score ~ 0). The reference validates its CPU YOLO
    head the same way — hand-built features with known boxes
    (yololayer.cpp decode at :113-175).
    """
    a = len(anchors)
    no = 5 + num_classes
    n = len(gts)
    net_h, net_w = net_hw
    feat = np.zeros((n, gh, gw, a, no), np.float32)
    feat[..., 4] = bg_logit
    feat[..., 5:] = bg_logit

    def logit(p):
        p = np.clip(p, 1e-4, 1 - 1e-4)
        return float(np.log(p / (1 - p)))

    for i, rows in enumerate(gts):
        for cls, x, y, w, h in rows:
            cx, cy = x + w / 2, y + h / 2
            gx = min(int(cx * gw), gw - 1)
            gy = min(int(cy * gh), gh - 1)
            # best anchor by log-ratio distance in (w, h)
            d = [
                abs(np.log(w * net_w / aw)) + abs(np.log(h * net_h / ah))
                for aw, ah in anchors
            ]
            ai = int(np.argmin(d))
            aw, ah = anchors[ai]
            cell = feat[i, gy, gx, ai]
            cell[0] = logit(cx * gw - gx)
            cell[1] = logit(cy * gh - gy)
            cell[2] = float(np.log(w * net_w / aw))
            cell[3] = float(np.log(h * net_h / ah))
            cell[4] = obj_logit
            cell[5:] = -obj_logit
            cell[5 + int(cls)] = obj_logit
    return feat.reshape(n, gh, gw, a * no)
