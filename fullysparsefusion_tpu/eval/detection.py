"""Self-contained nuScenes-protocol detection metrics.

The reference delegates evaluation to the nuScenes devkit / av2 API
(argo2_dataset.py:429-511); neither ships in this environment, so the
framework carries its own implementation of the published protocol:

  * matching: per class, predictions sorted by score greedily match the
    nearest unmatched GT by BEV *center distance* under thresholds
    {0.5, 1, 2, 4} m (nuScenes) — not IoU;
  * AP: normalized area under the precision-recall curve for
    recall/precision > 0.1 (nuScenes clipping convention);
  * TP metrics at the 2.0 m threshold: ATE (BEV translation), ASE
    (1 − aligned 3D IoU), AOE (min yaw diff), AVE (velocity L2);
  * NDS = (5·mAP + Σ_tp max(0, 1 − err/norm)) / (5 + n_tp). AAE needs
    attribute predictions the model doesn't produce; it is excluded from
    the denominator rather than faked.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD = 2.0
# nuScenes normalizers for TP errors
TP_NORMS = {"ate": 0.5, "ase": 0.5, "aoe": np.pi / 2, "ave": 1.0}


@dataclass
class DetectionRecord:
    """One sample's detections + ground truth (arrays, box layout [x,y,z_b,
    dx,dy,dz,yaw(,vx,vy)])."""

    boxes: np.ndarray
    scores: np.ndarray
    labels: np.ndarray
    gt_boxes: np.ndarray
    gt_labels: np.ndarray


def _aligned_iou_3d(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of two boxes after aligning centers and yaw (nuScenes ASE)."""
    inter = np.prod(np.minimum(a[3:6], b[3:6]))
    union = np.prod(a[3:6]) + np.prod(b[3:6]) - inter
    return float(inter / max(union, 1e-9))


def _yaw_diff(a: float, b: float) -> float:
    d = abs(a - b) % (2 * np.pi)
    return min(d, 2 * np.pi - d)


def _accumulate_class(
    records: Sequence[DetectionRecord], cls: int, dist_th: float
):
    """Greedy score-ordered matching for one (class, threshold)."""
    preds = []  # (score, sample_idx, box)
    n_gt = 0
    for si, r in enumerate(records):
        m = r.labels == cls
        for b, s in zip(r.boxes[m], r.scores[m]):
            preds.append((float(s), si, b))
        n_gt += int((r.gt_labels == cls).sum())
    if n_gt == 0:
        return None
    if not preds:
        return 0.0, {"ate": [], "ase": [], "aoe": [], "ave": []}
    preds.sort(key=lambda x: -x[0])
    taken = [set() for _ in records]
    tp, fp = [], []
    errs = {"ate": [], "ase": [], "aoe": [], "ave": []}
    for score, si, box in preds:
        r = records[si]
        gm = r.gt_labels == cls
        gt = r.gt_boxes[gm]
        gidx = np.where(gm)[0]
        best, best_d = -1, dist_th
        for j in range(len(gt)):
            if gidx[j] in taken[si]:
                continue
            d = float(np.hypot(box[0] - gt[j, 0], box[1] - gt[j, 1]))
            if d < best_d:
                best, best_d = j, d
        if best >= 0:
            taken[si].add(gidx[best])
            tp.append(1.0)
            fp.append(0.0)
            g = gt[best]
            errs["ate"].append(best_d)
            errs["ase"].append(1.0 - _aligned_iou_3d(box, g))
            errs["aoe"].append(_yaw_diff(float(box[6]), float(g[6])))
            if len(box) >= 9 and len(g) >= 9:
                errs["ave"].append(float(np.hypot(box[7] - g[7], box[8] - g[8])))
        else:
            tp.append(0.0)
            fp.append(1.0)
    tp = np.cumsum(tp)
    fp = np.cumsum(fp)
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1e-9)
    # nuScenes AP: 101-point interpolation, clipped below 0.1 recall/precision
    rec_interp = np.linspace(0, 1, 101)
    prec_at = np.interp(rec_interp, recall, precision, right=0)
    prec_at = np.maximum.accumulate(prec_at[::-1])[::-1]  # monotone envelope
    mask = rec_interp >= 0.1
    ap = float(np.mean(np.clip(prec_at[mask] - 0.1, 0, 1)) / 0.9)
    return ap, errs


def evaluate_detections(
    records: Sequence[DetectionRecord],
    num_classes: int,
    class_names: Optional[Sequence[str]] = None,
) -> Dict:
    """nuScenes-protocol mAP + TP metrics + NDS over a result set."""
    class_names = class_names or [str(i) for i in range(num_classes)]
    ap_table: Dict[str, Dict[float, float]] = {}
    tp_table: Dict[str, Dict[str, float]] = {}
    for c in range(num_classes):
        aps = {}
        tp_errs = None
        for th in DIST_THRESHOLDS:
            out = _accumulate_class(records, c, th)
            if out is None:
                continue
            ap, errs = out
            aps[th] = ap
            if th == TP_THRESHOLD:
                tp_errs = {
                    k: float(np.mean(v)) if v else np.nan for k, v in errs.items()
                }
        if aps:
            ap_table[class_names[c]] = aps
            if tp_errs:
                tp_table[class_names[c]] = tp_errs

    if not ap_table:
        return {"mAP": 0.0, "NDS": 0.0, "per_class": {}}

    mean_ap = float(np.mean([np.mean(list(a.values())) for a in ap_table.values()]))
    tp_scores = []
    agg_tp: Dict[str, float] = {}
    for metric, norm in TP_NORMS.items():
        vals = [
            t[metric] for t in tp_table.values()
            if metric in t and not np.isnan(t[metric])
        ]
        if vals:
            err = float(np.mean(vals))
            agg_tp[metric.upper()] = err
            tp_scores.append(max(0.0, 1.0 - err / norm))
    nds = (5 * mean_ap + sum(tp_scores)) / (5 + len(tp_scores))
    return {
        "mAP": round(mean_ap, 4),
        "NDS": round(float(nds), 4),
        "tp_errors": {k: round(v, 4) for k, v in agg_tp.items()},
        "per_class": {
            k: {"AP": round(float(np.mean(list(v.values()))), 4)}
            for k, v in ap_table.items()
        },
    }
