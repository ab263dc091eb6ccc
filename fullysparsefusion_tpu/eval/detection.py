"""Self-contained nuScenes-protocol detection metrics.

The reference delegates evaluation to the nuScenes devkit / av2 API
(argo2_dataset.py:429-511); neither ships in this environment, so the
framework carries its own implementation of the published protocol
(nuscenes-devkit eval/detection/{algo,evaluate}.py semantics):

  * per-class range filtering: GT and predictions beyond the class's ego
    range (50 m vehicles / 40 m pedestrian+bikes / 30 m cone+barrier) are
    dropped before matching (devkit ``filter_eval_boxes``);
  * matching: per class, predictions sorted by score greedily match the
    nearest unmatched GT by BEV *center distance* under thresholds
    {0.5, 1, 2, 4} m — not IoU;
  * AP: 101-point interpolated precision with recall/precision clipped
    below 0.1, no monotone envelope (devkit ``calc_ap``);
  * TP metrics at the 2.0 m threshold (devkit ``calc_tp``): the cumulative
    mean of each error over confidence-ranked matches, interpolated onto the
    recall axis and averaged over [0.1, max_recall]. ATE (BEV translation),
    ASE (1 − aligned 3D IoU), AOE (yaw diff; period π for barrier; skipped
    for traffic_cone), AVE (velocity L2; skipped for cone+barrier);
  * NDS = (5·mAP + Σ_tp max(0, 1 − err/norm)) / (5 + n_tp). AAE (attribute
    error, 1 − classification accuracy over matches) participates when
    records carry attribute ids for BOTH predictions and GT; the standard
    mmdet3d velocity heuristic that synthesizes prediction attributes is
    ``default_attributes``. Without GT attributes (the plain mmdet3d info
    pickles don't store them) AAE is excluded from the denominator rather
    than faked.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
# nuScenes normalizers for TP errors
TP_NORMS = {"ate": 0.5, "ase": 0.5, "aoe": np.pi / 2, "ave": 1.0, "aae": 1.0}

# devkit attribute vocabulary; ids index this tuple
ATTRIBUTES = (
    "cycle.with_rider", "cycle.without_rider", "pedestrian.moving",
    "pedestrian.standing", "pedestrian.sitting_lying_down",
    "vehicle.moving", "vehicle.parked", "vehicle.stopped",
)
ATTR_ID = {n: i for i, n in enumerate(ATTRIBUTES)}
# classes with no attributes (devkit skips AAE for them)
NO_ATTR_CLASSES = ("traffic_cone", "barrier")
# mmdet3d NuScenesDataset.DefaultAttribute
DEFAULT_ATTR = {
    "car": "vehicle.parked", "pedestrian": "pedestrian.moving",
    "trailer": "vehicle.parked", "truck": "vehicle.parked",
    "bus": "vehicle.moving", "motorcycle": "cycle.without_rider",
    "construction_vehicle": "vehicle.parked",
    "bicycle": "cycle.without_rider",
}
_VEHICLES = ("car", "construction_vehicle", "bus", "truck", "trailer")


def default_attributes(
    boxes: np.ndarray, labels: np.ndarray, class_names: Sequence[str],
    speed_thresh: float = 0.2,
) -> np.ndarray:
    """mmdet3d ``_format_bbox`` attribute heuristic → attr ids (−1 = none).

    Moving vehicles (BEV speed > 0.2 m/s) → 'vehicle.moving'; moving
    cycles → 'cycle.with_rider'; otherwise the class default.
    """
    out = np.full(len(labels), -1, np.int32)
    speed = (np.hypot(boxes[:, 7], boxes[:, 8])
             if boxes.shape[1] >= 9 else np.zeros(len(labels)))
    for i, (l, s) in enumerate(zip(labels, speed)):
        name = class_names[int(l)] if 0 <= int(l) < len(class_names) else ""
        if name in NO_ATTR_CLASSES or name not in DEFAULT_ATTR:
            continue
        if s > speed_thresh:
            attr = ("vehicle.moving" if name in _VEHICLES
                    else "cycle.with_rider" if name in ("bicycle", "motorcycle")
                    else DEFAULT_ATTR[name])
        else:
            attr = DEFAULT_ATTR[name]
        out[i] = ATTR_ID[attr]
    return out
# devkit class_range (eval/detection/configs/detection_cvpr_2019.json)
CLASS_RANGES = {
    "car": 50.0, "truck": 50.0, "bus": 50.0, "trailer": 50.0,
    "construction_vehicle": 50.0, "pedestrian": 40.0, "motorcycle": 40.0,
    "bicycle": 40.0, "traffic_cone": 30.0, "barrier": 30.0,
}
DEFAULT_RANGE = 50.0


@dataclass
class DetectionRecord:
    """One sample's detections + ground truth (arrays, box layout [x,y,z_b,
    dx,dy,dz,yaw(,vx,vy)], ego at the origin of the frame)."""

    boxes: np.ndarray
    scores: np.ndarray
    labels: np.ndarray
    gt_boxes: np.ndarray
    gt_labels: np.ndarray
    # optional attribute ids (index into ATTRIBUTES, −1 = none); AAE joins
    # the TP metrics only when both sides are present
    attrs: Optional[np.ndarray] = None
    gt_attrs: Optional[np.ndarray] = None


def _aligned_iou_3d(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of two boxes after aligning centers and yaw (nuScenes ASE)."""
    inter = np.prod(np.minimum(a[3:6], b[3:6]))
    union = np.prod(a[3:6]) + np.prod(b[3:6]) - inter
    return float(inter / max(union, 1e-9))


def _yaw_diff(a: float, b: float, period: float = 2 * np.pi) -> float:
    d = abs(a - b) % period
    return min(d, period - d)


def _accumulate_class(
    records: Sequence[DetectionRecord], cls: int, dist_th: float,
    class_name: str = "",
):
    """Greedy score-ordered matching for one (class, threshold).

    Returns (ap, match_errors, match_recall) where the error lists are in
    confidence order (devkit ``accumulate``), or None when the class has no
    GT in range.
    """
    max_range = CLASS_RANGES.get(class_name, DEFAULT_RANGE)
    preds = []  # (score, sample_idx, box, pred attr id)
    n_gt = 0
    gts, gidxs, gattrs = [], [], []
    for si, r in enumerate(records):
        m = r.labels == cls
        pa = (r.attrs[m] if r.attrs is not None
              else np.full(int(m.sum()), -1, np.int32))
        for b, s, a in zip(r.boxes[m], r.scores[m], pa):
            if np.hypot(b[0], b[1]) <= max_range:  # devkit range filter
                preds.append((float(s), si, b, int(a)))
        gm = r.gt_labels == cls
        gt = r.gt_boxes[gm]
        ga = (r.gt_attrs[gm] if r.gt_attrs is not None
              else np.full(int(gm.sum()), -1, np.int32))
        in_range = np.hypot(gt[:, 0], gt[:, 1]) <= max_range if len(gt) else np.zeros(0, bool)
        gts.append(gt[in_range])
        gidxs.append(np.where(gm)[0][in_range])
        gattrs.append(np.asarray(ga)[in_range])
        n_gt += int(in_range.sum())
    if n_gt == 0:
        return None
    metrics = ("ate", "ase", "aoe", "ave", "aae")
    if not preds:
        return 0.0, {k: ([], []) for k in metrics}
    preds.sort(key=lambda x: -x[0])
    taken = [set() for _ in records]
    tp, fp = [], []
    # each metric: (values, recall level at its own match events) — AOE/AVE/
    # AAE skip classes/boxes, so recalls are tracked per metric
    errs = {k: ([], []) for k in metrics}

    def push(key, val, rec):
        errs[key][0].append(val)
        errs[key][1].append(rec)

    aoe_period = np.pi if class_name == "barrier" else 2 * np.pi
    n_tp = 0
    for score, si, box, pattr in preds:
        gt = gts[si]
        gidx = gidxs[si]
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
            n_tp += 1
            rec = n_tp / n_gt
            g = gt[best]
            push("ate", best_d, rec)
            push("ase", 1.0 - _aligned_iou_3d(box, g), rec)
            if class_name != "traffic_cone":
                push("aoe", _yaw_diff(float(box[6]), float(g[6]), aoe_period), rec)
            if (class_name not in ("traffic_cone", "barrier")
                    and len(box) >= 9 and len(g) >= 9):
                push("ave", float(np.hypot(box[7] - g[7], box[8] - g[8])), rec)
            gattr = int(gattrs[si][best]) if len(gattrs[si]) else -1
            if (class_name not in NO_ATTR_CLASSES
                    and pattr >= 0 and gattr >= 0):
                # devkit attr_acc: 1 − accuracy over matches
                push("aae", 0.0 if pattr == gattr else 1.0, rec)
        else:
            tp.append(0.0)
            fp.append(1.0)
    tp = np.cumsum(tp)
    fp = np.cumsum(fp)
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1e-9)
    # nuScenes AP (devkit calc_ap): 101-point raw interpolated precision,
    # recall and precision clipped below 0.1, no monotone envelope.
    rec_interp = np.linspace(0, 1, 101)
    prec_at = np.interp(rec_interp, recall, precision, right=0)
    mask = rec_interp >= MIN_RECALL
    ap = float(np.mean(np.clip(prec_at[mask] - MIN_PRECISION, 0, 1)) / (1 - MIN_PRECISION))
    return ap, errs


def _tp_error(metric_vals: List[float], metric_recall: List[float]) -> float:
    """devkit ``calc_tp``: cumulative-mean error over confidence-ranked
    matches, interpolated onto the recall axis, averaged over
    [MIN_RECALL, max_recall]."""
    if not metric_vals:
        return np.nan
    v = np.asarray(metric_vals, np.float64)
    r = np.asarray(metric_recall, np.float64)
    cummean = np.cumsum(v) / np.arange(1, len(v) + 1)
    max_recall = float(r[-1])
    if max_recall <= MIN_RECALL:
        return 1.0  # devkit convention: no recall past min ⇒ error 1
    rec_interp = np.linspace(0, 1, 101)
    sel = (rec_interp >= MIN_RECALL) & (rec_interp <= max_recall)
    if not sel.any():
        return 1.0
    interp = np.interp(rec_interp[sel], r, cummean)
    return float(np.mean(interp))


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
        cname = class_names[c]
        aps = {}
        tp_errs = None
        for th in DIST_THRESHOLDS:
            out = _accumulate_class(records, c, th, cname)
            if out is None:
                continue
            ap, errs = out
            aps[th] = ap
            if th == TP_THRESHOLD:
                tp_errs = {
                    k: _tp_error(vals, recs) for k, (vals, recs) in errs.items()
                }
        if aps:
            ap_table[cname] = aps
            if tp_errs:
                tp_table[cname] = tp_errs

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
    # full precision — golden-vector tests assert these at 1e-6; consumers
    # round for display
    return {
        "mAP": mean_ap,
        "NDS": float(nds),
        "tp_errors": dict(agg_tp),
        "per_class": {
            k: {"AP": float(np.mean(list(v.values())))}
            for k, v in ap_table.items()
        },
    }
