"""Golden-vector eval tests: hand-computed expected metric NUMBERS.

tests/test_eval.py checks protocol *behavior* (perfect→1, garbage→0,
conditional terms); this file pins exact VALUES for scenes small enough to
evaluate by hand, so a regression in matching order, interpolation, range
gates, cummean, or the NDS/CDS composites changes a number, not just a
trend. Every constant below is derived in the comments DIRECTLY from the
published devkit formulas (external provenance — transcribed from
nuscenes-devkit eval/detection/algo.py + evaluate.py; av2
evaluation.detection), independent of the implementation's code path:

  calc_ap   = mean(clip(prec[round(100·0.1)+1:] − 0.1, 0)) / 0.9
              (bins 11..100 — the 0.10 bin EXCLUDED, 90 values)
  calc_tp   = mean(err[11 : max_recall_ind+1]); 1.0 if max_recall_ind < 11,
              where err is the NaN-aware cummean over confidence-ranked
              matches resampled BY CONFIDENCE onto the 101-bin grid:
              np.interp(conf[::-1], match_conf[::-1], cummean[::-1])[::-1]
  NDS       = (5·mAP + Σ_m clip(1 − tp_err_m, 0, 1)) / (5 + n_metrics)
              — NO error normalizers (nuScenes paper eq. 2: 1 − min(1, err))

(The pre-round-4 versions of these tests encoded three protocol drifts —
91-bin AP averages, error curves interpolated on the recall axis, and
invented /0.5-style NDS normalizers — all fixed with this file.)

Devkit interpolation facts the derivations rely on (np.interp semantics,
which both the devkit and this implementation use verbatim):
  * queries below the first recall point return the first precision;
  * queries strictly between duplicate x anchors use the FIRST duplicate's
    y as the right anchor and the LAST duplicate's y as the left anchor;
  * queries beyond the last recall return 0 (right=0).
The 101-point grid is np.linspace(0, 1, 101); scenes use n_gt = 2 or 3 so
no recall value except 1.0 ever coincides with a grid point (1/3 and 2/3
fall strictly between grid points; 0.5 only occurs with all-TP curves
where both anchors agree).
"""
import numpy as np

from fullysparsefusion_tpu.eval.detection import (
    DetectionRecord, evaluate_detections, ATTR_ID,
)
from fullysparsefusion_tpu.eval.av2_detection import evaluate_av2

NUSC_CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)


def _grid(lo=0.1):
    r = np.linspace(0, 1, 101)
    return r[r >= lo]


def _box(x, y, z=0.0, dx=4.0, dy=2.0, dz=1.5, yaw=0.0, vx=0.0, vy=0.0, n=9):
    return np.asarray([x, y, z, dx, dy, dz, yaw, vx, vy][:n], np.float32)


def test_nusc_perfect_two_car_scene():
    """2 GT cars, 2 exact-size/yaw/vel predictions at d = 0.2 and 0.4 m.

    AP = 1 at every threshold (precision 1 at all recalls; after the 0.1
    clip (1−0.1)/0.9 = 1 per bin, 90 bins).
    ATE: match distances [0.2, 0.4] at confidences [0.9, 0.8], recall
    anchors [0.5, 1.0] → cummean [0.2, 0.3]. conf_i(r) = 0.9 for r ≤ 0.5,
    then linear to 0.8 at r = 1. Resampling cummean by confidence:
    err(c) = 0.3 − (c − 0.8) on [0.8, 0.9] ⇒ err(r) = 0.1 + 0.2r for
    r ∈ [0.5, 1], 0.2 below. max_recall_ind = 100 (conf_i(1) = 0.8 ≠ 0).
        calc_tp = [40·0.2 + Σ_{k=51..100}(0.1 + 0.002k)]/90
                = [8 + 5 + 0.2·37.75]/90 = 20.55/90 = 137/600.
    ASE = AOE = AVE = 0 (exact sizes/yaws/velocities); no attributes →
    AAE absent (documented deviation — devkit data always has attrs).
    NDS = (5·1 + (1 − 137/600) + 1 + 1 + 1)/9 = (9 − 137/600)/9
        = 5263/5400.
    """
    car = NUSC_CLASSES.index("car")
    gt = np.stack([_box(0, 0), _box(10, 0)])
    pred = np.stack([_box(0.2, 0), _box(10, 0.4)])
    rec = DetectionRecord(
        boxes=pred, scores=np.asarray([0.9, 0.8], np.float32),
        labels=np.asarray([car, car]), gt_boxes=gt,
        gt_labels=np.asarray([car, car]),
    )
    m = evaluate_detections([rec], len(NUSC_CLASSES), NUSC_CLASSES)
    ate = 137 / 600  # = 0.2283333333...
    np.testing.assert_allclose(m["mAP"], 1.0, atol=1e-9)
    np.testing.assert_allclose(m["per_class"]["car"]["AP"], 1.0, atol=1e-9)
    np.testing.assert_allclose(m["tp_errors"]["ATE"], ate, atol=1e-9)
    np.testing.assert_allclose(m["tp_errors"]["ASE"], 0.0, atol=1e-9)
    np.testing.assert_allclose(m["tp_errors"]["AOE"], 0.0, atol=1e-9)
    np.testing.assert_allclose(m["tp_errors"]["AVE"], 0.0, atol=1e-9)
    assert "AAE" not in m["tp_errors"]
    np.testing.assert_allclose(m["NDS"], 5263 / 5400, atol=1e-9)
    assert abs(5263 / 5400 - 0.9746296296) < 1e-9  # lock the arithmetic


def test_nusc_pedestrian_fp_range_gate_scene():
    """3 in-range pedestrian GT (0,0), (5,0), (38,0) + one at (45,0) past
    the 40 m pedestrian gate (dropped ⇒ n_gt = 3). Predictions by score:
      p1 0.95 (0.3, 0)  → TP d=0.3 at every threshold
      p2 0.85 (50, 0)   → beyond 40 m, dropped before matching
      p3 0.80 (5, 1.2)  → d=1.2: TP @2,4; FP @0.5,1
      p4 0.70 (20, 0)   → nearest unmatched GT ≥ 15 m: FP everywhere
      p5 0.60 (38, 0.6) → d=0.6: TP @1,2,4; FP @0.5
    Sizes/yaws/velocities match exactly → ASE = AOE = AVE = 0.

    AP@0.5: recalls [1/3,1/3,1/3,1/3], precisions [1,.5,1/3,.25]; grid
      bins 11..33 (23 bins) take the left extension 1.0, r > 1/3 → 0
      (right=0).  calc_ap = 23·0.9/(90·0.9) = 23/90.
    AP@1: recalls [1/3,1/3,1/3,2/3], prec [1,.5,1/3,.5]; 23 bins of 1.0,
      then bins 34..66 (33 bins) between (1/3, 1/3) and (2/3, 1/2):
      v = 1/3 + (r−1/3)/2, Σ(v−0.1) = 33·7/30 + Σ(r−1/3)/2 = 7.7 + 2.75;
      r ≥ 0.67 → 0.  AP = (23·0.9 + 10.45)/81 = 31.15/81.
    AP@2 = AP@4: recalls [1/3,2/3,2/3,1], prec [1,1,2/3,3/4]; 56 bins of
      1.0 (left extension + flat between (1/3,1) and (2/3,1)), then
      bins 67..100 (34 bins) between (2/3, 2/3) and (1, 3/4):
      v = 2/3 + (r−2/3)/4, Σ(v−0.1) = 34·17/30 + (1717/300)/4 = 20.6975.
      AP = (56·0.9 + 20.6975)/81 = 71.0975/81.
    ATE@2 (resampled BY CONFIDENCE, devkit accumulate): match distances
      [0.3, 1.2, 0.6] at confs [.95, .8, .6] → cummean [0.3, 0.75, 0.7];
      conf anchors at recalls [1/3, 2/3, 2/3, 1] with values
      [.95, .8, .7, .6] give conf_i(r) = .95 − .45(r−1/3) on (1/3, 2/3]
      (right anchor = FIRST duplicate .8) and .7 − .3(r−2/3) on (2/3, 1]
      (left anchor = LAST duplicate .7). err(c) piecewise over ascending
      match confs [.6, .8, .95] ↦ [0.7, 0.75, 0.3]:
      bins 11..33: c = .95 → 0.3 (23 bins, Σ 6.9);
      bins 34..66: err = 0.3 + 1.35(r−1/3), Σ = 9.9 + 1.35·5.5 = 17.325;
      bins 67..100: c ∈ [.6, .7) ⇒ err = .725 − .075(r−2/3),
        Σ = 24.65 − 0.075·(1717/300) = 24.220750.
      calc_tp = (6.9 + 17.325 + 24.220750)/90 = 48.445750/90.
      (Interpolating on the recall axis instead — the pre-round-4 drift —
      gives 24.6415 on the last band; the confidence resampling is the
      devkit's.)
    NDS = (5·mAP + (1 − ATE) + 1 + 1 + 1)/9 — no /0.5 normalizer.
    """
    ped = NUSC_CLASSES.index("pedestrian")
    kw = dict(dx=0.6, dy=0.6, dz=1.7, yaw=0.5)
    gt = np.stack([_box(0, 0, **kw), _box(5, 0, **kw), _box(38, 0, **kw),
                   _box(45, 0, **kw)])
    pred = np.stack([
        _box(0.3, 0, **kw), _box(50, 0, **kw), _box(5, 1.2, **kw),
        _box(20, 0, **kw), _box(38, 0.6, **kw),
    ])
    rec = DetectionRecord(
        boxes=pred, scores=np.asarray([0.95, 0.85, 0.80, 0.70, 0.60]),
        labels=np.full(5, ped), gt_boxes=gt, gt_labels=np.full(4, ped),
    )
    m = evaluate_detections([rec], len(NUSC_CLASSES), NUSC_CLASSES)
    ap_05 = 23 / 90
    ap_10 = 31.15 / 81
    ap_24 = 71.0975 / 81
    map_exp = (ap_05 + ap_10 + 2 * ap_24) / 4  # = 0.5989043210...
    ate = 48.445750 / 90                       # = 0.5382861111...
    np.testing.assert_allclose(m["mAP"], map_exp, atol=1e-9)
    np.testing.assert_allclose(m["tp_errors"]["ATE"], ate, atol=1e-9)
    np.testing.assert_allclose(m["tp_errors"]["ASE"], 0.0, atol=1e-9)
    np.testing.assert_allclose(m["tp_errors"]["AOE"], 0.0, atol=1e-9)
    np.testing.assert_allclose(m["tp_errors"]["AVE"], 0.0, atol=1e-9)
    nds_exp = (5 * map_exp + (1 - ate) + 3) / 9
    np.testing.assert_allclose(m["NDS"], nds_exp, atol=1e-9)
    assert abs(map_exp - 0.5989043210) < 1e-9
    assert abs(nds_exp - 0.7173594993) < 1e-9


def test_nusc_barrier_yaw_period_and_7col_boxes():
    """One barrier, one TP at d=0.1, pred yaw π−0.3 vs GT 0, pred height
    halved. Exercises: the π yaw period for barriers (AOE = min(π−0.3,
    0.3) = 0.3, NOT π−0.3), AVE skipped for barriers AND for 7-column
    boxes, no AAE for barriers.
      AP = 1 each threshold; ATE = 0.1 (constant cummean);
      ASE = 1 − (0.5·2·0.5)/(1 + 0.5 − 0.5) = 0.5.
      NDS terms are 1 − min(1, err) with NO normalizers (devkit):
      NDS = (5 + (1−0.1) + (1−0.5) + (1−0.3))/8 = 7.1/8.
    """
    bar = NUSC_CLASSES.index("barrier")
    gt = _box(0, 0, dx=0.5, dy=2.0, dz=1.0, yaw=0.0, n=7)[None]
    pred = _box(0.1, 0, dx=0.5, dy=2.0, dz=0.5, yaw=np.pi - 0.3, n=7)[None]
    rec = DetectionRecord(
        boxes=pred, scores=np.asarray([0.9]), labels=np.asarray([bar]),
        gt_boxes=gt, gt_labels=np.asarray([bar]),
    )
    m = evaluate_detections([rec], len(NUSC_CLASSES), NUSC_CLASSES)
    np.testing.assert_allclose(m["mAP"], 1.0, atol=1e-9)
    np.testing.assert_allclose(m["tp_errors"]["ATE"], 0.1, atol=1e-9)
    np.testing.assert_allclose(m["tp_errors"]["ASE"], 0.5, atol=1e-9)
    # π−0.3 round-trips through the float32 box storage (~1e-7)
    np.testing.assert_allclose(m["tp_errors"]["AOE"], 0.3, atol=1e-6)
    assert "AVE" not in m["tp_errors"] and "AAE" not in m["tp_errors"]
    nds = (5 + 0.9 + 0.5 + 0.7) / 8
    np.testing.assert_allclose(m["NDS"], nds, atol=1e-6)
    assert abs(nds - 0.8875) < 1e-9


def test_nusc_attribute_error_golden():
    """2 cars both TP at d=0.1; pred attributes [moving, parked] vs GT
    [moving, stopped] → AAE values [0, 1] at confs [0.9, 0.8], cummean
    [0, 0.5]. Resampling by confidence: conf_i(r) = 0.9 for r ≤ 0.5,
    linear to 0.8 at r = 1; err(c) = 0.5 − 5(c − 0.8) ⇒ err(r) = 0 for
    r ≤ 0.5, (r − 0.5) above. calc_tp over bins 11..100:
      AAE = Σ_{k=51..100}(0.01k − 0.5)/90 = 12.75/90.
    With attributes present the NDS denominator is 10 (no normalizers):
      NDS = (5 + (1−0.1) + 1 + 1 + 1 + (1 − 12.75/90))/10.
    """
    car = NUSC_CLASSES.index("car")
    gt = np.stack([_box(0, 0), _box(10, 0)])
    pred = np.stack([_box(0.1, 0), _box(10, 0.1)])
    rec = DetectionRecord(
        boxes=pred, scores=np.asarray([0.9, 0.8]),
        labels=np.asarray([car, car]), gt_boxes=gt,
        gt_labels=np.asarray([car, car]),
        attrs=np.asarray([ATTR_ID["vehicle.moving"], ATTR_ID["vehicle.parked"]]),
        gt_attrs=np.asarray([ATTR_ID["vehicle.moving"], ATTR_ID["vehicle.stopped"]]),
    )
    m = evaluate_detections([rec], len(NUSC_CLASSES), NUSC_CLASSES)
    aae = 12.75 / 90  # = 0.1416666666...
    np.testing.assert_allclose(m["tp_errors"]["AAE"], aae, atol=1e-9)
    np.testing.assert_allclose(m["tp_errors"]["ATE"], 0.1, atol=1e-9)
    nds = (5 + 0.9 + 3 + (1 - aae)) / 10
    np.testing.assert_allclose(m["NDS"], nds, atol=1e-9)
    assert abs(nds - 0.9758333333) < 1e-9


def test_av2_perfect_scene_3d_distance():
    """AV2 matches by 3-D euclidean distance (a pure-z offset counts,
    unlike nuScenes BEV distance) and integrates the FULL 101-point
    precision curve with no 0.1 clipping.
    2 GT, 2 TP (d = 0.3 from a z offset; d = 0 with a 0.4 yaw error):
      AP = 1 each threshold; ATE = mean(0.3, 0) = 0.15 (plain mean over
      matches — av2 has no cummean/recall interpolation); ASE = 0;
      AOE = mean(0, 0.4) = 0.2.
      CDS = 1 · mean(1−0.15/2, 1−0, 1−0.2/π).
    """
    gt = np.stack([_box(0, 0, n=7), _box(10, 0, n=7)])
    pred = np.stack([_box(0, 0, z=0.3, n=7), _box(10, 0, yaw=0.4, n=7)])
    rec = DetectionRecord(
        boxes=pred, scores=np.asarray([0.9, 0.8]),
        labels=np.zeros(2, np.int32), gt_boxes=gt,
        gt_labels=np.zeros(2, np.int32),
    )
    m = evaluate_av2([rec], 1, ("REGULAR_VEHICLE",))
    pc = m["per_class"]["REGULAR_VEHICLE"]
    np.testing.assert_allclose(pc["AP"], 1.0, atol=1e-9)
    np.testing.assert_allclose(pc["ATE"], 0.15, atol=1e-9)
    np.testing.assert_allclose(pc["ASE"], 0.0, atol=1e-9)
    np.testing.assert_allclose(pc["AOE"], 0.2, atol=1e-9)
    cds = (1 - 0.075 + 1 + 1 - 0.2 / np.pi) / 3
    np.testing.assert_allclose(m["CDS"], cds, atol=1e-9)
    assert abs(cds - 0.9537793409) < 1e-9


def test_av2_fp_and_range_gate_golden():
    """3 in-range GT (0,0), (5,0), (10,0) + one at 160 m (past the 150 m
    gate ⇒ n_gt = 3); an out-of-range prediction at 200 m is dropped.
    Predictions by score:
      p1 0.9 (0,0,z=0.4)  → TP d=0.4 everywhere
      p2 0.8 (3,4)        → nearest GT 4.47 m: FP everywhere
      p3 0.7 (5,0,z=−0.9) → d=0.9: TP @1,2,4; FP @0.5 (yaw off by 0.5)
      p4 0.6 (10,0)       → TP d=0 everywhere

    AP@0.5: recalls [1/3,1/3,1/3,2/3], prec [1,1/2,1/3,1/2]; full grid:
      r = 0.00..0.33 (34 pts) → 1.0; r = 0.34..0.66 (33 pts) between
      (1/3, 1/3) and (2/3, 1/2): v = 1/3 + (r−1/3)/2, Σ = 11 + 2.75;
      r ≥ 0.67 → 0.  AP = (34 + 13.75)/101 = 47.75/101.
    AP@1 = AP@2 = AP@4: recalls [1/3,1/3,2/3,1], prec [1,1/2,2/3,3/4];
      34 pts of 1.0; r = 0.34..0.66 between (1/3, 1/2) and (2/3, 2/3):
      v = 1/2 + (r−1/3)/2, Σ = 16.5 + 2.75 = 19.25; r = 0.67..1.00 (34
      pts) between (2/3, 2/3) and (1, 3/4): v = 2/3 + (r−2/3)/4,
      Σ = 68/3 + (1717/300)/4 = 24.0975.
      AP = (34 + 19.25 + 24.0975)/101 = 77.3475/101.
    TP errors @2 (matches p1, p3, p4): ATE = mean(0.4, 0.9, 0) = 13/30;
      ASE = 0; AOE = mean(0, 0.5, 0) = 1/6.
    """
    gt = np.stack([_box(0, 0, n=7), _box(5, 0, n=7), _box(10, 0, n=7),
                   _box(160, 0, n=7)])
    pred = np.stack([
        _box(0, 0, z=0.4, n=7), _box(3, 4, n=7),
        _box(5, 0, z=-0.9, yaw=0.5, n=7), _box(10, 0, n=7),
        _box(200, 0, n=7),
    ])
    rec = DetectionRecord(
        boxes=pred, scores=np.asarray([0.9, 0.8, 0.7, 0.6, 0.99]),
        labels=np.zeros(5, np.int32), gt_boxes=gt,
        gt_labels=np.zeros(4, np.int32),
    )
    m = evaluate_av2([rec], 1, ("REGULAR_VEHICLE",))
    pc = m["per_class"]["REGULAR_VEHICLE"]
    ap_mean = (47.75 / 101 + 3 * 77.3475 / 101) / 4  # = 0.6925556931...
    np.testing.assert_allclose(pc["AP"], ap_mean, atol=1e-9)
    np.testing.assert_allclose(pc["ATE"], 13 / 30, atol=1e-9)
    np.testing.assert_allclose(pc["ASE"], 0.0, atol=1e-9)
    np.testing.assert_allclose(pc["AOE"], 1 / 6, atol=1e-9)
    cds = ap_mean * ((1 - 13 / 60) + 1 + (1 - 1 / (6 * np.pi))) / 3
    np.testing.assert_allclose(m["CDS"], cds, atol=1e-9)
    assert abs(ap_mean - 0.6925556931) < 1e-9
