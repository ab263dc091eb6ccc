"""Write a byte-faithful MINI nuScenes info-pickle tree from the synthetic
generator — the integration proof for the real-data path (VERDICT r4 #8).

Everything else data-side is fixture-fed through simplified dicts; this tool
emits the ACTUAL mmdet3d ``create_data`` schema the reference trains from
(mmdet3d nuscenes_converter.py; consumed by the reference via the stock
``NuScenesDataset``, configs/_base_/datasets/nuscenes_dataloader.py:53-95):

  * ``{"infos": [...], "metadata": {"version": ...}}`` pickle;
  * per-info: ``lidar_path`` + ``sweeps`` (each with ``data_path``,
    ``sensor2lidar_rotation/translation``, ``timestamp`` — a real ego-motion
    chain, so the reader's sweep aggregation and remove_close run for real);
  * ``cams`` dict per camera (``sensor2lidar_rotation/translation`` +
    ``cam_intrinsic``, NO precomputed ``lidar2img`` — real pickles don't
    store it; the reader must derive it like mmdet3d's ``get_data_info``);
  * RAW category names (``vehicle.car`` …) so NUSC_CLASS_MAP runs;
  * ``gt_velocity`` with NaN rows (real pickles carry NaNs for objects
    without two annotations), ``num_lidar_pts``, ``num_radar_pts``,
    ``valid_flag``;
  * the offline 2D mask tree (PNG + anno.json) painted CONSISTENTLY with
    the camera geometry via the package's own projection math.

    python tools/make_fake_nuscenes.py --out /tmp/fake_nusc --samples 4
"""
import argparse
import os
import pickle
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RAW_NAMES = (
    "vehicle.car", "vehicle.truck", "vehicle.bus.rigid",
    "human.pedestrian.adult", "movable_object.barrier",
)
# matching mapped label ids under the default 10-class nuScenes head
MAPPED = ("car", "truck", "bus", "pedestrian", "barrier")


def _yaw_rot(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], np.float64)


def make_cams(num_cams: int, img_h: int, img_w: int, fx: float):
    """Ring cameras with REAL extrinsics: sensor2lidar rotation maps camera
    axes (x right, y down, z forward) onto lidar directions at heading
    ``yaw``; small per-camera translation off the lidar origin."""
    cams = {}
    std = ("CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
           "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT")
    for ci in range(num_cams):
        yaw = 2 * np.pi * ci / num_cams
        fwd = np.array([np.cos(yaw), np.sin(yaw), 0.0])
        right = np.array([np.sin(yaw), -np.cos(yaw), 0.0])
        down = np.array([0.0, 0.0, -1.0])
        # columns are the camera basis expressed in lidar coords
        r = np.stack([right, down, fwd], axis=1)
        t = 0.3 * fwd + np.array([0.0, 0.0, -0.2])
        intr = np.array(
            [[fx, 0.0, img_w / 2], [0.0, fx, img_h / 2], [0.0, 0.0, 1.0]],
            np.float64)
        name = std[ci] if ci < len(std) else f"CAM_EXTRA_{ci}"
        cams[name] = dict(
            data_path=f"samples/{name}/{name}_fake.jpg",
            type=name,
            sample_data_token=f"cam{ci}",
            sensor2ego_translation=t.tolist(),
            sensor2ego_rotation=[1.0, 0.0, 0.0, 0.0],
            ego2global_translation=[0.0, 0.0, 0.0],
            ego2global_rotation=[1.0, 0.0, 0.0, 0.0],
            timestamp=0,
            sensor2lidar_rotation=r,
            sensor2lidar_translation=t,
            cam_intrinsic=intr,
        )
    return cams


def make_sample(rng, n_boxes: int, extent: float):
    """Boxes + surface-ish points in the key lidar frame."""
    boxes, names, pts = [], [], []
    for _ in range(n_boxes):
        k = rng.integers(0, len(RAW_NAMES))
        wlh = dict(
            car=(4.5, 1.9, 1.6), truck=(7.0, 2.5, 2.8), bus=(11.0, 2.9, 3.2),
            pedestrian=(0.6, 0.6, 1.7), barrier=(2.0, 0.5, 1.0),
        )[MAPPED[k]]
        cx, cy = rng.uniform(-extent, extent, 2)
        if np.hypot(cx, cy) < 3:
            cx += 5.0
        z = rng.uniform(-1.8, -1.0)
        yaw = rng.uniform(-np.pi, np.pi)
        boxes.append([cx, cy, z, wlh[0], wlh[1], wlh[2], yaw])
        names.append(RAW_NAMES[k])
        n = int(rng.integers(30, 120))
        local = rng.uniform(-0.5, 0.5, (n, 3)) * np.array(wlh)
        rot = _yaw_rot(yaw)
        pts.append(local @ rot.T + [cx, cy, z])
    ground = np.stack([
        rng.uniform(-extent, extent, 2000),
        rng.uniform(-extent, extent, 2000),
        rng.normal(-1.9, 0.05, 2000),
    ], 1)
    xyz = np.concatenate(pts + [ground]).astype(np.float32)
    feats = rng.random((len(xyz), 2)).astype(np.float32)  # intensity, ring
    return (np.asarray(boxes, np.float32), names,
            np.concatenate([xyz, feats], 1).astype(np.float32))


def write_dataset(root: str, n_samples: int = 4, n_sweeps: int = 2,
                  num_cams: int = 6, img_h: int = 128, img_w: int = 224,
                  fx: float = 80.0, n_boxes: int = 6, extent: float = 30.0,
                  seed: int = 0, version: str = "v1.0-mini"):
    from generate_masks import paint_sample, save_sample
    from fullysparsefusion_tpu.data.nuscenes import lidar2img_from_cams

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "samples", "LIDAR_TOP"), exist_ok=True)
    os.makedirs(os.path.join(root, "sweeps", "LIDAR_TOP"), exist_ok=True)
    mask_dir = os.path.join(root, "masks")
    cams = make_cams(num_cams, img_h, img_w, fx)
    l2i = lidar2img_from_cams(cams)
    name_to_cls = {n: i for i, n in enumerate(
        ("car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
         "motorcycle", "bicycle", "pedestrian", "traffic_cone"))}

    infos = []
    for i in range(n_samples):
        boxes, names, pts = make_sample(rng, n_boxes, extent)
        key_rel = f"samples/LIDAR_TOP/key_{i:03d}.bin"
        pts.tofile(os.path.join(root, key_rel))
        key_ts = 1_600_000_000_000_000 + i * 500_000

        # past sweeps: ego moved backwards; sweep points stored in the
        # SENSOR frame so sensor2lidar_{rotation,translation} really runs
        sweeps = []
        for s in range(n_sweeps):
            dt_us = (s + 1) * 50_000
            yaw = 0.02 * (s + 1)
            r = _yaw_rot(yaw)
            t = np.array([-0.5 * (s + 1), 0.05 * (s + 1), 0.0])
            sub = pts[rng.random(len(pts)) < 0.6].copy()
            sub[:, :3] = (sub[:, :3] - t) @ r  # inverse of xyz @ r.T + t
            # near-ego returns that remove_close must drop
            close = np.concatenate([
                rng.uniform(-0.9, 0.9, (25, 2)),
                rng.uniform(-1.5, 0.0, (25, 1)),
                rng.random((25, 2)),
            ], 1).astype(np.float32)
            sw_pts = np.concatenate([sub, close]).astype(np.float32)
            sw_rel = f"sweeps/LIDAR_TOP/sweep_{i:03d}_{s}.bin"
            sw_pts.tofile(os.path.join(root, sw_rel))
            sweeps.append(dict(
                data_path=sw_rel,
                type="lidar",
                sample_data_token=f"sw{i}_{s}",
                sensor2ego_translation=[0.9, 0.0, 1.8],
                sensor2ego_rotation=[1.0, 0.0, 0.0, 0.0],
                ego2global_translation=t.tolist(),
                ego2global_rotation=[1.0, 0.0, 0.0, 0.0],
                timestamp=key_ts - dt_us,
                sensor2lidar_rotation=r,
                sensor2lidar_translation=t,
            ))

        # 2D masks consistent with the camera geometry (same projection
        # convention as ops/projection.py: homogeneous @ lidar2img.T)
        token = f"faketok{i:03d}"
        dets = []
        pts4 = np.concatenate(
            [boxes[:, :3], np.ones((len(boxes), 1), np.float32)], 1)
        proj = np.einsum("nd,ckd->cnk", pts4, l2i)      # [C, N, 4]
        depth = proj[..., 2]
        uv = proj[..., :2] / np.maximum(depth[..., None], 1e-3)
        in_img = (
            (depth > 1e-3) & (uv[..., 0] >= 0) & (uv[..., 0] < img_w)
            & (uv[..., 1] >= 0) & (uv[..., 1] < img_h)
        )
        for bi in range(len(boxes)):
            for ci in range(num_cams):
                if not in_img[ci, bi]:
                    continue
                u, v = uv[ci, bi]
                half = max(6, int(fx * boxes[bi, 4] / max(depth[ci, bi], 1)))
                m = np.zeros((img_h, img_w), bool)
                m[max(int(v) - half, 0):int(v) + half,
                  max(int(u) - half, 0):int(u) + half] = True
                dets.append(dict(
                    cam_id=ci, category=name_to_cls[
                        dict(zip(RAW_NAMES, MAPPED))[names[bi]]],
                    score=float(rng.uniform(0.6, 0.95)),
                    bbox=[int(u) - half, int(v) - half,
                          int(u) + half, int(v) + half],
                    mask=m))
        masks, annos = paint_sample(dets, num_cams, 10, (img_h, img_w))
        save_sample(mask_dir, token, masks, annos)

        vel = rng.uniform(-3, 3, (len(boxes), 2)).astype(np.float64)
        if len(vel):
            vel[0] = np.nan  # real pickles carry NaN velocities
        infos.append(dict(
            lidar_path=key_rel,
            token=token,
            sweeps=sweeps,
            cams=cams,
            lidar2ego_translation=[0.9, 0.0, 1.8],
            lidar2ego_rotation=[0.7, 0.0, 0.0, 0.7],
            ego2global_translation=[600.0 + i, 1600.0, 0.0],
            ego2global_rotation=[1.0, 0.0, 0.0, 0.0],
            timestamp=key_ts,
            gt_boxes=boxes,
            gt_names=np.asarray(names),
            gt_velocity=vel,
            num_lidar_pts=np.asarray(
                [int(rng.integers(5, 200)) for _ in names]),
            num_radar_pts=np.zeros(len(names), np.int64),
            valid_flag=np.ones(len(names), bool),
        ))

    info_path = os.path.join(root, "fake_infos_train.pkl")
    with open(info_path, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": version}}, f)
    return info_path, mask_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--sweeps", type=int, default=2)
    ap.add_argument("--cams", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    info_path, mask_dir = write_dataset(
        args.out, n_samples=args.samples, n_sweeps=args.sweeps,
        num_cams=args.cams, seed=args.seed)
    print(f"wrote {info_path}\nmasks at {mask_dir}")


if __name__ == "__main__":
    main()
