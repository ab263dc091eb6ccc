"""Offline 2D instance-mask pre-inference.

Counterpart of the reference's tools/mask_tools/save_mask_nusc.py: run a 2D
instance-segmentation model over every camera image and write, per sample
token, one PNG per (camera, class) whose pixels carry instance ids
(anno row + 1) plus an ``anno.json`` table. FSF consumes these offline.

The 2D model is pluggable (``--backend``):
  * ``torch-maskrcnn``: torchvision Mask R-CNN (CPU torch is available in
    this environment) — a stand-in until the HTC JAX port (phase 2, see
    PARITY.md known gaps);
  * ``precomputed``: convert an existing per-sample instance-segmentation
    JSON (e.g. exported from the reference's HTC run) into the PNG+JSON
    layout;
  * ``random``: synthetic masks for pipeline smoke tests.

Painting follows the reference scheme: global top-K detections per sample
by score, higher-score instances painted last (score-argmax layering),
pixel value = anno row + 1.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def paint_sample(
    detections,  # list of dicts: cam_id, category, score, bbox [4], mask [H,W] bool
    num_cams: int,
    num_classes: int,
    img_hw,
    max_anno: int = 250,
):
    """Detections → ({(cam, cls): mask_png}, anno rows)."""
    h, w = img_hw
    dets = sorted(detections, key=lambda d: -d["score"])[:max_anno]
    dets = sorted(dets, key=lambda d: d["score"])  # paint low → high
    masks = {}
    annos = []
    for row, d in enumerate(sorted(dets, key=lambda d: -d["score"])):
        annos.append(
            dict(
                bbox=[float(x) for x in d["bbox"]],
                score=float(d["score"]),
                category=int(d["category"]),
                cam_id=int(d["cam_id"]),
                obj_id=row,
            )
        )
    # paint in ascending score so higher scores overwrite
    order = {id(d): i for i, d in enumerate(sorted(dets, key=lambda d: -d["score"]))}
    for d in sorted(dets, key=lambda x: x["score"]):
        key = (int(d["cam_id"]), int(d["category"]))
        if key not in masks:
            masks[key] = np.zeros((h, w), np.int32)
        masks[key][d["mask"]] = order[id(d)] + 1
    return masks, annos


def save_sample(out_dir, token, masks, annos):
    from PIL import Image

    sdir = os.path.join(out_dir, token)
    os.makedirs(sdir, exist_ok=True)
    for (cam, cls), m in masks.items():
        Image.fromarray(m.astype(np.uint8)).save(os.path.join(sdir, f"{cam}_{cls}.png"))
    with open(os.path.join(sdir, "anno.json"), "w") as f:
        json.dump(annos, f)


def backend_random(rng, num_cams, num_classes, img_hw, n=10):
    h, w = img_hw
    out = []
    for _ in range(n):
        cam = int(rng.integers(num_cams))
        cls = int(rng.integers(num_classes))
        x1, y1 = rng.integers(0, w - 40), rng.integers(0, h - 40)
        bw, bh = rng.integers(20, 40), rng.integers(20, 40)
        mask = np.zeros((h, w), bool)
        mask[y1:y1 + bh, x1:x1 + bw] = True
        out.append(
            dict(cam_id=cam, category=cls, score=float(rng.random()),
                 bbox=[float(x1), float(y1), float(x1 + bw), float(y1 + bh)],
                 mask=mask)
        )
    return out


# torchvision Mask R-CNN is COCO-trained; map COCO categories onto the
# nuScenes detection classes (reference HTC is nuImages-trained so needs no
# map — save_mask_nusc.py:160-218). Standard nuScenes class order.
NUSC_CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)
COCO_TO_NUSC = {1: 8, 2: 7, 3: 0, 4: 6, 6: 3, 8: 1}


def load_sample_images(info, data_root):
    """[H,W,3] uint8 per camera from an mmdet3d-schema info record.

    Camera order MUST match the reader's lidar2img rows — both use
    data.nuscenes.ordered_cam_names (canonical nuScenes names first, any
    extras sorted after)."""
    from PIL import Image

    from fullysparsefusion_tpu.data.nuscenes import ordered_cam_names

    cams = info.get("cams", {})
    names = ordered_cam_names(cams)
    images = []
    for c in names:
        path = cams[c]["data_path"]
        if not os.path.isabs(path):
            path = os.path.join(data_root, path)
        images.append(np.asarray(Image.open(path).convert("RGB")))
    return images


_MASKRCNN = None


def backend_torch_maskrcnn(images, score_thr=0.3, class_map=None, weights="DEFAULT"):
    """images: list of [H, W, 3] uint8 per camera."""
    import torch
    import torchvision

    global _MASKRCNN
    if _MASKRCNN is None:
        _MASKRCNN = torchvision.models.detection.maskrcnn_resnet50_fpn(
            weights=None if weights in ("none", None) else weights
        )
        _MASKRCNN.eval()
    model = _MASKRCNN
    if class_map is None:
        class_map = COCO_TO_NUSC
    out = []
    with torch.no_grad():
        for cam_id, img in enumerate(images):
            t = torch.from_numpy(np.ascontiguousarray(img)).permute(2, 0, 1).float() / 255.0
            pred = model([t])[0]
            for j in range(len(pred["scores"])):
                s = float(pred["scores"][j])
                if s < score_thr:
                    continue
                coco_cls = int(pred["labels"][j])
                cls = class_map.get(coco_cls, -1) if class_map else coco_cls
                if cls < 0:
                    continue
                out.append(
                    dict(
                        cam_id=cam_id, category=cls, score=s,
                        bbox=[float(x) for x in pred["boxes"][j]],
                        mask=(pred["masks"][j, 0] > 0.5).numpy(),
                    )
                )
    return out


_JAX_HTC = None


def backend_jax_htc(images, score_thr=0.3, weights=None):
    """The phase-2 native backend: models/htc.py (JAX HTC-X101-DCN port of
    the reference's save_mask_nusc.py model). ``weights`` is a converted
    variables pickle from `convert_checkpoint.py --model htc`; None runs
    random init (pipeline smoke in weightless environments).

    images: list of [H, W, 3] uint8 per camera → detection dicts with
    full-canvas boolean masks.
    """
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from fullysparsefusion_tpu.models.htc import HTC, NUIM_CLASSES

    global _JAX_HTC
    h, w = images[0].shape[:2]
    hp, wp = -(-h // 32) * 32, -(-w // 32) * 32
    if _JAX_HTC is None:
        if os.environ.get("FSF_HTC_TINY"):
            # plumbing smoke tests: 4-block backbone, small candidate sets
            model = HTC(num_proposals=64, rpn_pre_nms=64, max_dets=8,
                        depth_blocks=(1, 1, 1, 1))
        else:
            model = HTC()
        if weights and weights not in ("none", "DEFAULT"):
            import pickle

            with open(weights, "rb") as f:
                vars_ = pickle.load(f)
        else:
            vars_ = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, hp, wp, 3), jnp.float32))
        apply = jax.jit(lambda v, im: model.apply(v, im))
        _JAX_HTC = (vars_, apply)
    vars_, apply = _JAX_HTC
    nuim_to_nusc = [NUSC_CLASSES.index(n) for n in NUIM_CLASSES]

    out = []
    for cam_id, img in enumerate(images):
        pad = np.zeros((hp, wp, 3), np.float32)
        pad[:h, :w] = img
        (det,) = apply(vars_, jnp.asarray(pad)[None])
        boxes = np.asarray(det.boxes)
        scores = np.asarray(det.scores)
        labels = np.asarray(det.labels)
        probs = np.asarray(det.masks)
        valid = np.asarray(det.valid)
        for j in range(len(scores)):
            if not valid[j] or scores[j] < score_thr:
                continue
            x1, y1, x2, y2 = boxes[j]
            bw = max(int(round(x2 - x1)), 1)
            bh = max(int(round(y2 - y1)), 1)
            m28 = Image.fromarray((probs[j] * 255).astype(np.uint8))
            mbox = np.asarray(m28.resize((bw, bh), Image.BILINEAR)) > 127
            full = np.zeros((h, w), bool)
            yy, xx = int(round(y1)), int(round(x1))
            sub = mbox[: max(0, h - yy), : max(0, w - xx)]
            full[yy:yy + sub.shape[0], xx:xx + sub.shape[1]] = sub
            out.append(dict(
                cam_id=cam_id, category=nuim_to_nusc[int(labels[j])],
                score=float(scores[j]),
                bbox=[float(v) for v in boxes[j]], mask=full,
            ))
    return out


def main():
    # Honor JAX_PLATFORMS even under the axon sitecustomize, which force-
    # selects "axon,cpu" regardless of the env var: apply it via
    # jax.config BEFORE the first backend-initializing op (same fix as
    # tests/conftest.py). Without this a CPU-only invocation dials the TPU
    # tunnel — and hangs when the tunnel is down.
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="random",
                    choices=["random", "torch-maskrcnn", "jax-htc",
                             "precomputed"])
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--tokens", nargs="+", default=None,
                    help="sample tokens (random/precomputed backends; "
                         "defaults to every info-pkl sample, else 'sample0')")
    ap.add_argument("--info-pkl", help="mmdet3d info pickle with per-sample "
                    "'cams' image paths (torch-maskrcnn backend)")
    ap.add_argument("--data-root", default="")
    ap.add_argument("--num-cams", type=int, default=6)
    ap.add_argument("--num-classes", type=int, default=10)
    ap.add_argument("--img-h", type=int, default=900)
    ap.add_argument("--img-w", type=int, default=1600)
    ap.add_argument("--score-thr", type=float, default=0.3)
    ap.add_argument("--weights", default="DEFAULT",
                    help="torchvision weights spec, or 'none' for random init "
                         "(pipeline smoke tests in weightless environments)")
    ap.add_argument("--max-samples", type=int, default=0)
    ap.add_argument("--precomputed-json", help="for --backend precomputed")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    infos = None
    if args.info_pkl:
        import pickle

        with open(args.info_pkl, "rb") as f:
            data = pickle.load(f)
        infos = data["infos"] if isinstance(data, dict) else data
        if args.max_samples:
            infos = infos[: args.max_samples]

    if args.backend in ("torch-maskrcnn", "jax-htc"):
        assert infos is not None, f"--info-pkl required for {args.backend}"
        for info in infos:
            token = info.get("token", "")
            images = load_sample_images(info, args.data_root)
            h, w = images[0].shape[:2]
            if args.backend == "jax-htc":
                dets = backend_jax_htc(
                    images, score_thr=args.score_thr, weights=args.weights
                )
            else:
                dets = backend_torch_maskrcnn(
                    images, score_thr=args.score_thr, weights=args.weights
                )
            masks, annos = paint_sample(dets, len(images), args.num_classes, (h, w))
            save_sample(args.out_dir, token, masks, annos)
            print(f"{token}: {len(annos)} instances, {len(masks)} mask planes")
        return

    tokens = args.tokens
    if tokens is None:
        tokens = [i.get("token", "") for i in infos] if infos else ["sample0"]
    for token in tokens:
        if args.backend == "random":
            dets = backend_random(
                rng, args.num_cams, args.num_classes, (args.img_h, args.img_w)
            )
        else:  # precomputed
            with open(args.precomputed_json) as f:
                raw = json.load(f)[token]
            dets = []
            for d in raw:
                m = np.zeros((args.img_h, args.img_w), bool)
                x1, y1, x2, y2 = [int(v) for v in d["bbox"]]
                m[y1:y2, x1:x2] = True  # bbox-mask fallback when no RLE
                dets.append(dict(d, mask=m))
        masks, annos = paint_sample(
            dets, args.num_cams, args.num_classes, (args.img_h, args.img_w)
        )
        save_sample(args.out_dir, token, masks, annos)
        print(f"{token}: {len(annos)} instances, {len(masks)} mask planes")


if __name__ == "__main__":
    main()
