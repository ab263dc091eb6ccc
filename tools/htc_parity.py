"""HTC activation-parity CLI — see utils/htc_parity.py for the workflow.

    # our side (random weights without --ckpt; converted mmdet weights with)
    python tools/htc_parity.py dump --out ours.npz \
        [--ckpt htc.pth] [--image img.npy] [--rois rois.npy] [--hw 928,1600]

    # after dumping the mmdet side elsewhere (template below):
    python tools/htc_parity.py compare theirs.npz ours.npz [--atol 1e-3]

    # the mmdet-side dump script (run where mmdet + torch + ckpt exist):
    python tools/htc_parity.py --print-torch-snippet > dump_mmdet_htc.py
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Template for the mmdet side. NOT runnable here (mmdet/torch-cuda absent) —
# a starting point pinned to mmdet 2.x HTC APIs (the reference's stack,
# /root/reference/README.md install section). Hooks mirror ACTIVATION_ORDER.
TORCH_SNIPPET = '''\
"""Dump mmdet HTC activations for parity with fullysparsefusion_tpu.

Usage (mmdet 2.x environment):
    python dump_mmdet_htc.py CONFIG CKPT IMAGE.npy ROIS.npy OUT.npz
IMAGE.npy: [1, H, W, 3] RGB 0-255 float32 (the JAX side uses the same
array); ROIS.npy: [P, 4] xyxy image pixels.
"""
import sys
import numpy as np
import torch
from mmdet.apis import init_detector

cfg, ckpt, image_npy, rois_npy, out = sys.argv[1:6]
model = init_detector(cfg, ckpt, device="cpu").eval()
img = np.load(image_npy)  # [1, H, W, 3] RGB 0-255
rois = np.load(rois_npy)  # [P, 4] xyxy

# mmdet normalizes inside the data pipeline; replicate img_norm_cfg
norm = model.cfg.img_norm_cfg
x = (img - np.array(norm["mean"])) / np.array(norm["std"])
if not norm.get("to_rgb", True):
    x = x[..., ::-1]
x = torch.from_numpy(x.transpose(0, 3, 1, 2).copy()).float()

acts = {}
with torch.no_grad():
    feats = model.backbone(x)
    for i, c in enumerate(feats):
        acts[f"backbone.c{i + 2}"] = c.permute(0, 2, 3, 1).numpy()
    pyr = model.neck(feats)
    for i, p in enumerate(pyr):
        acts[f"fpn.p{i + 2}"] = p.permute(0, 2, 3, 1).numpy()
    cls_lvls, reg_lvls = model.rpn_head(pyr)
    for i, (c, r) in enumerate(zip(cls_lvls, reg_lvls)):
        acts[f"rpn.cls.l{i}"] = c.permute(0, 2, 3, 1).numpy()
        acts[f"rpn.reg.l{i}"] = r.permute(0, 2, 3, 1).numpy()
    sem_logits, sem_feat = model.roi_head.semantic_head(pyr)
    acts["semantic.logits"] = sem_logits.permute(0, 2, 3, 1).numpy()
    acts["semantic.embed"] = sem_feat.permute(0, 2, 3, 1).numpy()

    rh = model.roi_head
    t_rois = torch.cat(
        [torch.zeros(len(rois), 1), torch.from_numpy(rois).float()], 1)
    r = t_rois
    img_hw = img.shape[1:3]
    for si in range(3):
        bf = rh.bbox_roi_extractor[si](
            pyr[: rh.bbox_roi_extractor[si].num_inputs], r)
        sf = rh.semantic_roi_extractor([sem_feat], r)
        bf = bf + sf
        acts[f"roi.bbox_feats{si}"] = bf.permute(0, 2, 3, 1).numpy()
        cls, reg = rh.bbox_head[si](bf)
        acts[f"bbox_head{si}.cls"] = cls.numpy()
        acts[f"bbox_head{si}.reg"] = reg.numpy()
        boxes = rh.bbox_head[si].bbox_coder.decode(
            r[:, 1:], reg, max_shape=img_hw)
        acts[f"bbox_head{si}.rois"] = boxes.numpy()
        r = torch.cat([r[:, :1], boxes], 1)
    mf = rh.mask_roi_extractor[-1](
        pyr[: rh.mask_roi_extractor[-1].num_inputs], t_rois)
    msf = rh.semantic_roi_extractor([sem_feat], t_rois)
    mf = mf + msf
    acts["roi.mask_feats"] = mf.permute(0, 2, 3, 1).numpy()
    last = None
    for si in range(3):
        head = rh.mask_head[si]
        if si == 0:
            lg = head(mf, return_feat=False)
        else:
            lg, last_new = head(mf + (last if last is not None else 0),
                                return_feat=True)  # adapt per mmdet version
            last = last_new
        acts[f"mask_head{si}.logits"] = (
            lg.permute(0, 2, 3, 1).numpy() if lg.dim() == 4 else lg.numpy())

np.savez_compressed(out, **acts)
print(f"wrote {len(acts)} activations to {out}")
'''


def _build(ckpt, hw):
    import jax
    from fullysparsefusion_tpu.models.htc import build_htc

    model, vars_ = build_htc(jax.random.key(0), img_hw=hw)
    if ckpt:
        from fullysparsefusion_tpu.train.checkpoint import load_torch_state_dict
        from fullysparsefusion_tpu.train.torch_map import convert_state_dict

        sd = load_torch_state_dict(ckpt)
        vars_, report = convert_state_dict(sd, vars_, model="htc")
        print(f"# converted: {report}")
    return model, vars_


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--print-torch-snippet", action="store_true")
    sub = ap.add_subparsers(dest="cmd")
    d = sub.add_parser("dump")
    d.add_argument("--out", required=True)
    d.add_argument("--ckpt", default=None)
    d.add_argument("--image", default=None, help="[1,H,W,3] RGB .npy")
    d.add_argument("--rois", default=None, help="[P,4] xyxy .npy")
    d.add_argument("--hw", default="928,1600")
    c = sub.add_parser("compare")
    c.add_argument("ref")
    c.add_argument("ours")
    c.add_argument("--atol", type=float, default=1e-3)
    c.add_argument("--rtol", type=float, default=1e-3)
    args = ap.parse_args()

    if args.print_torch_snippet:
        print(TORCH_SNIPPET)
        return

    from fullysparsefusion_tpu.utils.htc_parity import (
        dump_jax_activations, save_activations, load_activations,
        compare_activations, first_divergent,
    )

    if args.cmd == "dump":
        import jax
        import jax.numpy as jnp

        hw = tuple(int(v) for v in args.hw.split(","))
        model, vars_ = _build(args.ckpt, hw)
        if args.image:
            img = jnp.asarray(np.load(args.image), jnp.float32)
        else:  # deterministic synthetic image
            img = jax.random.uniform(
                jax.random.key(1), (1, *hw, 3), jnp.float32, 0, 255)
        rois = np.load(args.rois) if args.rois else None
        acts = dump_jax_activations(model, vars_, img, rois)
        save_activations(acts, args.out)
        print(f"wrote {len(acts)} activations to {args.out}")
        return

    if args.cmd == "compare":
        rows = compare_activations(
            load_activations(args.ref), load_activations(args.ours),
            atol=args.atol, rtol=args.rtol,
        )
        wa = max(len(r["name"]) for r in rows)
        for r in rows:
            ma = "—" if r["max_abs"] is None else f"{r['max_abs']:.3e}"
            mr = "—" if r["max_rel"] is None else f"{r['max_rel']:.3e}"
            flag = "ok" if r["ok"] else "DIVERGED"
            print(f"{r['name']:<{wa}}  max_abs={ma:>10}  max_rel={mr:>10}  {flag}")
        bad = first_divergent(rows)
        if bad:
            print(f"\nfirst divergent module: {bad}")
            sys.exit(1)
        print("\nall modules match")
        return

    ap.print_help()


if __name__ == "__main__":
    main()
