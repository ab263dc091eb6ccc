"""Reference checkpoint (.pth) → native flax variable tree.

The FSF recipe warm-starts from FSD-pretrained weights
(/root/reference/projects/configs/nuScenes/FSF_nuScenes_config.py:429);
metric parity requires loading them. The tensor-level map lives in
``fullysparsefusion_tpu/train/torch_map.py`` (complete, round-trip tested);
this CLI applies it against a model skeleton built from a config and writes
a tree that ``load_model_vars``-style consumers accept directly.

    # inspect a checkpoint's keys
    python tools/convert_checkpoint.py --pth ckpt/fsd_nusc_pretrain.pth --list
    # convert (reference config supplies the model shape)
    python tools/convert_checkpoint.py --pth ckpt/fsd_nusc_pretrain.pth \
        --model fsd --config /root/reference/projects/configs/nuScenes/FSF_nuScenes_config.py \
        --out work_dirs/fsd_pretrain_vars.pkl
    # export back to the torch layout
    python tools/convert_checkpoint.py --export work_dirs/vars.pkl --model fsf --out sd.pth
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def build_skeleton(model_name: str, config_path: str | None, tiny: bool):
    """Shape-only variable tree via eval_shape (no compute, no device)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from fixtures import make_scene, make_camera_data, with_noaug_channels

    if tiny or not config_path:
        from fullysparsefusion_tpu.config import tiny_fsd_config, tiny_fsf_config

        fsf_cfg = tiny_fsf_config()
        fsd_cfg = tiny_fsd_config()
    else:
        from fullysparsefusion_tpu.config_compat import load_fsf_config

        fsf_cfg = load_fsf_config(config_path)
        fsd_cfg = fsf_cfg.fsd

    if model_name == "htc":
        # shapes are resolution-independent; init at a small canvas
        from fullysparsefusion_tpu.models.htc import HTC

        model = HTC()
        import jax.numpy as jnp

        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        shapes = jax.eval_shape(
            lambda k: model.init(k, dummy), jax.random.key(0))
        return {k: dict(v) if hasattr(v, "items") else v
                for k, v in shapes.items()}
    if model_name == "fsf":
        from fullysparsefusion_tpu.models.fsf import FSF

        cfg = fsf_cfg
        model = FSF(cfg=cfg)
        pb, gt = make_scene(seed=0, n_cap=cfg.fsd.caps.points, max_gt=cfg.fsd.caps.max_gt)
        cam = make_camera_data(pb, gt, num_cams=cfg.num_cams, num_classes=cfg.num_classes)
        pb = with_noaug_channels(pb)
        init = lambda k: model.init(
            k, pb, cam, 2, gt, gt, False, method=lambda m, *a, **kw: m(*a, **kw)
        )
    else:
        from fullysparsefusion_tpu.models.fsd import SingleStageFSD

        cfg = fsd_cfg
        model = SingleStageFSD(cfg=cfg)
        pb, gt = make_scene(seed=0, n_cap=cfg.caps.points, max_gt=cfg.caps.max_gt)
        init = lambda k: model.init(
            k, pb, 2, gt, False, method=lambda m, *a, **kw: m(*a, **kw)
        )
    import jax

    shapes = jax.eval_shape(init, jax.random.key(0))
    return {k: dict(v) if hasattr(v, "items") else v for k, v in shapes.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", help=".pth checkpoint to convert")
    ap.add_argument("--export", help="converted-vars pickle to export back to torch layout")
    ap.add_argument("--model", default="fsd", choices=["fsd", "fsf", "htc"])
    ap.add_argument("--config", help="reference config file (model shapes)")
    ap.add_argument("--tiny", action="store_true", help="tiny test config shapes")
    ap.add_argument("--list", action="store_true", help="print checkpoint keys and exit")
    ap.add_argument("--out")
    args = ap.parse_args()

    from fullysparsefusion_tpu.train.checkpoint import load_torch_state_dict
    from fullysparsefusion_tpu.train.torch_map import (
        convert_state_dict, synthesize_state_dict,
    )

    if args.export:
        with open(args.export, "rb") as f:
            variables = pickle.load(f)
        sd = synthesize_state_dict(variables, args.model)
        assert args.out, "--out required for --export"
        try:
            import torch

            torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                                       for k, v in sd.items()}}, args.out)
        except ImportError:
            with open(args.out, "wb") as f:
                pickle.dump(sd, f)
        print(f"exported {len(sd)} tensors to {args.out}")
        return

    assert args.pth, "--pth required"
    sd = load_torch_state_dict(args.pth)
    if args.list:
        for k, v in sd.items():
            print(f"{k:90s} {tuple(v.shape)}")
        return

    skeleton = build_skeleton(args.model, args.config, args.tiny)
    variables, report = convert_state_dict(sd, skeleton, args.model)
    print(f"filled {report['filled']}/{report['total']} mapped tensors")
    for kind in ("missing", "unmapped"):
        ks = report[kind]
        print(f"{kind}: {len(ks)}")
        for k in ks[:30]:
            print("  ", k)
    for k, got, want in report["mismatch"][:30]:
        print(f"  shape mismatch {k}: ckpt{got} vs model{want}")
    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(variables, f)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
