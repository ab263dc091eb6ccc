"""AOT-export the inference graph for serving (jax.export / StableHLO).

The reference deploys through torch checkpoints + a live mmdet3d runtime;
the TPU-native serving story is ahead-of-time compilation: lower the jitted
inference function once, serialize the StableHLO artifact, and load it in a
lean serving process with no model code, no tracing, and no Python model
tree — only `jax.export.deserialize(...).call` plus the weights.

    # export (weights travel separately — orbax or the converter's pickle)
    python tools/export_model.py --model fsf --tiny --out /tmp/fsf.stablehlo
    # smoke the artifact round trip
    python tools/export_model.py --check /tmp/fsf.stablehlo --model fsf --tiny

The exported function signature is ``(variables, pb, cam?) -> (cls_logits,
reg_preds, centers)`` — params as arguments keeps the artifact small and
lets one artifact serve many checkpoints (A/B weights, EMA swaps).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def build(model_name: str, tiny: bool, config: str | None):
    import jax
    from fixtures import make_scene, make_camera_data, with_noaug_channels

    if tiny or not config:
        from fullysparsefusion_tpu.config import tiny_fsd_config, tiny_fsf_config

        fsf_cfg = tiny_fsf_config()
        fsd_cfg = tiny_fsd_config()
    else:
        from fullysparsefusion_tpu.config_compat import load_fsf_config

        fsf_cfg = load_fsf_config(config)
        fsd_cfg = fsf_cfg.fsd

    if model_name == "fsf":
        from fullysparsefusion_tpu.models.fsf import FSF

        cfg = fsf_cfg
        model = FSF(cfg=cfg)
        pb, gt = make_scene(seed=0, n_cap=cfg.fsd.caps.points,
                            max_gt=cfg.fsd.caps.max_gt)
        cam = make_camera_data(pb, gt, num_cams=cfg.num_cams,
                               num_classes=cfg.num_classes)
        pb = with_noaug_channels(pb)
        vars_ = model.init(
            jax.random.key(0), pb, cam, 2, None, None, False,
            method=lambda m, *a, **k: m(*a, **k))

        def fwd(variables, pb, cam):
            out = model.apply(variables, pb, cam, 2, None, None, False)
            fin = out["final"]
            return fin["cls_logits"], fin["reg_preds"], fin["centers"]

        args = (vars_, pb, cam)
    else:
        from fullysparsefusion_tpu.models.fsd import SingleStageFSD

        cfg = fsd_cfg
        model = SingleStageFSD(cfg=cfg)
        pb, gt = make_scene(seed=0, n_cap=cfg.caps.points, max_gt=cfg.caps.max_gt)
        vars_ = model.init(
            jax.random.key(0), pb, 2, None, False,
            method=lambda m, *a, **k: m(*a, **k))

        def fwd(variables, pb):
            out = model.apply(variables, pb, 2, None, False)
            return out["cls_logits"], out["reg_preds"], out["cluster_xyz"]

        args = (vars_, pb)
    return fwd, args


def _register_container_serialization(jexport):
    """flax.struct dataclass containers need explicit (de)serializers."""
    import fullysparsefusion_tpu.utils.containers as C

    for name in dir(C):
        cls = getattr(C, name)
        if isinstance(cls, type) and hasattr(cls, "__dataclass_fields__"):
            fields = [f for f in cls.__dataclass_fields__]
            import pickle

            try:
                jexport.register_pytree_node_serialization(
                    cls,
                    serialized_name=f"fsf.{name}",
                    # auxdata is the tuple of static (pytree_node=False)
                    # fields — plain python scalars, pickle round-trips it
                    serialize_auxdata=pickle.dumps,
                    deserialize_auxdata=pickle.loads,
                )
            except ValueError:
                pass  # already registered


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="fsf", choices=["fsf", "fsd"])
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--config")
    ap.add_argument("--platform", default=None,
                    help="lowering platform (default: current backend)")
    ap.add_argument("--out")
    ap.add_argument("--check", help="deserialize an artifact and run it "
                    "against the live model on the same inputs")
    args = ap.parse_args()

    import jax

    if args.platform != "tpu":
        # export/check don't need a TPU unless targeting one; the axon
        # sitecustomize force-selects the tunnel otherwise
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    from jax import export as jexport

    _register_container_serialization(jexport)
    fwd, ex_args = build(args.model, args.tiny, args.config)

    if args.check:
        import numpy as np

        with open(args.check, "rb") as f:
            exp = jexport.deserialize(bytearray(f.read()))
        got = exp.call(*ex_args)
        want = jax.jit(fwd)(*ex_args)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-5)
        print(f"artifact matches live model on {args.model} "
              f"({len(jax.tree_util.tree_leaves(got))} outputs)")
        return

    platforms = [args.platform] if args.platform else None
    exp = jexport.export(jax.jit(fwd), platforms=platforms)(*ex_args)
    blob = exp.serialize()
    assert args.out, "--out required"
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {args.model} ({len(blob)/1e6:.1f} MB StableHLO, "
          f"platforms {exp.platforms}) -> {args.out}")


if __name__ == "__main__":
    main()
