"""Sub-stage timing of the FSD query branch, RoI refine stage, and the
segmentation-enhance band at bench scale.

profile_bench.py gives cumulative phase deltas (fsd Δ19.1 ms, full−fusion
Δ13.4 ms at the round-4 defaults); this tool splits those deltas into their
actual line items so perf work targets measured cost, not guesses. Inputs to
each timed jit are materialized on-device ONCE (seg_out from a run_until jit,
foreground sets from extract_foreground) — the timed function never recomputes
upstream stages.

    python tools/profile_fsd.py --parts prevox,ccl,sir
    python tools/profile_fsd.py            # all parts

One process runs all requested parts sequentially (remote TPU compiles are
serialized server-side; never run two of these concurrently).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

PARTS = (
    "fsd_branch",    # whole FSD query branch (Δfsd reference number)
    "extract_fg",    # prevox + group_sample + compaction + CCL + cluster seg
    "prevox",        # voxelize + per-voxel feature means (the `red` dict)
    "prevox_vox",    # voxelize_points alone (the argsort)
    "group_gather",  # group_sample + per-group masked_gather compaction
    "ccl",           # cluster_all_groups (voxelize-per-group + batched CCL)
    "sir",           # SIR backbone + head over materialized foreground
    "roi_extract",   # grid-hash RoI membership at bench query counts
    "roi_sub",       # roi_extract internals: raster / lookup / finalize
    "refine",        # one full cascade refine stage (≈ full − fusion)
    "maskband",      # gather_point_instances + class scores + enhance + head
    "mask_sub",      # maskband internals: mask gather / cls scores / mlps
)


def _timeit(name, fn, *args, iters=10):
    import jax

    jfn = jax.jit(fn)
    t0 = time.time()
    r = jfn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
    print(f"{name}: compile {time.time() - t0:.1f}s", flush=True)
    r = jfn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
    t0 = time.time()
    for _ in range(iters):
        r = jfn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
    ms = (time.time() - t0) / iters * 1000
    print(f"{name}: {ms:.2f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default=",".join(PARTS))
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    parts = [p.strip() for p in args.parts.split(",") if p.strip()]
    unknown = set(parts) - set(PARTS)
    if unknown:
        raise SystemExit(f"unknown parts {sorted(unknown)}; choose from {PARTS}")

    import jax
    import jax.numpy as jnp
    from bench import build_bench_model

    cfg, model, vars_, pb, cam = build_bench_model()
    f = cfg.fsd
    batch = int(os.environ.get("FSF_BENCH_BATCH", 1))

    from fullysparsefusion_tpu.utils.containers import PointBatch

    points = pb.points[:, :-3]
    pb_inner = PointBatch(points=points, batch_idx=pb.batch_idx, valid=pb.valid)

    # materialize seg_out (+ the enhance-band intermediates) once
    def upto_seg(vars_, pb, cam):
        out = model.apply(
            vars_, pb, cam, batch, None, None, False, 0.0, 1.0, "seg",
            method=lambda m, *a: m(*a),
        )
        return out["seg_out"]

    t0 = time.time()
    seg_out = jax.jit(upto_seg)(vars_, pb, cam)
    np.asarray(seg_out["seg_logits"][:1])
    print(f"[setup] seg_out materialized (compile+run {time.time()-t0:.0f}s)",
          flush=True)

    def branch(vars_, pb_inner, seg_out):
        return model.apply(
            vars_, pb_inner, seg_out, batch, False, 0.0,
            method=lambda m, pbi, so, b, tr, tb: m.fsd_branch(pbi, so, b, tr, tb),
        )

    if "fsd_branch" in parts:
        _timeit("fsd_branch", lambda v, p, s: branch(v, p, s)["cls_logits"],
                vars_, pb_inner, seg_out, iters=args.iters)

    def extract_fg(vars_, pb_inner, seg_out):
        return model.apply(
            vars_, pb_inner, seg_out, batch, 0.0,
            method=lambda m, pbi, so, b, tb: m.fsd_branch.extract_foreground(
                pbi, so, b, tb),
        )

    if "extract_fg" in parts:
        _timeit("extract_fg", lambda v, p, s: extract_fg(v, p, s)[2],
                vars_, pb_inner, seg_out, iters=args.iters)

    from fullysparsefusion_tpu.ops.voxelize import (
        voxelize_points, voxel_coords, grid_dims, linearize_coords)
    from fullysparsefusion_tpu.ops.segment import segment_mean, unique_segments
    from fullysparsefusion_tpu.models.fsd import (
        group_sample, cluster_all_groups)
    from fullysparsefusion_tpu.utils.gather import masked_gather

    def prevox(pb_inner, seg_out, reduce_feats: bool):
        data = dict(
            points=pb_inner.points,
            logits=seg_out["seg_logits"],
            votes=seg_out["vote_preds"],
            feats=seg_out["seg_feats"],
            offsets=seg_out["offsets"],
        )
        valid = seg_out["valid"]
        pvseg, _, pv_batch, _ = voxelize_points(
            pb_inner.xyz, pb_inner.batch_idx, valid,
            f.pre_voxel_size, f.segmentor.point_cloud_range, f.caps.prevox,
        )
        if not reduce_feats:
            return pvseg.seg_id, pv_batch
        red = {
            k: segment_mean(v, pvseg.seg_id, f.caps.prevox, counts=pvseg.counts)
            for k, v in data.items()
        }
        return red, pv_batch, pvseg.seg_valid

    if "prevox" in parts:
        _timeit("prevox(vox+means)", lambda p, s: prevox(p, s, True)[0]["feats"],
                pb_inner, seg_out, iters=args.iters)
    if "prevox_vox" in parts:
        _timeit("prevox_vox(only)", lambda p, s: prevox(p, s, False)[0],
                pb_inner, seg_out, iters=args.iters)

    # materialize the pre-voxelized set for the downstream pure parts
    red, pv_batch, pv_valid = jax.jit(lambda p, s: prevox(p, s, True))(
        pb_inner, seg_out)
    np.asarray(pv_batch[:1])

    def group_gather(red, pv_batch, pv_valid):
        fg_masks, centers = group_sample(
            red["logits"], red["offsets"], red["points"][:, :3], pv_valid, f,
            0.0, batch_idx=pv_batch, batch_size=batch,
        )
        kcap = f.caps.fg_per_group
        feats_all = jnp.concatenate(
            [red["logits"], red["votes"], red["feats"]], axis=1)
        outs = []
        for g in range(f.num_groups):
            idx, v = masked_gather(fg_masks[g], kcap)
            outs.append((red["points"][idx], feats_all[idx], centers[g][idx],
                         pv_batch[idx], v))
        return outs

    if "group_gather" in parts:
        _timeit("group_gather", lambda r, b, v: group_gather(r, b, v)[0][1],
                red, pv_batch, pv_valid, iters=args.iters)

    gg = jax.jit(group_gather)(red, pv_batch, pv_valid)
    np.asarray(gg[0][3][:1])
    cen_list = [o[2] for o in gg]
    bat_list = [o[3] for o in gg]
    v_list = [o[4] for o in gg]

    if "ccl" in parts:
        _timeit(
            "ccl(cluster_all_groups)",
            lambda c0, b0, v0: cluster_all_groups(c0, b0, v0, f, batch)[0][0],
            cen_list, bat_list, v_list, iters=args.iters)

    if "sir" in parts:
        fg, cseg, cluster_xyz, cluster_batch, cluster_group, cluster_valid = (
            jax.jit(lambda v, p, s: extract_fg(v, p, s))(
                vars_, pb_inner, seg_out))
        np.asarray(cluster_xyz[:1])

        def sir_head(vars_, fg, cseg, cluster_xyz, cluster_valid):
            def run(m, fg, cseg, cxyz, cval):
                pt_feats, cluster_feats = m.fsd_branch.extract_feat(
                    fg, cseg, cxyz, False)
                return m.fsd_branch.bbox_head(cluster_feats, cval, False)
            return model.apply(
                vars_, fg, cseg, cluster_xyz, cluster_valid, method=run)

        _timeit("sir+head",
                lambda v, a, b0, c0, d0: sir_head(v, a, b0, c0, d0)[
                    "cls_logits"][0],
                vars_, fg, cseg, cluster_xyz, cluster_valid, iters=args.iters)

    need_fusion = {"roi_extract", "roi_sub", "refine"} & set(parts)
    if need_fusion:
        def upto_fusion(vars_, pb, cam):
            return model.apply(
                vars_, pb, cam, batch, None, None, False, 0.0, 1.0, "fusion",
                method=lambda m, *a: m(*a),
            )
        fus = jax.jit(upto_fusion)(vars_, pb, cam)
        np.asarray(fus["fsd"]["cls_logits"][:1])
        print("[setup] fusion outputs materialized", flush=True)
        fr = fus["frustum"]
        fsd = fus["fsd"]
        centers = jnp.concatenate([fr["obj_centers"], fsd["cluster_xyz"]])
        q_batch = jnp.concatenate([fr["obj_batch"], fsd["cluster_batch"]])
        q_valid = jnp.concatenate([fr["obj_valid"], fsd["cluster_valid"]])
        cls_logits = jnp.concatenate(
            [fr["out"]["cls_logits"][0], fsd["cls_logits"]])
        reg_preds = jnp.concatenate(
            [fr["out"]["reg_preds"][0], fsd["reg_preds"]])
        from fullysparsefusion_tpu.core.coders import BasePointBBoxCoder
        coder = BasePointBBoxCoder(f.head.code_size)
        boxes = jax.jit(coder.decode)(reg_preds, centers)
        np.asarray(boxes[:1])

        # the enhance-band intermediates the refine stage reads
        from fullysparsefusion_tpu.models.camera import (
            gather_point_instances, per_point_class_scores)

        def enhance_inputs(vars_, pb, cam):
            noaug_xyz = pb.points[:, -3:]
            seg_feats, pt_valid = model.apply(
                vars_, PointBatch(points=pb.points[:, :-3],
                                  batch_idx=pb.batch_idx, valid=pb.valid),
                batch,
                method=lambda m, pbi, b: m.seg_core(pbi, False, b))
            obj_ids, obj_scores = gather_point_instances(
                noaug_xyz, pb.batch_idx, pt_valid, cam)
            cls2d = per_point_class_scores(obj_ids, obj_scores)
            return seg_feats, pt_valid, cls2d

        seg_feats, pt_valid, cls2d = jax.jit(enhance_inputs)(vars_, pb, cam)
        np.asarray(pt_valid[:1])

    if "roi_extract" in parts:
        from fullysparsefusion_tpu.models.roi import extract_roi_points_grid
        pcr = f.segmentor.point_cloud_range

        def roi_extract(xyz, pbatch, pvalid, boxes, q_batch, q_valid):
            rp = extract_roi_points_grid(
                xyz, pbatch, pvalid, boxes[:, :7], q_batch, q_valid,
                cfg.extra_wlh, f.caps.roi_points, cfg.rois_per_point,
                batch_size=batch, bev_lo=(pcr[0], pcr[1]),
                bev_hi=(pcr[3], pcr[4]),
            )
            return rp.point_idx, rp.geometry

        _timeit("roi_extract",
                lambda *a: roi_extract(*a)[1],
                points[:, :3], pb.batch_idx, pt_valid, boxes, q_batch,
                q_valid, iters=args.iters)

    if "roi_sub" in parts:
        import numpy as _np
        from fullysparsefusion_tpu.models.roi import (
            _roi_grid_raster, _roi_grid_lookup, _finalize_pairs)
        pcr = f.segmentor.point_cloud_range
        bev_lo, bev_hi, cell = (pcr[0], pcr[1]), (pcr[3], pcr[4]), 2.0
        nx = int(_np.ceil((bev_hi[0] - bev_lo[0]) / cell))
        ny = int(_np.ceil((bev_hi[1] - bev_lo[1]) / cell))
        extra = jnp.asarray(cfg.extra_wlh, jnp.float32)
        xyz = points[:, :3]
        q = boxes.shape[0]

        def raster(boxes, q_batch, q_valid):
            return _roi_grid_raster(
                boxes[:, :7], q_batch, q_valid, extra, nx, ny, batch, cell,
                11, 8, bev_lo)

        _timeit("roi_sub:raster", lambda *a: raster(*a),
                boxes, q_batch, q_valid, iters=args.iters)
        ptab = jax.jit(raster)(boxes, q_batch, q_valid)
        np.asarray(ptab.reshape(-1)[:1])

        def lookup(xyz, pbatch, pvalid, ptab):
            return _roi_grid_lookup(
                xyz, pbatch, pvalid, ptab, q, extra, nx, ny, batch, cell,
                8, cfg.rois_per_point, bev_lo)

        _timeit("roi_sub:lookup", lambda *a: lookup(*a)[1],
                xyz, pb.batch_idx, pt_valid, ptab, iters=args.iters)
        member_ok, top_idx, _ = jax.jit(lookup)(
            xyz, pb.batch_idx, pt_valid, ptab)
        np.asarray(top_idx.reshape(-1)[:1])

        def final(xyz, boxes, member_ok, top_idx):
            return _finalize_pairs(
                xyz, boxes[:, :7], member_ok, top_idx, extra,
                f.caps.roi_points, cfg.rois_per_point)

        _timeit("roi_sub:finalize", lambda *a: final(*a).geometry,
                xyz, boxes, member_ok, top_idx, iters=args.iters)

    if "refine" in parts:
        res_query = jnp.zeros((centers.shape[0], cfg.embed_dims))

        def refine(vars_, points, pbatch, pt_valid, seg_feats, cls2d,
                   centers, reg_preds, res_query, q_batch, q_valid):
            def run(m, points, pbatch, pt_valid, seg_feats, cls2d, centers,
                    reg_preds, res_query, q_batch, q_valid):
                from fullysparsefusion_tpu.models.roi import (
                    extract_roi_points_grid)
                boxes = m.coder.decode(reg_preds, centers)
                new_centers = boxes[:, :3]
                pcr = f.segmentor.point_cloud_range
                rp = extract_roi_points_grid(
                    points[:, :3], pbatch, pt_valid, boxes[:, :7],
                    q_batch, q_valid, cfg.extra_wlh, f.caps.roi_points,
                    cfg.rois_per_point, batch_size=batch,
                    bev_lo=(pcr[0], pcr[1]), bev_hi=(pcr[3], pcr[4]))
                sel_pts = points[rp.point_idx]
                sel_feats = seg_feats[rp.point_idx]
                sel_img = m.refine_img_mlps[0](
                    cls2d[rp.point_idx], rp.valid, False)
                feats_in = jnp.concatenate([sel_feats, sel_img], axis=1)
                roi_feats, _ = m.refine_sirs[0](
                    sel_pts, feats_in, rp.geometry, rp.roi_idx, rp.valid,
                    centers.shape[0], False)
                cur = m.lidar_img_mlps[0](roi_feats, q_valid, False)
                pos = m.position_encoders[0](new_centers, q_valid, False)
                query = m.out_projs[0](cur + res_query + pos, q_valid, False)
                return m.refined_heads[0](query, q_valid, False)
            return model.apply(
                vars_, points, pbatch, pt_valid, seg_feats, cls2d, centers,
                reg_preds, res_query, q_batch, q_valid, method=run)

        _timeit("refine(one stage)",
                lambda *a: refine(*a)["cls_logits"][0],
                vars_, points, pb.batch_idx, pt_valid, seg_feats, cls2d,
                centers, reg_preds, res_query, q_batch, q_valid,
                iters=args.iters)

    if "maskband" in parts:
        from fullysparsefusion_tpu.models.camera import (
            gather_point_instances, per_point_class_scores)

        def core_only(vars_, pb):
            return model.apply(
                vars_, PointBatch(points=pb.points[:, :-3],
                                  batch_idx=pb.batch_idx, valid=pb.valid),
                batch,
                method=lambda m, pbi, b: m.seg_core(pbi, False, b))

        seg_feats_m, pt_valid_m = jax.jit(core_only)(vars_, pb)
        np.asarray(pt_valid_m[:1])

        def maskband(vars_, pb, cam, seg_feats, pt_valid):
            def run(m, pb, cam, seg_feats, pt_valid):
                noaug_xyz = pb.points[:, -3:]
                obj_ids, obj_scores = gather_point_instances(
                    noaug_xyz, pb.batch_idx, pt_valid, cam)
                cls2d = per_point_class_scores(obj_ids, obj_scores)
                sf = seg_feats + m.seg_enhance_mlp(cls2d, pt_valid, False)
                sf = sf * pt_valid[:, None].astype(sf.dtype)
                return m.seg_head(sf, pt_valid, False)
            return model.apply(vars_, pb, cam, seg_feats, pt_valid, method=run)

        _timeit("maskband(gather+enhance+head)",
                lambda *a: maskband(*a)["seg_logits"],
                vars_, pb, cam, seg_feats_m, pt_valid_m, iters=args.iters)

    if "mask_sub" in parts:
        from fullysparsefusion_tpu.models.camera import (
            gather_point_instances, per_point_class_scores)

        def core_only2(vars_, pb):
            return model.apply(
                vars_, PointBatch(points=pb.points[:, :-3],
                                  batch_idx=pb.batch_idx, valid=pb.valid),
                batch,
                method=lambda m, pbi, b: m.seg_core(pbi, False, b))

        seg_feats_s, pt_valid_s = jax.jit(core_only2)(vars_, pb)
        np.asarray(pt_valid_s[:1])

        def mgather(pb, cam, pt_valid):
            noaug_xyz = pb.points[:, -3:]
            return gather_point_instances(
                noaug_xyz, pb.batch_idx, pt_valid, cam)

        _timeit("mask_sub:gather(points_in_mask)",
                lambda *a: mgather(*a)[0], pb, cam, pt_valid_s,
                iters=args.iters)
        obj_ids_s, obj_scores_s = jax.jit(mgather)(pb, cam, pt_valid_s)
        np.asarray(obj_ids_s.reshape(-1)[:1])

        _timeit("mask_sub:cls(per_point_class_scores)",
                lambda a, b0: per_point_class_scores(a, b0),
                obj_ids_s, obj_scores_s, iters=args.iters)
        cls2d_s = jax.jit(per_point_class_scores)(obj_ids_s, obj_scores_s)
        np.asarray(cls2d_s.reshape(-1)[:1])

        def mlps(vars_, seg_feats, cls2d, pt_valid):
            def run(m, seg_feats, cls2d, pt_valid):
                sf = seg_feats + m.seg_enhance_mlp(cls2d, pt_valid, False)
                sf = sf * pt_valid[:, None].astype(sf.dtype)
                return m.seg_head(sf, pt_valid, False)
            return model.apply(
                vars_, seg_feats, cls2d, pt_valid, method=run)

        _timeit("mask_sub:mlps(enhance+head)",
                lambda *a: mlps(*a)["seg_logits"],
                vars_, seg_feats_s, cls2d_s, pt_valid_s, iters=args.iters)


if __name__ == "__main__":
    main()
