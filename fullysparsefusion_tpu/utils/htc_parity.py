"""HTC activation-parity harness — per-module comparison vs mmdet.

The HTC graph (models/htc.py) maps an mmdet checkpoint tensor-for-tensor
(train/torch_map.py::_htc_entries), but checkpoint files are unobtainable in
this environment, so numerical parity of the *activations* has never run.
This harness makes that a five-minute job the moment a checkpoint appears:

  1. on any machine with mmdet + the checkpoint, dump reference activations
     with the template printed by ``tools/htc_parity.py --print-torch-snippet``
     (forward hooks on backbone/neck/rpn/semantic + fixed-RoI head runs);
  2. here: ``tools/htc_parity.py dump --ckpt htc.pth --image img.npy
     --rois rois.npy --out ours.npz``;
  3. ``tools/htc_parity.py compare theirs.npz ours.npz`` → per-module
     max-abs/rel table, first divergent module named.

Design notes:
  * Upstream modules (backbone → FPN → RPN → semantic) are compared on the
    raw image — they are deterministic functions of it.
  * Cascade bbox/mask stages are compared on EXTERNALLY FIXED RoIs: tiny
    upstream drift flips discrete proposal selection (top-k, NMS), which
    would bury real head bugs in selection noise. Feeding both frameworks
    the same RoI set isolates each head (the same discipline as
    tests/test_torch_map.py round-trips weights tensor-by-tensor).
  * Keys are a stable, ordered contract (``ACTIVATION_ORDER``) so reports
    always identify the EARLIEST divergent module — downstream modules
    diverge for free once an upstream one does.

Reference graph being compared: mmdet HTC with ResNeXt-101-64x4d + DCN
(SURVEY §2.7 #13; nuImages config in the reference README).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

# canonical tap order — earliest module first
ACTIVATION_ORDER: Tuple[str, ...] = (
    "backbone.c2", "backbone.c3", "backbone.c4", "backbone.c5",
    "fpn.p2", "fpn.p3", "fpn.p4", "fpn.p5", "fpn.p6",
    "rpn.cls.l0", "rpn.cls.l1", "rpn.cls.l2", "rpn.cls.l3", "rpn.cls.l4",
    "rpn.reg.l0", "rpn.reg.l1", "rpn.reg.l2", "rpn.reg.l3", "rpn.reg.l4",
    "semantic.logits", "semantic.embed",
    "roi.bbox_feats0", "bbox_head0.cls", "bbox_head0.reg", "bbox_head0.rois",
    "roi.bbox_feats1", "bbox_head1.cls", "bbox_head1.reg", "bbox_head1.rois",
    "roi.bbox_feats2", "bbox_head2.cls", "bbox_head2.reg", "bbox_head2.rois",
    "roi.mask_feats",
    "mask_head0.logits", "mask_head1.logits", "mask_head2.logits",
)

_TOP_MODULES = ("backbone", "neck", "rpn_head", "semantic_head")


def dump_jax_activations(
    model, variables, images, rois: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Run our HTC and return the canonical activation dict.

    ``images`` [1, H, W, 3] RGB 0-255; ``rois`` [P, 4] xyxy image pixels
    (optional — without them only the image-level taps are produced).
    """
    import jax.numpy as jnp

    _, state = model.apply(
        variables, images,
        capture_intermediates=lambda m, _method: m.name in _TOP_MODULES,
    )
    inter = state["intermediates"]
    acts: Dict[str, np.ndarray] = {}
    c_list = inter["backbone"]["__call__"][0]
    for i, c in enumerate(c_list):
        acts[f"backbone.c{i + 2}"] = np.asarray(c)
    p_list = inter["neck"]["__call__"][0]
    for i, p in enumerate(p_list):
        acts[f"fpn.p{i + 2}"] = np.asarray(p)
    cls_lvls, reg_lvls = inter["rpn_head"]["__call__"][0]
    for i, (c, r) in enumerate(zip(cls_lvls, reg_lvls)):
        acts[f"rpn.cls.l{i}"] = np.asarray(c)
        acts[f"rpn.reg.l{i}"] = np.asarray(r)
    sem_logits, sem_embed = inter["semantic_head"]["__call__"][0]
    acts["semantic.logits"] = np.asarray(sem_logits)
    acts["semantic.embed"] = np.asarray(sem_embed)

    if rois is not None:
        acts.update(
            {k: np.asarray(v) for k, v in model.apply(
                variables, images, jnp.asarray(rois, jnp.float32),
                method=_fixed_roi_taps,
            ).items()}
        )
    return acts


def _fixed_roi_taps(m, images, rois):
    """Cascade bbox/mask taps on a FIXED RoI set (mirrors HTC.__call__'s
    per-stage flow, models/htc.py, with the proposal machinery bypassed)."""
    import jax.numpy as jnp
    from ..models.htc import delta_decode

    ih, iw = images.shape[1], images.shape[2]
    x = m._normalize(images.astype(jnp.float32))
    pyramid = m.neck(m.backbone(x))
    _, sem_embed = m.semantic(pyramid)
    pyr0 = [p[0] for p in pyramid]
    valid = jnp.ones((rois.shape[0],), bool)
    taps = {}
    r = rois
    for si in range(3):
        feats = m._roi_feats(pyr0, sem_embed[0], r, valid, 7)
        taps[f"roi.bbox_feats{si}"] = feats
        cls, reg = m.bbox_heads[si](feats)
        taps[f"bbox_head{si}.cls"] = cls
        taps[f"bbox_head{si}.reg"] = reg
        r = delta_decode(r, reg, m.stage_stds[si], (ih, iw))
        taps[f"bbox_head{si}.rois"] = r
    mfeats = m._roi_feats(pyr0, sem_embed[0], rois, valid, 14)
    taps["roi.mask_feats"] = mfeats
    last = None
    for si in range(3):
        lg, last = m.mask_heads[si](mfeats, last)
        taps[f"mask_head{si}.logits"] = lg
    return taps


def save_activations(acts: Dict[str, np.ndarray], path: str) -> None:
    np.savez_compressed(path, **acts)


def load_activations(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def compare_activations(
    ref: Dict[str, np.ndarray],
    ours: Dict[str, np.ndarray],
    atol: float = 1e-3,
    rtol: float = 1e-3,
) -> List[Dict]:
    """Ordered per-module report. Each row: name, shapes, max_abs, max_rel,
    ok. Rows appear in ``ACTIVATION_ORDER`` so the first not-ok row is the
    earliest divergent module; keys present on only one side report
    ok=False with max_abs=None (a naming-contract violation)."""
    keys = [k for k in ACTIVATION_ORDER if k in ref or k in ours]
    keys += sorted((set(ref) | set(ours)) - set(keys))  # unexpected extras
    rows = []
    for k in keys:
        a, b = ref.get(k), ours.get(k)
        if a is None or b is None:
            rows.append(dict(name=k, shape_ref=None if a is None else a.shape,
                             shape_ours=None if b is None else b.shape,
                             max_abs=None, max_rel=None, ok=False))
            continue
        if tuple(a.shape) != tuple(b.shape):
            rows.append(dict(name=k, shape_ref=a.shape, shape_ours=b.shape,
                             max_abs=None, max_rel=None, ok=False))
            continue
        a64 = a.astype(np.float64)
        b64 = b.astype(np.float64)
        diff = np.abs(a64 - b64)
        max_abs = float(diff.max()) if diff.size else 0.0
        denom = np.maximum(np.abs(a64), 1e-12)
        max_rel = float((diff / denom).max()) if diff.size else 0.0
        ok = bool(np.all(diff <= atol + rtol * np.abs(a64)))
        rows.append(dict(name=k, shape_ref=a.shape, shape_ours=b.shape,
                         max_abs=max_abs, max_rel=max_rel, ok=ok))
    return rows


def first_divergent(rows: List[Dict]) -> Optional[str]:
    for r in rows:
        if not r["ok"]:
            return r["name"]
    return None
