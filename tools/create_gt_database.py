"""Build the GT-paste object database from a training info pickle.

Counterpart of mmdet3d's ``create_groundtruth_database`` (the reference's
GT-paste source, loading.py:416-533 consumes it): crop every annotated
object's points into a per-class pickle that ``GTPasteSampler`` draws from.

    python tools/create_gt_database.py --info-pkl data/infos_train.pkl \
        --data-root data/nuscenes --out data/gt_db.pkl
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--info-pkl", required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-points", type=int, default=5)
    ap.add_argument("--max-samples", type=int, default=0)
    args = ap.parse_args()

    from fullysparsefusion_tpu.data.nuscenes import NuScenesReader
    from fullysparsefusion_tpu.data.gt_sampling import build_gt_database
    from fullysparsefusion_tpu.config import FSDConfig

    class_names = FSDConfig().class_names
    reader = NuScenesReader(
        info_path=args.info_pkl, data_root=args.data_root,
        class_names=class_names, training=False, with_cbgs=False,
    )
    n = min(len(reader), args.max_samples) if args.max_samples else len(reader)

    def samples():
        for i in range(n):
            yield reader.sample(i, augment=False)

    counts = build_gt_database(samples(), class_names, args.out, args.min_points)
    print({k: v for k, v in counts.items() if v})
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
