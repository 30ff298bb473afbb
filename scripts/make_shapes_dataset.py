#!/usr/bin/env python
"""Generate the synthetic-shapes COCO-format detection benchmark.

Reproducible accuracy dataset for environments without real COCO data
(reference measures mAP via scripts/evaluate.py:129-164; this provides the
dataset side of that measurement).

Usage:
    python scripts/make_shapes_dataset.py --root data/shapes --train 4000 --val 500
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="Generate shapes detection dataset")
    p.add_argument("--root", default="data/shapes")
    p.add_argument("--train", type=int, default=4000)
    p.add_argument("--val", type=int, default=500)
    p.add_argument("--size", type=int, default=416)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-classes", type=int, default=8, choices=(8, 80),
                   help="taxonomy: 8 geometry classes, or the 80-class "
                        "shape x color-family x fill grid (reference scale)")
    args = p.parse_args()

    from hvs_tpu.data.shapes import generate_dataset

    t0 = time.time()
    paths = generate_dataset(
        args.root, num_train=args.train, num_val=args.val, size=args.size,
        seed=args.seed, num_classes=args.num_classes,
    )
    print(f"generated {args.train}+{args.val} images at {args.size}^2 "
          f"({args.num_classes} classes) in {time.time() - t0:.1f}s")
    for split, path in paths.items():
        print(f"  {split}: {path}")


if __name__ == "__main__":
    main()
