#!/usr/bin/env python
"""On-chip probe: post-gather-edge general box (box3) path in
pallas_bilinear.  Covers suite row 3d (both axes general box) plus
H-only / V-only mixes; every row is bit-exact-gated by bench_config."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from smolscale_tpu.plan import ScalePlan  # noqa: E402
from suite import bench_config  # noqa: E402


def main():
    cfgs = [
        ("3d: RGBA 4096^2->300^2 non-integer box both axes",
         ScalePlan(4096, 4096, 300, 300, 0, 0, False), 8),
        ("h-box3 only: RGBA 4096^2->300x256 (V uniform 16:1)",
         ScalePlan(4096, 4096, 300, 256, 0, 0, False), 8),
        ("v-box3 only: RGBA 4096^2->256x300 (H uniform 16:1)",
         ScalePlan(4096, 4096, 256, 300, 0, 0, False), 8),
        ("3-ch box3: RGB24 4095x4095->300^2",
         ScalePlan(4095, 4095, 300, 300, 0, 0, False), 8),
    ]
    for name, plan, batch in cfgs:
        rec = bench_config(name, plan, batch, n_long=8)
        print(rec, flush=True)


if __name__ == "__main__":
    main()
