#!/usr/bin/env python
"""On-chip probe: the four BASELINE ragged deep-box rows (chunk-centric
kernel).  Measures the combined-V-weight + per-channel-limb variants."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from smolscale_tpu.plan import ScalePlan  # noqa: E402
from suite import bench_config  # noqa: E402


def main():
    cfgs = [
        ("RGBA 4096^2->12^2 ragged deep 341:1",
         ScalePlan(4096, 4096, 12, 12, 0, 0, False), 8),
        ("PREMUL16 ragged deep 2048^2->12^2",
         ScalePlan(2048, 2048, 12, 12, 4, 4, False), 8),
        ("sRGB-linear ragged deep 2000^2->7^2",
         ScalePlan(2000, 2000, 7, 7, 0, 0, True), 8),
        ("RGB24 ragged deep 3000^2->9^2",
         ScalePlan(3000, 3000, 9, 9, 8, 8, False), 8),
    ]
    names = sys.argv[1:]
    for name, plan, batch in cfgs:
        if names and not any(n in name for n in names):
            continue
        bench_config(name, plan, batch, n_long=12)


if __name__ == "__main__":
    main()
