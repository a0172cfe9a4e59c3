#!/usr/bin/env python
"""On-chip probe: COPY as a first-class axis in the uniform pallas_box
kernel (suite row 8's copy-H x box-V strip and the box-H x copy-V
transpose).  Every row is bit-exact-gated by bench_config."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from smolscale_tpu.plan import ScalePlan  # noqa: E402
from suite import bench_config  # noqa: E402


def main():
    cfgs = [
        ("8: RGBA 4096^2->4096x256 strip (copy-H x box-V 16:1)",
         ScalePlan(4096, 4096, 4096, 256, 0, 0, False), 8),
        ("8t: RGBA 4096^2->256x4096 strip (box-H 16:1 x copy-V)",
         ScalePlan(4096, 4096, 256, 4096, 0, 0, False), 8),
        ("8u: BGRA unassoc 4096^2->4096x256 (copy-H, in-kernel premul)",
         ScalePlan(4096, 4096, 4096, 256, 1, 0, False), 8),
        ("8p: RGB24 4096^2->4096x256 planes (copy-H x box-V)",
         ScalePlan(4096, 4096, 4096, 256, 8, 8, False), 8),
        ("8d: RGBA 4096^2->4096x128 (copy-H x box-V 32:1)",
         ScalePlan(4096, 4096, 4096, 128, 0, 0, False), 8),
    ]
    for name, plan, batch in cfgs:
        rec = bench_config(name, plan, batch, n_long=8)
        print(rec, flush=True)


if __name__ == "__main__":
    main()
