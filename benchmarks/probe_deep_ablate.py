#!/usr/bin/env python
"""On-chip ablation of the chunk-centric ragged deep-box kernel on the
sRGB-linear and PREMUL16 configs: where does the time go between the
unpack/linearize VPU prologue (nounpack), the H span matmuls (nohmm),
and the per-row V classification (noclass)?  Timing-only -- every mode
except `full` breaks bit-exactness by construction."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from smolscale_tpu.ops import pallas_deep  # noqa: E402
from smolscale_tpu.plan import ScalePlan  # noqa: E402
from suite import bench_config  # noqa: E402


def main():
    cfgs = [
        ("srgb-lin ragged 2000^2->7^2",
         ScalePlan(2000, 2000, 7, 7, 0, 0, True), 8),
        ("premul16 ragged 2048^2->12^2",
         ScalePlan(2048, 2048, 12, 12, 4, 4, False), 8),
    ]
    modes = ["full", "nounpack", "nohmm", "noclass"]
    if len(sys.argv) > 1:
        modes = sys.argv[1].split(",")
    if len(sys.argv) > 2:  # substring filter on config names
        cfgs = [c for c in cfgs if sys.argv[2] in c[0]]
    for name, plan, batch in cfgs:
        for mode in modes:
            pallas_deep._ABLATE = None if mode == "full" else mode
            pallas_deep._built_chunked.cache_clear()
            pallas_deep._built_general.cache_clear()
            try:
                bench_config(f"{name} [{mode}]", plan, batch,
                             check=(mode == "full"), n_long=8)
            finally:
                pallas_deep._ABLATE = None


if __name__ == "__main__":
    main()
