#!/usr/bin/env python
"""On-chip A/B probe: channel-major u8 planes feed for 24bpp inputs
(xla._RGB24_PLANES) vs the default pad+bitcast u32 feed.

Each config runs twice through the full dispatch (suite.bench_config,
bit-exactness gated): once with the flag off, once on.  The flag's
planes path does jnp.moveaxis(img, -1, -3) inside the jitted program,
so the A/B includes the transpose cost -- the honest end-to-end
comparison for deciding the default.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from smolscale_tpu.plan import ScalePlan  # noqa: E402
from suite import bench_config  # noqa: E402


def main():
    from smolscale_tpu.backends import xla

    cfgs = [
        ("3a: RGB24 4096^2->1371^2 (1h ladder)",
         ScalePlan(4096, 4096, 1371, 1371, 8, 8, False), 4),
        ("3b: RGB24 4096^2->3000^2 (0h)",
         ScalePlan(4096, 4096, 3000, 3000, 8, 8, False), 2),
        ("box: RGB24 4096^2->256^2 (16:1 integer)",
         ScalePlan(4096, 4096, 256, 256, 8, 8, False), 8),
        ("6b: RGB24 1920x1080->400x225 sRGB",
         ScalePlan(1920, 1080, 400, 225, 8, 8, True), 8),
        ("deep ragged: RGB24 3000^2->9^2",
         ScalePlan(3000, 3000, 9, 9, 8, 8, False), 8),
        ("deep uniform: RGB24 2048^2->8^2",
         ScalePlan(2048, 2048, 8, 8, 8, 8, False), 8),
        ("deep srgb ragged: RGB24 2000^2->7^2",
         ScalePlan(2000, 2000, 7, 7, 8, 8, True), 8),
    ]
    for name, plan, batch in cfgs:
        for planes in (False, True):
            xla._RGB24_PLANES = planes
            tag = "planes" if planes else "u32"
            try:
                bench_config(f"{name} [{tag}]", plan, batch, n_long=8)
            finally:
                xla._RGB24_PLANES = False


if __name__ == "__main__":
    main()
