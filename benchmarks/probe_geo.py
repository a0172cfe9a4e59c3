#!/usr/bin/env python
"""On-chip tile-geometry sweep for the 64bpp general kernel.

Times suite-class configs across t_max / jc_out_max overrides
(pallas_bilinear._GEO_OVERRIDE) to find where the grid-step overhead
stops dominating (sub-ms configs run hundreds of sub-us grid steps).
Timing-only; results feed static _geo_kw rules.

Usage: python benchmarks/probe_geo.py [cfg-substr ...]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    import jax
    import jax.numpy as jnp

    from smolscale_tpu.ops import pallas_bilinear as pb
    from smolscale_tpu.plan import ScalePlan
    from smolscale_tpu.utils.timing import chain_timer

    cfgs = [
        ("2: 512->1024 up 0h", ScalePlan(512, 512, 1024, 1024, 1, 0, False), 8),
        ("3b: 4096->3000 0h", ScalePlan(4096, 4096, 3000, 3000, 0, 0, False), 2),
        ("3c: 4096->700 2h", ScalePlan(4096, 4096, 700, 700, 0, 0, False), 4),
        ("3a4: 4096->1371 1h", ScalePlan(4096, 4096, 1371, 1371, 0, 0, False), 4),
        ("8: 4096->4096x256 strip", ScalePlan(4096, 4096, 4096, 256, 0, 0, False), 8),
    ]
    names = sys.argv[1:]
    for name, plan, B in cfgs:
        if names and not any(n in name for n in names):
            continue
        hi, wi = plan.height_in, plan.width_in
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (B, hi, wi, 4), dtype=np.uint8)
        x = jax.device_put(
            jnp.asarray(imgs.reshape(B, hi, wi * 4).view(np.uint32))
        )
        np.asarray(x[0, 0, 0])
        import os
        combos = [(256, 2048, 512), (512, 2048, 1024), (1024, 2048, 2048)
                  ] if os.environ.get("GEO_T") else [
                  (64, 4096, 512), (64, 2048, 512), (64, 1024, 512),
                  (24, 4096, 512)] if os.environ.get("GEO_WIDE") else [
                  (64, 256, 512), (128, 256, 2048), (256, 256, 4096),
                  (128, 512, 2048)] if os.environ.get("GEO_WINROWS") else [
                  (64, 256, 512), (128, 256, 512), (256, 256, 512),
                  (128, 512, 512), (256, 512, 512)]
        for t_max, jm, wr in combos:
            pb._GEO_OVERRIDE = dict(t_max=t_max, jc_out_max=jm, win_rows=wr)
            pb._geometry.cache_clear()
            pb._geometry_for_t.cache_clear()
            pb._built.cache_clear()
            geo = pb._geometry(plan, uniform_ok=True, **pb._geo_kw(plan))
            if geo is None:
                print(f"{name} t_max={t_max} jc={jm}: no geometry", flush=True)
                continue
            step = lambda v: pb.scale_fn(plan, v)[0, 0, 0, 0].astype(jnp.uint32)
            r = chain_timer(step, x)
            steps = B * geo["n_rg"] * geo["n_ct"]
            print(
                f"{name} t_max={t_max} jc={jm} wr={wr}: t={geo['t']} "
                f"jc_out={geo['jc_out']} steps={steps} "
                f"{r.per*1e3:7.3f} ms/batch "
                f"{B*hi*wi/1e6/r.per:8.0f} Mpix/s ±{r.rel*100:.0f}% n={r.n_long}",
                flush=True,
            )
        pb._GEO_OVERRIDE = {}
        pb._geometry.cache_clear()
        pb._geometry_for_t.cache_clear()
        pb._built.cache_clear()


if __name__ == "__main__":
    main()
