#!/usr/bin/env python
"""Where does the thumbnail-farm (config 5) time go?

The pyramid = three uniform f=128 ladder levels (2h/1h/0h) over the same
(256, 512, 512, 4) u8 batch.  Config 5 moves 3 x 268 MB of reads in
4.23 ms = 190 GB/s, while the same ladder class standalone (config 1b)
runs at ~509 GB/s.  Variants:

  lvl64 / lvl128 / lvl256 -- each level alone through bench_config
                             (u32 host view feed, like every other config)
  pyr                     -- the shipping make_pyramid_fn (u8 feed)
  pyr-u32                 -- pyramid fn fed the host u32 pixel view

Usage: python benchmarks/probe_pyramid.py [variant ...]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from smolscale_tpu.plan import ScalePlan  # noqa: E402
from suite import bench_config, bench_pyramid, _chain_timer  # noqa: E402


def bench_pyr_u32():
    import jax
    import jax.numpy as jnp

    from smolscale_tpu.pyramid import make_pyramid_fn

    B = 256
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (B, 512, 512, 4), dtype=np.uint8)
    up = imgs.reshape(B, 512, 512 * 4).view(np.uint32)
    x = jax.device_put(jnp.asarray(up))
    _ = np.asarray(x[0, 0, 0])
    fn = make_pyramid_fn(512, 512, 0, sizes=(64, 128, 256))

    def step(v):
        outs = fn(v)
        return outs[0][0, 0, 0, 0]

    res = _chain_timer(step, x, n_long=8)
    per = res.per
    print({"config": "pyr-u32", "ms_per_batch": round(per * 1000, 3),
           "pyramids_s": round(B / per, 1), "confidence": res.confidence,
           "n_chain": res.n_long})


def bench_fused(u32=True):
    import jax
    import jax.numpy as jnp

    from smolscale_tpu.backends import numpy_ref
    from smolscale_tpu.ops import pallas_pyramid
    from smolscale_tpu.plan import ScalePlan

    B = 256
    plans = tuple(ScalePlan(512, 512, s, s, 0, 0, False) for s in (64, 128, 256))
    assert pallas_pyramid.applicable(plans)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (B, 512, 512, 4), dtype=np.uint8)
    feed = imgs.reshape(B, 512, 512 * 4).view(np.uint32) if u32 else imgs
    x = jax.device_put(jnp.asarray(feed))
    _ = np.asarray(x[0, 0, 0])
    fn = jax.jit(lambda v: pallas_pyramid.pyramid_fn(plans, v))

    outs = fn(x[:2])
    exact = all(
        np.array_equal(
            np.asarray(o)[i], numpy_ref.scale(p, imgs[i])
        )
        for p, o in zip(plans, outs) for i in range(2)
    )

    def step(v):
        return fn(v)[0][0, 0, 0, 0]

    res = _chain_timer(step, x, n_long=8)
    per = res.per
    print({"config": f"pyr-fused{'-u32' if u32 else ''}",
           "ms_per_batch": round(per * 1000, 3),
           "pyramids_s": round(256 / per, 1), "bit_exact": exact,
           "confidence": res.confidence, "n_chain": res.n_long})


def main():
    variants = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "lvl64", "lvl128", "lvl256", "pyr", "pyr-u32"]
    for v in variants:
        if v == "pyr":
            bench_pyramid()
        elif v == "pyr-u32":
            bench_pyr_u32()
        elif v == "fused":
            bench_fused(u32=True)
        elif v == "fused-u8":
            bench_fused(u32=False)
        else:
            s = int(v[3:])
            bench_config(f"pyr level 512^2->{s}^2 batch 256",
                         ScalePlan(512, 512, s, s, 0, 0, False), 256,
                         n_long=8)


if __name__ == "__main__":
    main()
