#!/usr/bin/env python
"""Stage ablation for the fused multi-output pyramid kernel (config 5).

VERDICT r4 item 2: 246k pyr/s vs the ~670k read-once DMA floor -- where
do the other 0.66 ms go?  Modes (timing only; everything but `full` is
WRONG by construction):

  full      shipping kernel (V ladder as sublane reshapes)
  nolerp    skip the packed SWAR H average
  nobase    skip the base compaction matmul (slice the limbs)
  nolad     skip the per-level ladder matmuls (slice the base)
  nov       skip the V lerp/ladder reshapes
  nofilter  DMA + limb prep + pack only

Usage: python benchmarks/probe_pyramid_ablate.py [mode,mode,...]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from smolscale_tpu.ops import pallas_pyramid
from smolscale_tpu.plan import ScalePlan
from smolscale_tpu.utils.timing import chain_timer


def run(mode, B=256):
    cm0 = pallas_pyramid._V_CM
    if mode.startswith("cm="):  # V chunk-height sweep (exact)
        pallas_pyramid._V_CM = int(mode[3:])
        pallas_pyramid._ABLATE = None
        mode_is_exact = True
    else:
        pallas_pyramid._ABLATE = mode if mode != "full" else None
        mode_is_exact = mode == "full"
    pallas_pyramid._built.cache_clear()
    plans = tuple(
        ScalePlan(512, 512, s, s, 0, 0, False) for s in (64, 128, 256)
    )
    assert pallas_pyramid.applicable(plans)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (B, 512, 512, 4), dtype=np.uint8)
    up = imgs.reshape(B, 512, 512 * 4).view(np.uint32)
    x = jax.device_put(jnp.asarray(up))
    np.asarray(x[0, 0, 0])
    fn = jax.jit(lambda v: pallas_pyramid.pyramid_fn(plans, v))
    exact = ""
    if mode_is_exact:
        from smolscale_tpu.backends import numpy_ref

        outs = fn(x[:2])
        ok = all(
            np.array_equal(np.asarray(o)[i], numpy_ref.scale(p, imgs[i]))
            for p, o in zip(plans, outs) for i in range(2)
        )
        exact = "exact" if ok else "MISMATCH"

    def step(v):
        outs = fn(v)
        return sum(o[0, 0, 0, 0].astype(jnp.uint32) for o in outs)

    res = chain_timer(step, x, n_long=8)
    per = res.per
    print(f"{mode:10s}: {per*1e3:.3f} ms/batch  {B/per:.0f} pyr/s  "
          f"({res.confidence}) {exact}", flush=True)
    pallas_pyramid._ABLATE = None
    pallas_pyramid._V_CM = cm0
    pallas_pyramid._built.cache_clear()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    modes = args[0].split(",") if args else [
        "full", "nolerp", "nobase", "nolad", "nov", "nofilter",
    ]
    for mode in modes:
        try:
            run(mode)
        except Exception as e:
            print(mode, "FAILED", repr(e)[:160], flush=True)
