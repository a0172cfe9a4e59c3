#!/usr/bin/env python
"""Probe: linear-plan chunk budget for the chunk-centric ragged deep kernel.

Config 9c (RGBA premul 2000^2 -> 7^2, sRGB linear light) runs
pallas_deep._built_chunked with C = 128 rows per chunk (the 1 MB linear
budget).  The kernel is VPU-bound on the per-pixel linearization chain, so
the expected lever here is only grid-step amortization (16 -> 8 steps at
2 MB) -- measure whether that's worth anything, and whether Mosaic still
compiles (the budget gate exists because wide linear chunks crash scoped
VMEM; 2048-wide at 1 MB is known-good, 2 MB is the experiment).

Usage: python benchmarks/probe_9c_budget.py

MEASURED (v5e, 2026-08-19): budget_shift=0 (1 MB, C=128, 16 chunks)
21.07 in-Gpix/s bit-exact +-5%; budget_shift=1 (2 MB, C=256) FAILS TO
COMPILE (remote tpu_compile_helper exit 1 -- the Mosaic scoped-VMEM
overflow the budget gate exists for).  Conclusion: 1 MB is the compile
ceiling for 2048-wide linear chunks; the class stays ~21-22 G, bound by
the per-pixel unpremul -> from_srgb-gather -> premul VPU chain (the
round-4 ablation put that stage at 0.85 ms of the then-1.69 ms total),
not by grid-step amortization.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run(budget_shift):
    import jax
    import jax.numpy as jnp

    from smolscale_tpu.backends import numpy_ref, xla
    from smolscale_tpu.formats import GammaType
    from smolscale_tpu.ops import pallas_deep
    from smolscale_tpu.plan import ScalePlan
    from smolscale_tpu.utils.timing import chain_timer

    orig = pallas_deep._chunk_budget

    def patched(plan):
        if plan.gamma == GammaType.SRGB_LINEAR and budget_shift:
            from smolscale_tpu.ops import pallas_bilinear as pg

            w_pad = pg._round_up(plan.width_in, 128)
            if w_pad <= 2048:
                return 2 ** (20 + budget_shift)
        return orig(plan)

    pallas_deep._chunk_budget = patched
    pallas_deep._built_chunked.cache_clear()
    pallas_deep._built_general.cache_clear()
    pallas_deep._built.cache_clear()

    try:
        plan = ScalePlan(2000, 2000, 7, 7, 0, 0, True)
        B = 8
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (B, 2000, 2000, 4), dtype=np.uint8)
        up = imgs.reshape(B, 2000, 2000 * 4).view(np.uint32)
        x = jax.device_put(jnp.asarray(up))
        _ = np.asarray(x[0, 0, 0])

        cc = pallas_deep._chunk_centric(plan)
        got = np.asarray(jax.jit(lambda v: xla.scale_fn(plan, v))(x[:1]))[0]
        exact = bool(np.array_equal(got, numpy_ref.scale(plan, imgs[0])))

        res = chain_timer(
            lambda v: xla.scale_fn(plan, v)[0, 0, 0, 0], x, n_long=8
        )
        rec = {
            "budget_shift": budget_shift,
            "chunk": cc,
            "ms": round(res.per * 1000, 3),
            "in_gpix_s": round(B * 2000 * 2000 / 1e9 / res.per, 2),
            "exact": exact,
            "conf": res.confidence,
        }
        print(json.dumps(rec), flush=True)
        return rec
    except Exception as e:  # compile crash = negative result, keep going
        print(json.dumps({"budget_shift": budget_shift,
                          "error": repr(e)[:300]}), flush=True)
        return None
    finally:
        pallas_deep._chunk_budget = orig
        pallas_deep._built_chunked.cache_clear()
        pallas_deep._built_general.cache_clear()
        pallas_deep._built.cache_clear()


def main():
    for shift in (0, 1):
        run(shift)


if __name__ == "__main__":
    main()
