"""Stage ablation for the uniform-ladder (h_lad) configs 1b/7 (timing only;
ablated variants produce WRONG results by construction).

Modes: full / nolerp (skip the elementwise lerp) / nomm (skip the ladder
matmul) / nohmm (skip the whole H stage) / novmm / nofilter.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from smolscale_tpu.ops import pallas_bilinear, pallas_128
from smolscale_tpu.plan import ScalePlan
from smolscale_tpu.utils.timing import chain_timer


def run(mode, wi=2048, hi=2048, wo=256, ho=256, ti=0, to=0, B=32):
    pallas_bilinear._ABLATE = mode if mode != "full" else None
    pallas_bilinear._built.cache_clear()
    pallas_128._built.cache_clear()
    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    mod = pallas_bilinear if pallas_bilinear.applicable(plan) else pallas_128
    assert mod.applicable(plan)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (B, hi, wi, 4), dtype=np.uint8)
    up = imgs.reshape(B, hi, wi * 4).view(np.uint32)
    x = jax.device_put(jnp.asarray(up))
    np.asarray(x[0, 0, 0])
    res = chain_timer(
        lambda v: mod.scale_fn(plan, v)[0, 0, 0, 0], x, n_long=10
    )
    per = res.per
    print(f"{mode:10s}: {per*1e3:.3f} ms/batch  {B*wi*hi/1e6/per:.0f} Mpix/s"
          f"  ({res.confidence})", flush=True)
    pallas_bilinear._ABLATE = None
    pallas_bilinear._built.cache_clear()
    pallas_128._built.cache_clear()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    dims = [int(a) for a in args]
    for mode in ["full", "nolerp", "nomm", "nohmm", "novmm", "nofilter"]:
        try:
            run(mode, *dims)
        except Exception as e:
            print(mode, "FAILED", repr(e)[:160], flush=True)
