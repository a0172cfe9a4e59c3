"""Ablation probe for the sRGB kernel on config 6 (timing only; ablated
variants produce WRONG results by construction).

Monkeypatches pieces of pallas_srgb._make_kernel's closure via module
globals is fragile; instead we rebuild the kernel with stages disabled
through the _ABLATE knob added below (trace-time constant).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from smolscale_tpu.ops import pallas_srgb
from smolscale_tpu.plan import ScalePlan


def run(mode):
    """DUS-chain timing (utils.timing.chain_timer): the earlier whole-input
    XOR chain billed an extra full HBM copy per iteration, which distorted
    both absolutes AND deltas (full-minus-nolut exceeded the suite's
    trustworthy total)."""
    from smolscale_tpu.utils.timing import chain_timer

    pallas_srgb._ABLATE = mode
    pallas_srgb._built.cache_clear()
    plan = ScalePlan(2048, 2048, 256, 256, 4, 4, True)
    rng = np.random.default_rng(0)
    B = 8
    imgs = rng.integers(0, 256, (B, 2048, 2048, 4), dtype=np.uint8)
    x = jax.device_put(
        jnp.asarray(imgs.reshape(B, 2048, 2048 * 4).view(np.uint32))
    )
    np.asarray(x[0, 0, 0])
    res = chain_timer(lambda v: pallas_srgb.scale_fn(plan, v)[0, 0, 0, 0], x)
    per = res.per
    print(f"{mode:12s}: {per*1e3:.3f} ms/batch  "
          f"{B*2048*2048/1e6/per:.0f} Mpix/s  {res.confidence}", flush=True)
    pallas_srgb._ABLATE = None
    pallas_srgb._built.cache_clear()


if __name__ == "__main__":
    for mode in sys.argv[1:] or ["full", "nolut", "nohmm", "novmm", "nofilter"]:
        try:
            run(mode)
        except Exception as e:
            print(mode, "FAILED", repr(e)[:300], flush=True)
