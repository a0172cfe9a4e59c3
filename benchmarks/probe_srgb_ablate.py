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


def _timed(f, x):
    t0 = time.time()
    np.asarray(f(x))
    return time.time() - t0


def run(mode):
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
    fn = lambda v: pallas_srgb.scale_fn(plan, v)

    def make(k):
        @jax.jit
        def f(v):
            def body(i, c):
                return fn(v ^ c)[0, 0, 0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.uint8(0))
        return f

    f_s, f_l = make(2), make(10)
    np.asarray(f_s(x)); np.asarray(f_l(x))
    ts = min(_timed(f_s, x) for _ in range(3))
    tl = min(_timed(f_l, x) for _ in range(3))
    per = (tl - ts) / 8
    print(f"{mode:12s}: {per*1e3:.2f} ms/batch  {B*2048*2048/1e6/per:.0f} Mpix/s",
          flush=True)
    pallas_srgb._ABLATE = None
    pallas_srgb._built.cache_clear()


if __name__ == "__main__":
    for mode in sys.argv[1:] or ["full", "nolut", "nohmm", "novmm", "nofilter"]:
        try:
            run(mode)
        except Exception as e:
            print(mode, "FAILED", repr(e)[:300], flush=True)
