#!/usr/bin/env python
"""One-off TPU probe: premul->unassoc box now rides the fused kernel.

Checks bit-exactness vs numpy_ref on the real chip and times the path
(chain-slope method, see bench.py).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from smolscale_tpu.backends import numpy_ref, xla
from smolscale_tpu.ops import pallas_box
from smolscale_tpu.plan import ScalePlan


def main():
    plan = ScalePlan(4096, 4096, 256, 256, 0, 4, False)  # premul -> unassoc
    assert pallas_box.applicable(plan), "kernel gate"
    B = 2
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, (B, 4096, 4096, 4), dtype=np.uint8)
    x = jax.device_put(jnp.asarray(imgs))
    _ = np.asarray(x[0, 0, 0])

    got = np.asarray(jax.jit(lambda v: xla.scale_fn(plan, v))(x))
    want = np.stack([numpy_ref.scale(plan, imgs[i]) for i in range(B)])
    exact = bool(np.array_equal(got, want))
    print("bit_exact:", exact, flush=True)

    def make(k):
        @jax.jit
        def f(v):
            def body(i, c):
                return xla.scale_fn(plan, v ^ c)[0, 0, 0, 0]

            return jax.lax.fori_loop(0, k, body, jnp.uint8(0))

        return f

    f_s, f_l = make(2), make(12)
    np.asarray(f_s(x)); np.asarray(f_l(x))

    def t(f):
        t0 = time.time(); np.asarray(f(x)); return time.time() - t0

    per = (min(t(f_l) for _ in range(3)) - min(t(f_s) for _ in range(3))) / 10
    mpix = B * 4096 * 4096 / 1e6 / per
    print(f"per-iter {per*1000:.2f} ms -> {mpix:.0f} Mpix/s", flush=True)
    assert exact


if __name__ == "__main__":
    main()
