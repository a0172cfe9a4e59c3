#!/usr/bin/env python
"""Headline benchmark: batched RGBA 4096^2 -> 256^2 box downscale, one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s/chip", "vs_baseline": N}

vs_baseline is measured value / 5000 (the BASELINE.json north-star of
5 Gpix/s/chip).  The measured output is verified bit-exact against the
numpy reference backend (itself oracle-exact) before timing; a mismatch
reports value 0 rather than a fast-but-wrong number.

Timing methodology: the axon remote platform's block_until_ready is not a
reliable completion barrier, so iterations are serialized through a data
dependency and the chain is forced with a host fetch; per-iteration time is
the slope between a short and a long chain, which cancels dispatch and
fetch overheads.  The dependency is a 1-element dynamic_update_slice of an
output scalar into the loop-carried input (XLA performs it in place): the
kernel must re-run every iteration, but no input copy is charged to it --
the reference's harness likewise re-scales the same canvas per rep
(test.c:219-340).  (Rounds 1-2 XOR'd the whole input per iteration, which
billed an extra full-image copy to every config: 1.67 ms of the headline's
reported 2.85.)
"""

import json
import subprocess
import sys

import numpy as np


def _device_reachable(timeout_s: int = 240) -> bool:
    """Probe device init in a subprocess: when the axon TPU tunnel is down,
    jax's backend init HANGS (no error), which would hang this whole
    benchmark.  A probe that cannot list devices within the timeout makes
    the benchmark fail fast with a structured line instead."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True,
        )
        return "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    if not _device_reachable():
        print(json.dumps({
            "metric": "Mpix/s/chip, batched RGBA 4096^2->256^2 box downscale,"
                      " bit-exact vs C ref",
            "value": 0.0,
            "unit": "Mpix/s",
            "vs_baseline": 0.0,
            "error": "device backend unreachable (axon TPU tunnel down;"
                     " init hung past the probe timeout)",
        }))
        return 1

    import jax
    import jax.numpy as jnp

    from smolscale_tpu.backends import numpy_ref, xla
    from smolscale_tpu.plan import ScalePlan

    B = 8
    W = H = 4096
    plan = ScalePlan(W, H, 256, 256, 0, 0, False)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (B, H, W, 4), dtype=np.uint8)

    # upload the (free) host u32 pixel view: the on-device u8->u32 bitcast
    # is a full tiled-layout relayout copy (~0.9 ms on this 512 MB batch)
    x = jax.device_put(jnp.asarray(imgs.reshape(B, H, W * 4).view(np.uint32)))
    _ = np.asarray(x[0, 0, 0])

    # correctness gate THROUGH THE TIMED ENTRY: same packed-u32 pixel-view
    # path that the chain below runs, so a packed-path-only regression
    # zeroes the reported value
    got = np.asarray(jax.jit(lambda v: xla.scale_fn(plan, v))(x[:1]))[0]
    want = numpy_ref.scale(plan, imgs[0])
    exact = bool(np.array_equal(got, want))

    # shared auto-scaling chain timer (smolscale_tpu/utils/timing.py):
    # the traced trip count makes growing the chain free, so the long
    # chain auto-extends until two slope estimates agree within 5% --
    # sub-ms headline runs stop swinging with tunnel jitter
    from smolscale_tpu.utils.timing import chain_timer

    res = chain_timer(
        lambda v: xla.scale_fn(plan, v)[0, 0, 0, 0], x,
        n_long=22, target_rel=0.05, min_delta=15e-3,
    )
    per = res.per
    mpix_s = B * W * H / 1e6 / per

    value = round(mpix_s if exact else 0.0, 1)
    print(
        json.dumps(
            {
                "metric": "Mpix/s/chip, batched RGBA 4096^2->256^2 box downscale, bit-exact vs C ref",
                "value": value,
                "unit": "Mpix/s",
                "vs_baseline": round(value / 5000.0, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
