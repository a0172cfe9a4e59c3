"""Chain-slope device timer for the axon TPU tunnel.

The axon remote platform's ``block_until_ready`` is not a reliable
completion barrier, so per-iteration time is measured as the slope
between a short and a long in-device ``fori_loop`` chain, forced by a
host fetch — dispatch and fetch overheads cancel in the difference.

Iterations are serialized through a 1-element ``dynamic_update_slice``
of the previous step's output scalar into the loop-carried input (XLA
performs it in place): every step must recompute, but no input copy is
billed to it — the reference harness likewise re-scales the same canvas
per rep (test.c:219-340).

The trip count is a *traced* argument (fori_loop lowers to a dynamic
while_loop), so one compile serves every chain length; that makes
auto-scaling the chain until the estimate clears the tunnel-jitter
floor essentially free.  ``chain_timer`` grows the long chain until
(a) the short/long delta exceeds ``min_delta`` seconds and (b) two
independent slope estimates agree within ``target_rel``, then reports
the measured per-iteration time plus that relative spread as a
confidence figure (VERDICT r2 item 4: every published row carries a
stated, repeatable confidence).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np


@dataclass
class ChainResult:
    per: float        # seconds per iteration (slope estimate)
    rel: float        # relative spread of two independent estimates
    n_long: int       # final long-chain length used
    amortized: bool   # True if the slope collapsed and tl/n was used

    @property
    def confidence(self) -> str:
        if self.amortized:
            return "amortized"
        return f"±{self.rel * 100:.0f}%"


def chain_timer(
    step_fn,
    x,
    n_short: int = 2,
    n_long: int = 12,
    reps: int = 3,
    target_rel: float = 0.10,
    min_delta: float = 10e-3,
    max_long: int = 512,
) -> ChainResult:
    """Measure per-iteration seconds of ``step_fn`` on device array ``x``.

    ``step_fn(img)`` must return a scalar drawn from its output.  The
    chain is compiled once with a dynamic trip count; the long chain is
    tripled until the short/long time delta exceeds ``min_delta`` and two
    back-to-back slope estimates agree within ``target_rel`` (or
    ``max_long`` is hit — sub-ms configs on a jittery tunnel).
    """
    import jax
    import jax.numpy as jnp

    nd = x.ndim

    @jax.jit
    def chain(v, k):
        def body(i, carry):
            img, tag = carry
            upd = img[(slice(0, 1),) * nd] ^ tag.astype(img.dtype)
            img = jax.lax.dynamic_update_slice(img, upd, (0,) * nd)
            return img, step_fn(img).astype(jnp.uint32)

        return jax.lax.fori_loop(0, k, body, (v, jnp.uint32(0)))[1]

    _ = np.asarray(chain(x, n_short))  # compile + warm (one compile total)

    def timed(k):
        t0 = time.time()
        _ = np.asarray(chain(x, k))
        return time.time() - t0

    while True:
        est, ts_all, tl_all = [], [], []
        for _pass in range(2):
            ts = min(timed(n_short) for _ in range(reps))
            tl = min(timed(n_long) for _ in range(reps))
            ts_all.append(ts)
            tl_all.append(tl)
            est.append((tl - ts) / (n_long - n_short))
        ts_min, tl_min = min(ts_all), min(tl_all)
        per = (tl_min - ts_min) / (n_long - n_short)
        delta = tl_min - ts_min
        if per > 0 and est[0] > 0 and est[1] > 0:
            rel = abs(est[0] - est[1]) / ((est[0] + est[1]) / 2)
        else:
            rel = float("inf")
        if (delta >= min_delta and rel <= target_rel) or n_long >= max_long:
            break
        n_long = min(max_long, n_long * 3)

    if per <= 0:
        # pathological jitter: amortized upper bound from the long chain
        return ChainResult(tl_min / n_long, float("nan"), n_long, True)
    return ChainResult(per, rel, n_long, False)
