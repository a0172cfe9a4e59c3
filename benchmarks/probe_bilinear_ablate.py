"""Stage ablation probe for the general 64bpp kernel (timing only; ablated
variants produce WRONG results by construction).

Default config is 3a (RGB24 4096^2 -> 1371^2, 1h ladder, stride-variable).
Modes: full / nohmm (skip H stage) / novmm (skip V stage) / nofilter (both)
/ nopad (feed pre-padded RGBX u32 views, isolating the 24bpp pad+bitcast).
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from smolscale_tpu.ops import pallas_bilinear
from smolscale_tpu.plan import ScalePlan
from smolscale_tpu.utils.timing import chain_timer


def run(mode, wi=4096, hi=4096, wo=1371, ho=1371, ti=8, to=8, B=4):
    label = mode
    if "@vcm=" in mode:  # e.g. full-planes@vcm=32: dense-V chunk height
        mode, cm = mode.split("@vcm=")
        pallas_bilinear._V_CM = int(cm)
    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    if mode.endswith("-planes"):
        # ablate INSIDE the shipping channel-major planes dispatch path
        # (xla._RGB24_PLANES): the honest floor for 24bpp configs
        from smolscale_tpu.backends import xla
        import jax as _jax
        import jax.numpy as _jnp

        base = mode[: -len("-planes")]
        pallas_bilinear._ABLATE = base if base != "full" else None
        pallas_bilinear._built_planes.cache_clear()
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (B, hi, wi, plan.meta_in.n_bytes),
                            dtype=np.uint8)
        x = _jax.device_put(_jnp.asarray(imgs))
        np.asarray(x[0, 0, 0])
        res = chain_timer(
            lambda v: xla.scale_fn(plan, v)[0, 0, 0, 0].astype(_jnp.uint32),
            x, n_long=10)
        per = res.per
        print(f"{label:14s}: {per*1e3:.2f} ms/batch  "
              f"{B*wi*hi/1e6/per:.0f} Mpix/s  ({res.confidence})",
              flush=True)
        pallas_bilinear._ABLATE = None
        pallas_bilinear._built_planes.cache_clear()
        return
    pallas_bilinear._ABLATE = mode if mode not in ("full", "nopad") else None
    pallas_bilinear._built.cache_clear()
    nb = plan.meta_in.n_bytes
    if nb == 3:
        # 24bpp rides the 32bpp surrogate (xla._adapt_24bpp); "full" pays
        # the on-device pad+bitcast like the dispatch path, "nopad" feeds
        # the pre-padded RGBX u32 view to isolate that toll
        from smolscale_tpu.backends.xla import _adapt_24bpp

        plan, _, _ = _adapt_24bpp(plan)
    assert pallas_bilinear.applicable(plan)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (B, hi, wi, nb), dtype=np.uint8)
    if mode == "nopad" or nb == 4:
        if nb == 3:  # pre-pad on host, upload the u32 view
            imgs = np.concatenate(
                [imgs, np.full((B, hi, wi, 1), 255, np.uint8)], axis=-1
            )
        up = imgs.reshape(B, hi, wi * 4).view(np.uint32)
    else:
        # on-device pad to the surrogate's 4-byte layout (alpha = 255)
        up = imgs
    x = jax.device_put(jnp.asarray(up))
    np.asarray(x[0, 0, 0])
    if up.dtype == np.uint8 and nb == 3:
        inner = lambda v: pallas_bilinear.scale_fn(
            plan, jnp.pad(v, [(0, 0)] * 3 + [(0, 1)], constant_values=255)
        )[0, 0, 0, 0]
        res = chain_timer(inner, x, n_long=10)
        per = res.per
        print(f"{label:10s}: {per*1e3:.2f} ms/batch  "
              f"{B*wi*hi/1e6/per:.0f} Mpix/s  ({res.confidence})", flush=True)
        pallas_bilinear._ABLATE = None
        pallas_bilinear._built.cache_clear()
        return

    # same 1-element DUS chaining as suite.py/bench.py (a whole-input XOR
    # would bill an extra full-image HBM copy per iteration)
    res = chain_timer(
        lambda v: pallas_bilinear.scale_fn(plan, v)[0, 0, 0, 0], x, n_long=10
    )
    per = res.per
    print(f"{label:10s}: {per*1e3:.2f} ms/batch  {B*wi*hi/1e6/per:.0f} Mpix/s"
          f"  ({res.confidence})", flush=True)
    pallas_bilinear._ABLATE = None
    pallas_bilinear._built.cache_clear()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    modes = ["full", "nopad", "nohmm", "novmm", "nofilter"]
    if args and not args[0].isdigit():
        modes = args[0].split(",")
        args = args[1:]
    dims = [int(a) for a in args]
    cm0 = pallas_bilinear._V_CM
    for mode in modes:
        try:
            run(mode, *dims)
        except Exception as e:
            print(mode, "FAILED", repr(e)[:200], flush=True)
        finally:
            pallas_bilinear._V_CM = cm0
            pallas_bilinear._built.cache_clear()
            pallas_bilinear._built_planes.cache_clear()
