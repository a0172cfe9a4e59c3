#!/usr/bin/env python
"""Stage ablation + geometry sweep for the PREMUL16 128bpp kernel
(config 7: unassoc->unassoc 2048^2 -> 256^2, 2h ladder both axes).

VERDICT r4 item 1: the PREMUL16 class is the last hot class with
neither a met target nor a recorded roofline.  Modes (timing only;
everything but `full` is WRONG by construction):

  full      shipping kernel
  nopremul  skip the SWAR premultiply products (16-bit stand-in values)
  nolerp    skip the packed-pair f=128 average
  nomm      lerp but skip the H ladder matmuls
  nohmm     skip the whole H stage
  novmm     H but no V
  nofilter  DMA + unpack only (the zero-compute floor)

Geometry variants (exact, so they carry a bit-exactness check):
  geo:t=64,b=12  / geo:t=64,b=10 / geo:jc=256 ...

Usage: python benchmarks/probe_128_ablate.py [mode,mode,...]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from smolscale_tpu.ops import pallas_128, pallas_bilinear
from smolscale_tpu.plan import ScalePlan
from smolscale_tpu.utils.timing import chain_timer


def run(mode, wi=2048, hi=2048, wo=256, ho=256, ti=4, to=4, B=8):
    check = False
    if mode.startswith("geo:"):
        kw = {}
        for part in mode[4:].split(";"):
            k, v = part.split("=")
            kw[{"t": "t_max", "b": "budget_mb", "jc": "jc_out_max"}[k]] = int(v)
        pallas_128._GEO128.update(kw)
        pallas_bilinear._ABLATE = None
        check = True
    else:
        pallas_bilinear._ABLATE = mode if mode != "full" else None
        check = mode == "full"
    pallas_128._built.cache_clear()
    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    assert pallas_128.applicable(plan), mode
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (B, hi, wi, 4), dtype=np.uint8)
    up = imgs.reshape(B, hi, wi * 4).view(np.uint32)
    x = jax.device_put(jnp.asarray(up))
    np.asarray(x[0, 0, 0])
    exact = ""
    if check:
        from smolscale_tpu.backends import numpy_ref

        got = np.asarray(jax.jit(
            lambda v: pallas_128.scale_fn(plan, v))(x[:1]))[0]
        exact = ("exact" if np.array_equal(got, numpy_ref.scale(plan, imgs[0]))
                 else "MISMATCH")
    res = chain_timer(
        lambda v: pallas_128.scale_fn(plan, v)[0, 0, 0, 0], x, n_long=10
    )
    per = res.per
    print(f"{mode:16s}: {per*1e3:.3f} ms/batch  "
          f"{B*wi*hi/1e6/per:.0f} Mpix/s  ({res.confidence}) {exact}",
          flush=True)
    pallas_bilinear._ABLATE = None
    pallas_128._GEO128.clear()
    pallas_128._built.cache_clear()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    modes = args[0].split(",") if args else [
        "full", "nopremul", "nolerp", "nomm", "nohmm", "novmm", "nofilter",
        "geo:t=64;b=12", "geo:t=64;b=10", "geo:jc=256;b=12",
        "geo:t=128;b=12",
    ]
    for mode in modes:
        try:
            run(mode)
        except Exception as e:
            print(mode, "FAILED", repr(e)[:160], flush=True)
