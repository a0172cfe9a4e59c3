"""smolscale-tpu: a TPU-native image scaling framework.

A from-scratch reimplementation of the capabilities of hpjansson/smolscale —
high-throughput scaling of packed 24/32-bpp raster images with box and
bilinear+halving filters, premultiplied/unassociated alpha, optional
sRGB-linear light, and fused format conversion — redesigned for TPUs:

* the planner (filter selection, fixed-point precalc, LUTs) runs at trace
  time and bakes into compiled programs (:mod:`smolscale_tpu.plan`);
* the compute path is JAX/XLA + Pallas over per-channel int32 planes with
  numerics bit-exact to the C reference's generic backend
  (:mod:`smolscale_tpu.backends`);
* the row-batch API becomes sharded grids; a batched-images axis scales
  thousands of thumbnails per program launch across a device mesh
  (:mod:`smolscale_tpu.parallel`).

Public API mirrors smolscale.h:47-82 in spirit:
    scale_simple(img, type_in, w_out, h_out, type_out, with_srgb=...)
    ScalePlan(...) + scale(plan, img) / scale_rows(plan, img, first, n)
"""

from __future__ import annotations

import numpy as np

from .formats import AlphaType, GammaType, PixelType, StorageType, get_meta
from .plan import FilterType, ScalePlan

__all__ = [
    "AlphaType",
    "FilterType",
    "GammaType",
    "PixelType",
    "ScalePlan",
    "StorageType",
    "get_meta",
    "scale",
    "scale_rows",
    "scale_simple",
]

__version__ = "0.1.0"

_BACKENDS = {}


def _get_backend(name: str):
    if name == "auto":
        try:
            return _get_backend("jax")
        except ImportError:
            return _get_backend("numpy")
    if name not in _BACKENDS:
        if name == "numpy":
            from .backends import numpy_ref as mod
        elif name == "jax":
            from .backends import xla as mod
        elif name == "native":
            from .backends import native as mod
        else:
            raise ValueError(f"unknown backend {name!r}")
        _BACKENDS[name] = mod
    return _BACKENDS[name]


def scale(plan: ScalePlan, img, backend: str = "auto", post_fn=None):
    """Scale one image according to ``plan``; returns uint8 array.

    ``post_fn`` is the analogue of the reference's per-output-row user
    callback (SmolPostRowFunc, smolscale.h:37-39, installed via
    smol_scale_new_full): a function applied to the output pixels before
    they are returned (it receives the whole uint8 output array; rows are
    its first axis).  On the jax backend a traceable post_fn is FUSED into
    the compiled program (no host round-trip); other backends apply it on
    the host result.
    """
    mod = _get_backend(backend)
    if post_fn is not None and mod.__name__.endswith("xla"):
        return mod.scale(plan, img, post_fn=post_fn)
    out = mod.scale(plan, img)
    return post_fn(out) if post_fn is not None else out


def scale_rows(plan: ScalePlan, img, first_out_row: int, n_out_rows: int,
               backend: str = "auto"):
    """Produce only output rows [first, first+n) — the row-batch API
    (smol_scale_batch_full analogue, smolscale.c:998-1008)."""
    return _get_backend(backend).scale_rows(plan, img, first_out_row, n_out_rows)


def scale_simple(
    img: np.ndarray,
    pixel_type_in: PixelType,
    width_out: int,
    height_out: int,
    pixel_type_out: PixelType | None = None,
    with_srgb: bool = False,
    backend: str = "auto",
):
    """One-shot scale (smol_scale_simple analogue, smolscale.c:957-985)."""
    if pixel_type_out is None:
        pixel_type_out = pixel_type_in
    h_in, w_in = img.shape[:2]
    plan = ScalePlan(
        w_in, h_in, width_out, height_out, pixel_type_in, pixel_type_out, with_srgb
    )
    return scale(plan, img, backend=backend)
