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
    "scale_streamed",
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


def scale(plan: ScalePlan, img, backend: str = "auto", post_fn=None,
          out=None):
    """Scale one image according to ``plan``; returns uint8 array.

    ``post_fn`` is the analogue of the reference's per-output-row user
    callback (SmolPostRowFunc, smolscale.h:37-39, installed via
    smol_scale_new_full): a function applied to the output pixels before
    they are returned (it receives the whole uint8 output array; rows are
    its first axis).  On the jax backend a traceable post_fn is FUSED into
    the compiled program (no host round-trip); other backends apply it on
    the host result.

    ``img`` may be a strided row view (a subimage of a larger canvas —
    the rowstride_in parameter of smol_scale_simple, smolscale.h:47-52):
    the numpy and native backends consume it zero-copy; the jax backend
    copies to a dense device array.  ``out``, if given, is a uint8 array
    (or pixel-contiguous row view — rowstride_out) the result is written
    into; the native backend writes it directly from C.
    """
    mod = _get_backend(backend)
    if post_fn is not None and mod.__name__.endswith("xla"):
        res = mod.scale(plan, img, post_fn=post_fn)
        post_fn = None
    elif mod.__name__.endswith("native") and post_fn is None:
        return mod.scale(plan, img, out=out)
    else:
        res = mod.scale(plan, img)
    if post_fn is not None:
        res = post_fn(res)
    if out is not None:
        np.copyto(out, res)
        return out
    return res


def scale_rows(plan: ScalePlan, img, first_out_row: int, n_out_rows: int,
               backend: str = "auto", out=None):
    """Produce only output rows [first, first+n) — the row-batch API
    (smol_scale_batch_full analogue, smolscale.c:998-1008).  ``out`` is
    the outrows_dest analogue: rows are written into the caller's buffer
    (native: directly from C; others: copied)."""
    mod = _get_backend(backend)
    if mod.__name__.endswith("native"):
        return mod.scale_rows(plan, img, first_out_row, n_out_rows, out=out)
    res = mod.scale_rows(plan, img, first_out_row, n_out_rows)
    if out is not None:
        np.copyto(out, res)
        return out
    return res


def scale_streamed(plan: ScalePlan, img, n_chunks: int = 8,
                   backend: str = "auto", post_fn=None):
    """Generator yielding ``(first_row, rows)`` chunks top to bottom — the
    incremental-consumption pattern of smol_scale_batch + SmolPostRowFunc
    (smolscale.h:37-39, 74-76): a streaming consumer (e.g. a progressive
    encoder) sees output rows as they complete instead of waiting for the
    whole image.  ``post_fn`` is applied per chunk (on the jax backend it
    is fused into each chunk's compiled program).  Chunks are row ranges
    of ~height_out/n_chunks rows; the jax backend compiles once for the
    common chunk height (RowRangeTables windowed execution).
    """
    h = plan.height_out
    n_chunks = max(1, min(n_chunks, h))
    step = -(-h // n_chunks)
    mod = _get_backend(backend)
    fused = post_fn is not None and mod.__name__.endswith("xla")
    for first in range(0, h, step):
        n = min(step, h - first)
        if fused:
            rows = mod.scale_rows(plan, img, first, n, post_fn=post_fn)
        else:
            rows = mod.scale_rows(plan, img, first, n)
            if post_fn is not None:
                rows = post_fn(rows)
        yield first, rows


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
