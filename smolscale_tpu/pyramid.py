"""Thumbnail-farm API: batched multi-resolution pyramids (BASELINE config 5).

The reference's unit of work is one image per context; high-volume users
drive it from a thread pool.  The TPU-native equivalent batches thousands of
same-shape images into one program launch and optionally shards the batch
axis across a device mesh (pure data parallelism, no collectives).

Mixed-format fleets are handled by grouping: each (shape, format) group
compiles once (plans are hashable); jit caches do the rest.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import numpy as np

from .formats import PixelType
from .plan import ScalePlan


@functools.cache
def _pyramid_jit(plans: tuple, axis: str | None, mesh=None):
    from .backends import xla
    from .ops import pallas_pyramid

    fused = pallas_pyramid.pyramid_dispatch(plans)

    def fn(imgs):
        try:
            on_tpu = jax.default_backend() == "tpu"
        except RuntimeError:  # pragma: no cover
            on_tpu = False
        if on_tpu and xla._FORCE_PALLAS is not False and fused is not None:
            # fused multi-output kernel: each image is read ONCE and the
            # levels share the bilinear lerp (the per-level launches
            # re-read the batch per level; 2.6 -> ~0.6 ms on config 5),
            # incl. unassociated alpha and the 24bpp planes feed
            return fused(imgs)
        return tuple(xla.scale_fn(p, imgs) for p in plans)

    if mesh is not None and axis is not None:
        from jax.sharding import PartitionSpec as P

        fn = jax.shard_map(
            fn, mesh=mesh, in_specs=P(axis),
            out_specs=tuple(P(axis) for _ in plans), check_vma=False,
        )
    return jax.jit(fn)


def make_pyramid_fn(
    width_in: int,
    height_in: int,
    pixel_type_in: PixelType,
    sizes: Sequence[int] = (64, 128, 256),
    pixel_type_out: PixelType | None = None,
    with_srgb: bool = False,
    mesh=None,
    axis: str = "dp",
):
    """Build a jitted fn: (B, H, W, nb) u8 -> tuple of (B, s, s, nb_out) u8.

    Each pyramid level is scaled directly from the source (matching what a
    reference user gets from repeated smol_scale_simple calls -- cascading
    levels would change the numerics).  With ``mesh``, the batch is sharded
    over ``axis``.
    """
    if pixel_type_out is None:
        pixel_type_out = pixel_type_in
    plans = tuple(
        ScalePlan(width_in, height_in, s, s, pixel_type_in, pixel_type_out, with_srgb)
        for s in sizes
    )
    return _pyramid_jit(plans, axis if mesh is not None else None, mesh)


def scale_pyramid_mixed(images, pixel_types, sizes=(64, 128, 256),
                        max_batch_bytes=None, **kw):
    """Convenience for mixed-format, mixed-shape fleets: groups images by
    (shape, pixel_type), runs one batched program per group, and returns
    per-image tuples in input order.

    ``max_batch_bytes`` bounds each device transfer (the TPU-host link
    and HBM are finite; large fleets stream through fixed-size
    sub-batches).  Remainder sub-batches of multi-chunk groups are padded
    to the chunk size by repeating the last image, so each group compiles
    exactly ONE program regardless of fleet size; every sub-batch is
    dispatched before any result is fetched, letting uploads and compute
    of different chunks overlap.
    """
    groups: dict = {}
    for i, (img, pt) in enumerate(zip(images, pixel_types)):
        key = (img.shape, int(pt))
        groups.setdefault(key, []).append(i)
    results = [None] * len(images)
    pending = []
    for (shape, pt), idxs in groups.items():
        h, w = shape[:2]
        fn = make_pyramid_fn(w, h, PixelType(pt), sizes=sizes, **kw)
        per = int(np.prod(shape))
        cap = len(idxs)
        if max_batch_bytes is not None:
            cap = max(1, min(cap, int(max_batch_bytes) // per))
        for c0 in range(0, len(idxs), cap):
            sub = idxs[c0 : c0 + cap]
            stack = [images[i] for i in sub]
            if len(sub) < cap and c0 > 0:  # pad the remainder chunk
                stack = stack + [stack[-1]] * (cap - len(sub))
            batch = np.stack(stack)
            if batch.shape[-1] == 4 and batch.dtype == np.uint8:
                # free host u32 pixel view: skips the on-device u8->u32
                # bitcast, a full tiled-layout relayout copy on TPU (~1 ms
                # per 256-image 512^2 batch, probe_pyramid fused vs
                # fused-u8)
                batch = np.ascontiguousarray(batch).view(np.uint32)[..., 0]
            pending.append((sub, fn(batch)))
    for sub, outs in pending:
        outs = [np.asarray(o) for o in outs]
        for k, i in enumerate(sub):
            results[i] = tuple(o[k] for o in outs)
    return results
