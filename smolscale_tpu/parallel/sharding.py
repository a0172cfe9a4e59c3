"""Multi-chip scaling: batch (data) sharding and output-row sharding.

The reference's only parallelism is caller-driven threading over contiguous
output-row chunks with a shared read-only context (smol-mt, test.c:839-883;
contract smolscale.h:70-74).  The TPU-native mapping (SURVEY.md §2.6):

* **batch axis ("dp")** — independent images sharded across chips with
  GSPMD; no communication at all (the thumbnail-farm config).
* **row axis ("rows")** — the reference's row-range parallelism: output
  rows split into contiguous chunks, each shard recomputing its own input
  window (recompute-at-edges instead of halo exchange, exactly the
  trade-off the C workers make via their per-worker SmolVerticalCtx,
  smolscale.c:512-530).  Implemented with shard_map + per-shard static
  tables (backends.xla.RowShardTables).

Both compose on a 2D mesh; no collectives are needed anywhere except the
implicit all-gather a replicated input implies -- scaling is embarrassingly
parallel by construction, and the design keeps it that way on ICI.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..backends import xla
from ..plan import ScalePlan


def default_mesh(axis_names=("dp",), devices=None) -> Mesh:
    """A 1D (or reshaped) mesh over all available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if len(axis_names) == 1:
        return Mesh(devices, axis_names)
    # split devices as evenly as possible over two axes
    n = devices.size
    a = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            a = cand
            break
    return Mesh(devices.reshape(a, n // a), axis_names)


def make_batched_scale(plan: ScalePlan, mesh: Mesh, axis: str = "dp"):
    """jit-compiled batched scale with the image batch sharded over ``axis``.

    Input (B, H, W, nb_in) u8, B divisible by the axis size; output
    (B, h, w, nb_out) sharded the same way.  Pure data parallelism with
    zero collectives; shard_map (rather than GSPMD annotations) so the
    per-device body can be the fused Pallas kernel, which XLA's auto
    partitioner cannot split.
    """
    from jax import shard_map

    local = functools.partial(xla.scale_fn, plan)
    fn = shard_map(local, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
                   check_vma=False)
    return jax.jit(fn)


def make_row_sharded_scale(plan: ScalePlan, mesh: Mesh, axis: str = "rows"):
    """Single image, output rows sharded over ``axis`` (smol-mt analogue).

    The input is replicated; each shard dynamic-slices its statically-sized
    input-row window and computes its contiguous chunk of output rows.
    """
    n_shards = mesh.shape[axis]
    tables = xla.RowShardTables(plan, n_shards)
    h_out = plan.height_out

    def local(img_padded):
        sid = jax.lax.axis_index(axis)
        return xla.row_shard_fn(plan, tables, img_padded, sid)

    from jax import shard_map

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=P(),
        out_specs=P(axis),
        check_vma=False,
    )

    @jax.jit
    def fn(img):
        out = sharded(xla.pad_rows(plan, tables, img))
        return out[..., :h_out, :, :]

    return fn


def make_sharded_batch_step(plan: ScalePlan, mesh: Mesh,
                            batch_axis: str = "dp", row_axis: str = "rows"):
    """Full 2D-sharded step: batch over ``batch_axis`` AND output rows over
    ``row_axis``.  This is the framework's "full training step" shape --
    every parallel dimension it supports, composed on one mesh.
    """
    n_row_shards = mesh.shape[row_axis]
    tables = xla.RowShardTables(plan, n_row_shards)
    h_out = plan.height_out

    def local(imgs_padded):
        # imgs_padded: (B/n_dp, pad_h, W, nb) -- batch-local, rows replicated
        sid = jax.lax.axis_index(row_axis)
        return xla.row_shard_fn(plan, tables, imgs_padded, sid)

    from jax import shard_map

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=P(batch_axis),
        out_specs=P(batch_axis, row_axis),
        check_vma=False,
    )

    @jax.jit
    def fn(imgs):
        out = sharded(xla.pad_rows(plan, tables, imgs))
        return out[..., :h_out, :, :]

    return fn
