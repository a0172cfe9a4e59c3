"""Sharded scaling on the 8-virtual-device CPU mesh (conftest sets it up).

Covers the reference's row-batch thread contract (smolscale.h:70-74, smol-mt
test.c:839-883) re-expressed as mesh sharding: contiguous output-row chunks,
recompute-at-window-edges, zero hot-path collectives.
"""

import numpy as np
import pytest

from smolscale_tpu import parallel
from smolscale_tpu.backends import numpy_ref
from smolscale_tpu.plan import ScalePlan

RNG = np.random.default_rng(77)


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to,srgb",
    [
        (40, 37, 30, 29, 0, 0, False),   # bilinear 0h V
        (50, 100, 10, 11, 4, 4, False),  # box V, premul16
        (64, 64, 16, 16, 0, 0, False),   # bilinear 1h V
        (33, 64, 9, 64, 0, 8, True),     # copy V, srgb, 24bpp out
        (20, 1, 10, 7, 0, 0, False),     # one V
        (64, 2000, 16, 7, 0, 0, False),  # deep box V (>255:1)
    ],
)
def test_row_sharded_exact(wi, hi, wo, ho, ti, to, srgb):
    plan = ScalePlan(wi, hi, wo, ho, ti, to, srgb)
    nbi = 3 if ti >= 8 else 4
    img = RNG.integers(0, 256, (hi, wi, nbi), dtype=np.uint8)
    mesh = parallel.default_mesh(("rows",))
    fn = parallel.make_row_sharded_scale(plan, mesh)
    got = np.asarray(fn(img))
    want = numpy_ref.scale(plan, img)
    assert np.array_equal(want, got)


def test_2d_sharded_batch_step():
    mesh = parallel.default_mesh(("dp", "rows"))
    plan = ScalePlan(40, 37, 30, 29, 4, 0, False)
    imgs = RNG.integers(0, 256, (4, 37, 40, 4), dtype=np.uint8)
    fn = parallel.make_sharded_batch_step(plan, mesh)
    got = np.asarray(fn(imgs))
    want = np.stack([numpy_ref.scale(plan, imgs[i]) for i in range(4)])
    assert np.array_equal(want, got)


def test_batched_dp():
    mesh = parallel.default_mesh(("dp",))
    plan = ScalePlan(40, 37, 30, 29, 4, 0, False)
    imgs = RNG.integers(0, 256, (8, 37, 40, 4), dtype=np.uint8)
    fn = parallel.make_batched_scale(plan, mesh)
    got = np.asarray(fn(imgs))
    want = np.stack([numpy_ref.scale(plan, imgs[i]) for i in range(8)])
    assert np.array_equal(want, got)


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (40, 80, 20, 9, 0, 0),     # h_out=9 over 8 shards: ceil 2, 7 rows dup
        (64, 300, 16, 13, 0, 1),   # h_out=13: uneven + unassoc out
        (48, 48, 24, 30, 4, 4),    # upscale V, h_out=30 (not divisible by 8)
    ],
)
def test_row_sharded_uneven_split(wi, hi, wo, ho, ti, to):
    """Output rows NOT divisible by the shard count: trailing shards clamp
    their ranges (RowShardTables row_ranges min()) and the duplicate rows
    are sliced off -- the reference's own batch semantics let ranges cover
    any [first, first+n) (smolscale.h:70-74)."""
    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    img = RNG.integers(0, 256, (hi, wi, 4), dtype=np.uint8)
    mesh = parallel.default_mesh(("rows",))
    assert ho % mesh.shape["rows"] != 0
    fn = parallel.make_row_sharded_scale(plan, mesh)
    got = np.asarray(fn(img))
    want = numpy_ref.scale(plan, img)
    assert np.array_equal(want, got)


def test_sharded_pyramid():
    """Thumbnail-farm pyramid with the batch sharded over the mesh
    (BASELINE config 5 on multiple chips): every level bit-exact."""
    from smolscale_tpu.pyramid import make_pyramid_fn

    mesh = parallel.default_mesh(("dp",))
    imgs = RNG.integers(0, 256, (8, 64, 64, 4), dtype=np.uint8)
    fn = make_pyramid_fn(64, 64, 0, sizes=(8, 16, 24), mesh=mesh)
    outs = [np.asarray(o) for o in fn(imgs)]
    for lvl, s in zip(outs, (8, 16, 24)):
        plan = ScalePlan(64, 64, s, s, 0, 0, False)
        want = np.stack([numpy_ref.scale(plan, imgs[i]) for i in range(8)])
        assert np.array_equal(want, lvl)


@pytest.mark.parametrize("shape,names", [((4, 2), ("dp", "rows")),
                                         ((2, 4), ("dp", "rows"))])
def test_2d_mesh_both_orientations(shape, names):
    """2D dp x rows mesh in both orientations (dp > 2 and rows > 2),
    uneven rows per shard in the 2x4 case."""
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices("cpu")[:8]).reshape(shape)
    mesh = Mesh(devs, names)
    plan = ScalePlan(40, 74, 30, 29, 4, 0, False)
    imgs = RNG.integers(0, 256, (8, 74, 40, 4), dtype=np.uint8)
    fn = parallel.make_sharded_batch_step(plan, mesh)
    got = np.asarray(fn(imgs))
    want = np.stack([numpy_ref.scale(plan, imgs[i]) for i in range(8)])
    assert np.array_equal(want, got)


def test_dryrun_16_devices_4x4():
    """dryrun_multichip at 16 devices (4x4 mesh: dp AND rows both > 2)
    in a clean subprocess (this process's backend is pinned to 8)."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [_sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(16); print('ok')"],
        cwd=root, capture_output=True, text=True, timeout=600,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout
