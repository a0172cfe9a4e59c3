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
