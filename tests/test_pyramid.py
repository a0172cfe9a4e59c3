"""Thumbnail-farm pyramid API (BASELINE config 5)."""

import numpy as np

from smolscale_tpu import parallel
from smolscale_tpu.backends import numpy_ref
from smolscale_tpu.plan import ScalePlan
from smolscale_tpu.pyramid import make_pyramid_fn, scale_pyramid_mixed

RNG = np.random.default_rng(55)


def test_pyramid_exact():
    imgs = RNG.integers(0, 256, (4, 128, 96, 4), dtype=np.uint8)
    fn = make_pyramid_fn(96, 128, 0, sizes=(16, 32))
    outs = fn(imgs)
    for k, s in enumerate((16, 32)):
        plan = ScalePlan(96, 128, s, s, 0, 0, False)
        for i in range(4):
            assert np.array_equal(
                np.asarray(outs[k][i]), numpy_ref.scale(plan, imgs[i])
            )


def test_pyramid_sharded():
    mesh = parallel.default_mesh(("dp",))
    imgs = RNG.integers(0, 256, (8, 128, 96, 4), dtype=np.uint8)
    fn = make_pyramid_fn(96, 128, 0, sizes=(16,), mesh=mesh)
    (out,) = fn(imgs)
    plan = ScalePlan(96, 128, 16, 16, 0, 0, False)
    want = np.stack([numpy_ref.scale(plan, imgs[i]) for i in range(8)])
    assert np.array_equal(want, np.asarray(out))


def test_mixed_fleet():
    images = [RNG.integers(0, 256, (64, 64, 4), np.uint8) for _ in range(3)]
    images.append(RNG.integers(0, 256, (32, 48, 3), np.uint8))
    res = scale_pyramid_mixed(images, [0, 0, 4, 8], sizes=(8, 16))
    assert res[3][0].shape == (8, 8, 3)
    assert np.array_equal(
        res[2][1], numpy_ref.scale(ScalePlan(64, 64, 16, 16, 4, 4, False), images[2])
    )


def test_mixed_fleet_bounded_batches():
    """max_batch_bytes streams each group through fixed-size sub-batches
    (remainders padded to one program per group); results must be
    identical to the unbounded path, in input order."""
    images = [RNG.integers(0, 256, (64, 64, 4), np.uint8) for _ in range(5)]
    images += [RNG.integers(0, 256, (32, 48, 3), np.uint8) for _ in range(3)]
    types = [0, 4, 0, 0, 4, 8, 8, 8]
    want = scale_pyramid_mixed(images, types, sizes=(8, 16))
    # 2 images per 64^2 sub-batch, 2 per 24bpp sub-batch
    got = scale_pyramid_mixed(images, types, sizes=(8, 16),
                              max_batch_bytes=2 * 64 * 64 * 4)
    for w, g in zip(want, got):
        for wl, gl in zip(w, g):
            assert np.array_equal(wl, gl)
