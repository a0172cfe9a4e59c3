"""Fused multi-output pyramid kernel: bit-exactness in interpreter mode.

Each level of pallas_pyramid.pyramid_fn must equal the per-level
numpy_ref.scale output byte for byte (the numpy backend is the semantic
spec, itself oracle-pinned).  Real-TPU exactness is re-certified by the
suite's config-5 gate and fuzz_tpu --pyramid.
"""

from unittest import mock

import numpy as np
import pytest
from jax.experimental import pallas as pl

from smolscale_tpu.backends import numpy_ref
from smolscale_tpu.ops import pallas_pyramid
from smolscale_tpu.plan import ScalePlan

RNG = np.random.default_rng(20260819)

_ORIG = pl.pallas_call


def _interp_call(*a, **k):
    return _ORIG(*a, **k, interpret=True)


def _plans(w, h, sizes, ti=0, to=0):
    return tuple(ScalePlan(w, h, s, s, ti, to, False) for s in sizes)


def _plans_wh(w, h, outs, ti=0, to=0):
    return tuple(ScalePlan(w, h, wo, ho, ti, to, False) for wo, ho in outs)


@pytest.mark.parametrize(
    "w,h,outs,ti,to",
    [
        (512, 512, ((64, 64), (128, 128), (256, 256)), 0, 0),  # config 5
        (512, 512, ((64, 64), (128, 128), (256, 256)), 1, 0),  # BGRA->RGBA
        (256, 128, ((32, 16), (64, 32), (128, 64)), 2, 3),     # ARGB->ABGR
        (1280, 320, ((160, 40), (320, 80)), 3, 3),             # 8:1 / 4:1
    ],
)
def test_pyramid_exact(w, h, outs, ti, to):
    plans = tuple(ScalePlan(w, h, wo, ho, ti, to, False) for wo, ho in outs)
    assert pallas_pyramid.applicable(plans)
    pallas_pyramid._built.cache_clear()
    imgs = RNG.integers(0, 256, (2, h, w, 4), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        outs = pallas_pyramid.pyramid_fn(plans, imgs)
    for p, got in zip(plans, outs):
        want = np.stack([numpy_ref.scale(p, imgs[i]) for i in range(2)])
        assert np.array_equal(want, np.asarray(got)), p
    pallas_pyramid._built.cache_clear()


def test_pyramid_u32_view_and_squeeze():
    plans = _plans(256, 256, (32, 64))
    pallas_pyramid._built.cache_clear()
    img = RNG.integers(0, 256, (256, 256, 4), dtype=np.uint8)
    up = np.ascontiguousarray(img).view(np.uint32)[..., 0]
    with mock.patch.object(pl, "pallas_call", _interp_call):
        outs = pallas_pyramid.pyramid_fn(plans, up)  # unbatched u32 view
    for p, got in zip(plans, outs):
        want = numpy_ref.scale(p, img)
        assert np.array_equal(want, np.asarray(got)), p
    pallas_pyramid._built.cache_clear()


def test_applicable_gates():
    ok = _plans(512, 512, (64, 128, 256))
    assert pallas_pyramid.applicable(ok)
    # box levels (ratio > 8 forces BOX on 512 -> 32) are out
    assert not pallas_pyramid.applicable(_plans(512, 512, (32, 256)))
    # sRGB linearization is out
    assert not pallas_pyramid.applicable(
        tuple(ScalePlan(512, 512, s, s, 0, 0, True) for s in (64, 128))
    )
    # unassoc -> unassoc is out (internal PREMUL16, 128bpp storage)
    assert not pallas_pyramid.applicable(
        tuple(ScalePlan(512, 512, s, s, 4, 4, False) for s in (64, 128))
    )
    # one-sided unassociated alpha is IN (in-kernel premultiply /
    # unpremul epilogue)
    assert pallas_pyramid.applicable(
        tuple(ScalePlan(512, 512, s, s, 4, 0, False) for s in (64, 128))
    )
    assert pallas_pyramid.applicable(
        tuple(ScalePlan(512, 512, s, s, 0, 4, False) for s in (64, 128))
    )
    # single level: nothing to fuse
    assert not pallas_pyramid.applicable(_plans(512, 512, (64,)))
    # duplicate level shapes would alias outputs
    assert not pallas_pyramid.applicable(_plans(512, 512, (64, 64)))
    # non-128-multiple width falls back
    assert not pallas_pyramid.applicable(_plans(320, 512, (40, 80)))
    # over the per-image VMEM budget falls back
    assert not pallas_pyramid.applicable(_plans(2048, 2048, (256, 512)))


@pytest.mark.parametrize(
    "ti,to",
    [
        (4, 0),  # unassoc RGBA in -> premul out: in-kernel SWAR premul
        (5, 1),  # unassoc BGRA in, swizzled
        (0, 4),  # premul in -> unassoc out: unpremul epilogue per level
        (4, 5),  # unassoc in AND unassoc out of a different layout --
                 # still internal PREMUL8? no: 4->5 is unassoc->unassoc
    ],
)
def test_pyramid_unassoc_exact(ti, to):
    plans = _plans_wh(512, 256, ((64, 32), (128, 64), (256, 128)), ti, to)
    if ti >= 4 and to >= 4:
        assert not pallas_pyramid.applicable(plans)  # PREMUL16 class
        return
    assert pallas_pyramid.applicable(plans)
    pallas_pyramid._built.cache_clear()
    imgs = RNG.integers(0, 256, (2, 256, 512, 4), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        outs = pallas_pyramid.pyramid_fn(plans, imgs)
    for p, got in zip(plans, outs):
        want = np.stack([numpy_ref.scale(p, imgs[i]) for i in range(2)])
        assert np.array_equal(want, np.asarray(got)), p
    pallas_pyramid._built.cache_clear()


@pytest.mark.parametrize("ti,to", [(8, 8), (9, 9), (9, 8)])
def test_pyramid_24bpp_planes_exact(ti, to):
    """24bpp fleets ride the channel-major planes feed through the
    4-byte surrogate plans (pyramid_dispatch)."""
    import jax.numpy as jnp

    plans = _plans_wh(512, 256, ((64, 32), (128, 64), (256, 128)), ti, to)
    assert not pallas_pyramid.applicable(plans)  # 3-byte: surrogate path
    fused = pallas_pyramid.pyramid_dispatch(plans)
    assert fused is not None
    pallas_pyramid._built.cache_clear()
    imgs = RNG.integers(0, 256, (2, 256, 512, 3), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        outs = fused(jnp.asarray(imgs))
    for p, got in zip(plans, outs):
        want = np.stack([numpy_ref.scale(p, imgs[i]) for i in range(2)])
        got = np.asarray(got)
        assert got.shape == want.shape
        assert np.array_equal(want, got), p
    pallas_pyramid._built.cache_clear()


def test_pyramid_fn_dispatches_fused(monkeypatch):
    """make_pyramid_fn must route through the fused kernel on TPU."""
    import jax

    from smolscale_tpu import pyramid as pyr
    from smolscale_tpu.ops import pallas_pyramid as pp

    called = {}

    def fake(plans, imgs):
        called["plans"] = plans
        raise RuntimeError("stop after dispatch")

    monkeypatch.setattr(pp, "pyramid_fn", fake)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    pyr._pyramid_jit.cache_clear()
    fn = pyr.make_pyramid_fn(512, 512, 0, sizes=(64, 128, 256))
    img = np.zeros((1, 512, 512, 4), dtype=np.uint8)
    with pytest.raises(RuntimeError, match="stop after dispatch"):
        fn(img)
    assert len(called["plans"]) == 3
    pyr._pyramid_jit.cache_clear()
