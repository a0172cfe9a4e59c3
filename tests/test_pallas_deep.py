"""Chunked-V deep-box kernel: bit-exactness in interpreter mode."""

from unittest import mock

import numpy as np
import pytest
from jax.experimental import pallas as pl

from smolscale_tpu.backends import numpy_ref
from smolscale_tpu.ops import pallas_deep
from smolscale_tpu.plan import ScalePlan

RNG = np.random.default_rng(777)
_ORIG = pl.pallas_call


def _interp_call(*a, **k):
    return _ORIG(*a, **k, interpret=True)


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (1024, 1024, 8, 8, 0, 0),   # 128:1, S64 band (pallas_box VMEM-fails)
        (2048, 2048, 8, 8, 0, 0),   # 256:1, S128 PREMUL8 deep
        (2048, 2048, 8, 8, 4, 4),   # 256:1, PREMUL16 deep (unassoc in+out)
        (2048, 2048, 8, 8, 4, 0),   # unassoc in -> premul
        (2048, 1024, 8, 8, 1, 6),   # reorders, 256:1 x 128:1
        (1024, 4096, 8, 4, 0, 0),   # r_y=1024 -> multi-chunk accumulation
        (1024, 4096, 8, 4, 4, 4),   # multi-chunk PREMUL16
        (1024, 3072, 8, 4, 4, 0),   # non-pow2 chunk divisor (C=384)
        (2000, 2000, 12, 12, 0, 0),  # ragged spans (166.7:1 non-integer)
        (2000, 2000, 12, 12, 4, 4),  # ragged PREMUL16
        (1000, 900, 9, 10, 4, 0),    # ragged S64 band, unassoc in
        (513, 700, 5, 7, 2, 3),      # ragged, odd sizes, reorders
    ],
)
def test_pallas_deep_exact(wi, hi, wo, ho, ti, to):
    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    assert pallas_deep.applicable(plan)
    pallas_deep._built.cache_clear()
    img = RNG.integers(0, 256, (2, hi, wi, 4), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_deep.scale_fn(plan, img))
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)
    pallas_deep._built.cache_clear()


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (1024, 1024, 8, 8, 4, 4),    # sRGB PREMUL16-linear, uniform 128:1
        (1024, 1024, 8, 8, 4, 0),    # sRGB p8l (unassoc -> premul)
        (1024, 1024, 8, 8, 0, 0),    # sRGB premul-in (inv-div prologue)
        (1000, 900, 9, 10, 4, 4),    # sRGB ragged ~100:1 PREMUL16
        (1198, 475, 13, 2, 0, 9),    # 24bpp OUT: pins the pack-variant
                                     # asymmetry the 32bpp surrogate broke
        (1198, 900, 5, 7, 8, 4),     # 24bpp IN (synthesized alpha)
        (1842, 1538, 10, 15, 0, 0),  # span y1 exactly on a chunk boundary
                                     # (512 = 8*C): regression for the
                                     # dropped w2-row + emit (hw fuzz)
        (3516, 745, 54, 6, 9, 8),    # UNPACKED linear H blocks (3*w_out >
                                     # 128 so _h_lane_packed is off):
                                     # regression for the alpha-plane
                                     # block-R correction row using the
                                     # wrong offset name (hw fuzz seed
                                     # 20260908 [06], NameError r_blk)
        (2816, 480, 48, 4, 4, 4),    # unpacked linear, PREMUL16 flavor
    ],
)
def test_pallas_deep_srgb_exact(wi, hi, wo, ho, ti, to):
    plan = ScalePlan(wi, hi, wo, ho, ti, to, True)
    assert pallas_deep.applicable(plan)
    pallas_deep._built.cache_clear()
    pallas_deep._built_general.cache_clear()
    img = RNG.integers(
        0, 256, (2, hi, wi, plan.meta_in.n_bytes), dtype=np.uint8
    )
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_deep.scale_fn(plan, img))
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to,srgb",
    [
        (1024, 1024, 8, 8, 8, 8, False),    # uniform, alpha skipped
        (1024, 1024, 8, 8, 9, 0, False),    # uniform BGR24 -> 32bpp premul
        (2000, 2000, 12, 12, 8, 8, False),  # chunk-centric raw, alpha skipped
        (2000, 2000, 12, 12, 8, 4, False),  # chunk-centric, const alpha plane
        (258, 732, 2, 5, 8, 8, False),      # span-centric general kernel
        (1024, 1024, 8, 8, 8, 8, True),     # sRGB uniform, pack24 direct
        (1198, 900, 5, 7, 8, 4, True),      # sRGB chunk-centric, unassoc out
        (258, 732, 2, 5, 8, 8, True),       # sRGB span-centric general
    ],
)
def test_pallas_deep_planes_exact(wi, hi, wo, ho, ti, to, srgb):
    """Channel-major u8 planes feed for 24bpp deep plans: the premul
    factors and inv-div gather constant-fold; the alpha plane is skipped
    outright when _alpha_unused."""
    import jax.numpy as jnp

    plan = ScalePlan(wi, hi, wo, ho, ti, to, srgb)
    assert pallas_deep.applicable(plan) and plan.meta_in.n_bytes == 3
    for c in (pallas_deep._built, pallas_deep._built_chunked,
              pallas_deep._built_general):
        c.cache_clear()
    img = RNG.integers(0, 256, (2, hi, wi, 3), dtype=np.uint8)
    pls = np.ascontiguousarray(np.moveaxis(img, -1, -3))
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_deep.scale_fn_planes(plan, jnp.asarray(pls)))
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)
    for c in (pallas_deep._built, pallas_deep._built_chunked,
              pallas_deep._built_general):
        c.cache_clear()


def test_deep_planes_via_xla_gate():
    """The _RGB24_PLANES dispatch in xla._scale_fn_impl feeds deep 24bpp
    plans channel-major (mirrors the pallas_box/srgb gate tests)."""
    import jax
    from smolscale_tpu.backends import xla

    plan = ScalePlan(2000, 2000, 12, 12, 8, 8, False)
    assert pallas_deep.applicable(plan) and plan.meta_in.n_bytes == 3
    pallas_deep._built_chunked.cache_clear()
    img = RNG.integers(0, 256, (2, 2000, 2000, 3), dtype=np.uint8)
    xla._FORCE_PALLAS = True
    xla._RGB24_PLANES = True
    try:
        with mock.patch.object(pl, "pallas_call", _interp_call):
            got = np.asarray(jax.jit(lambda v: xla.scale_fn(plan, v))(img))
    finally:
        xla._FORCE_PALLAS = None
        xla._RGB24_PLANES = False
        pallas_deep._built_chunked.cache_clear()
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)


def test_gate():
    # deep linear light is covered too (round 3)
    assert pallas_deep.applicable(ScalePlan(2048, 2048, 8, 8, 4, 4, True))
    # non-integer and non-8-divisible ratios take the ragged variant
    assert pallas_deep.applicable(ScalePlan(4096, 4096, 12, 12, 0, 0))
    assert not pallas_deep._uniform_deep(ScalePlan(4096, 4096, 12, 12, 0, 0))
    assert not pallas_deep._uniform_deep(ScalePlan(2048, 304, 8, 4, 0, 0))


def test_chunk_centric_engages_for_deep_ragged():
    """The chunk-centric walk must take the deep ragged band (its perf
    claim depends on it); the uniform path keeps integer ratios."""
    ragged = ScalePlan(4096, 4096, 12, 12, 0, 0, False)
    assert pallas_deep._chunk_centric(ragged) is not None
    assert not pallas_deep._uniform_deep(ragged)
    uniform = ScalePlan(4096, 4096, 16, 16, 0, 0, False)
    assert pallas_deep._uniform_deep(uniform)
