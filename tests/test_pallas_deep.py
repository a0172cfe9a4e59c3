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
