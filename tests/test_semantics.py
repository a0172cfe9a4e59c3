"""Standalone semantic conformance suite -- the verify.c port (SURVEY.md §4.2).

Unlike the oracle-exactness suites, these tests state the *semantic*
contract directly (no C library needed), mirroring verify.c's four
invariants: channel ordering (verify.c:189-225), unassociated-alpha
averaging (227-301), saturation (343-395), and premul round-trip (397-514).
They run against every backend.
"""

import numpy as np
import pytest

import smolscale_tpu as st
from smolscale_tpu.plan import ScalePlan

BACKENDS = ["numpy", "jax", "native"]


def _scale(backend, plan, img):
    return np.asarray(st.scale(plan, img, backend=backend))


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("axis", ["h", "v"])
def test_ordering(backend, axis):
    """A channel ramp must stay (weakly) monotonic and close to the ideal
    ramp through a 1-pixel shrink in either axis, for a representative set
    of format pairs (verify.c's 2048->2047 analogue with fuzz 2)."""
    n = 1024
    ramp = (np.arange(n) * 255 // (n - 1)).astype(np.uint8)
    if axis == "h":
        img = np.zeros((4, n, 4), np.uint8)
        img[..., 0] = ramp[None, :]
        img[..., 3] = 255
        plan = ScalePlan(n, 4, n - 1, 4, 0, 0, False)
    else:
        img = np.zeros((n, 4, 4), np.uint8)
        img[..., 0] = ramp[:, None]
        img[..., 3] = 255
        plan = ScalePlan(4, n, 4, n - 1, 0, 0, False)
    out = _scale(backend, plan, img)
    vals = out[0, :, 0].astype(int) if axis == "h" else out[:, 0, 0].astype(int)
    assert (np.diff(vals) >= 0).all()
    ideal = np.arange(n - 1) * 255 / (n - 2)
    assert np.abs(vals - ideal).max() <= 2


@pytest.mark.parametrize("backend", BACKENDS)
def test_unassociated_alpha_averaging(backend):
    """Averaging a fully transparent pixel with an opaque one must weight
    color by alpha: the transparent pixel's color must not bleed
    (verify.c:227-301)."""
    img = np.array([[[200, 50, 10, 0], [100, 150, 250, 255]]], dtype=np.uint8)
    plan = ScalePlan(2, 1, 1, 1, st.PixelType.RGBA8_UNASSOCIATED,
                     st.PixelType.RGBA8_UNASSOCIATED, False)
    out = _scale(backend, plan, img)[0, 0].astype(int)
    # alpha averages to ~127; color must be the opaque pixel's, +-graded fuzz
    assert abs(out[3] - 127) <= 1
    assert abs(out[0] - 100) <= 2
    assert abs(out[1] - 150) <= 2
    assert abs(out[2] - 250) <= 2


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("srgb", [False, True])
def test_saturation(backend, srgb):
    """All-0xff input stays 0xff across scale factors (verify.c:343-395)."""
    for wi, hi, wo, ho in [(1, 1, 3, 3), (2, 2, 5, 5), (30, 30, 7, 9),
                           (64, 3, 9, 5), (3, 64, 5, 9)]:
        img = np.full((hi, wi, 4), 0xFF, np.uint8)
        plan = ScalePlan(wi, hi, wo, ho, 0, 0, srgb)
        assert (_scale(backend, plan, img) == 0xFF).all(), (wi, hi, wo, ho)


@pytest.mark.parametrize("backend", BACKENDS)
def test_premul_roundtrip_alpha_exact(backend):
    """Premultiplied -> unassociated conversion preserves alpha exactly for
    every alpha value (verify.c:397-514)."""
    a = np.arange(256, dtype=np.uint8)
    img = np.zeros((1, 256, 4), np.uint8)
    img[0, :, 0] = np.minimum(a, 255)  # valid premul: channel <= alpha
    img[0, :, 3] = a
    plan = ScalePlan(256, 1, 256, 1, st.PixelType.RGBA8_PREMULTIPLIED,
                     st.PixelType.RGBA8_UNASSOCIATED, False)
    out = _scale(backend, plan, img)
    assert np.array_equal(out[0, :, 3], a)
    # and channels where channel == alpha unpremultiply to ~255
    nz = a > 16
    assert np.abs(out[0, nz, 0].astype(int) - 255).max() <= 15


@pytest.mark.parametrize("backend", BACKENDS)
def test_backend_agreement(backend):
    """All backends produce byte-identical results (runtime dispatch
    contract, like the reference's generic/AVX2 interchangeability)."""
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (37, 53, 4), np.uint8)
    plan = ScalePlan(53, 37, 21, 17, 4, 1, True)
    base = _scale("numpy", plan, img)
    assert np.array_equal(base, _scale(backend, plan, img))


def test_post_fn_callback():
    """smol_scale_new_full's post_row_func analogue (smolscale.h:37-39)."""
    img = np.full((8, 8, 4), 100, np.uint8)
    plan = ScalePlan(8, 8, 4, 4, 0, 0, False)
    out = st.scale(plan, img, backend="numpy", post_fn=lambda rows: 255 - rows)
    assert (out == 155).all()
