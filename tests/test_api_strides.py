"""Rowstride / subimage views and per-chunk streaming — the smolscale.h
parameter-parity items (rowstride_in/out of smol_scale_simple, outrows_dest
of smol_scale_batch_full, per-row SmolPostRowFunc consumption), round-2
VERDICT item 7."""

import numpy as np
import pytest

import smolscale_tpu as st
from smolscale_tpu.plan import ScalePlan

PT = st.PixelType


def _canvas_view(rng, h, w, nb, pad=13):
    """A subimage view inside a larger canvas: strided rows, contiguous
    pixels (the rowstride_in pattern)."""
    canvas = rng.integers(0, 256, (h + 6, w + pad, nb), np.uint8)
    view = canvas[3 : 3 + h, 5 : 5 + w, :]
    assert not view.flags["C_CONTIGUOUS"]
    return view


@pytest.mark.parametrize("backend", ["numpy", "native", "jax"])
@pytest.mark.parametrize("tin,tout,srgb", [
    (PT.RGBA8_PREMULTIPLIED, PT.RGBA8_PREMULTIPLIED, False),
    (PT.BGRA8_UNASSOCIATED, PT.RGB8, True),
    (PT.RGB8, PT.BGR8, False),
])
def test_strided_input_view(backend, tin, tout, srgb):
    rng = np.random.default_rng(7)
    nb = st.get_meta(tin).n_bytes
    view = _canvas_view(rng, 40, 56, nb)
    plan = ScalePlan(56, 40, 23, 17, tin, tout, srgb)
    got = np.asarray(st.scale(plan, view, backend=backend))
    want = np.asarray(st.scale(plan, np.ascontiguousarray(view),
                               backend="numpy"))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("backend", ["numpy", "native", "jax"])
def test_out_buffer_strided(backend):
    """scale(..., out=view) writes into a subregion of a caller canvas
    (rowstride_out / outrows_dest semantics) without touching the rest."""
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (40, 56, 4), np.uint8)
    plan = ScalePlan(56, 40, 23, 17, 0, 0, False)
    canvas = np.full((30, 40, 4), 0xAB, np.uint8)
    out_view = canvas[4 : 4 + 17, 6 : 6 + 23, :]
    res = st.scale(plan, img, backend=backend, out=out_view)
    want = st.scale(plan, img, backend="numpy")
    assert np.array_equal(np.asarray(res), want)
    assert np.array_equal(canvas[4:21, 6:29], want)
    untouched = np.full((30, 40, 4), 0xAB, np.uint8)
    untouched[4:21, 6:29] = want
    assert np.array_equal(canvas, untouched)


@pytest.mark.parametrize("backend", ["numpy", "native"])
def test_scale_rows_out(backend):
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (64, 64, 4), np.uint8)
    plan = ScalePlan(64, 64, 33, 29, 4, 0, False)
    full = st.scale(plan, img, backend="numpy")
    buf = np.zeros((5, 33, 4), np.uint8)
    st.scale_rows(plan, img, 11, 5, backend=backend, out=buf)
    assert np.array_equal(buf, full[11:16])


def test_native_out_shape_validation():
    img = np.zeros((8, 8, 4), np.uint8)
    plan = ScalePlan(8, 8, 4, 4, 0, 0, False)
    with pytest.raises(ValueError):
        st.scale(plan, img, backend="native", out=np.zeros((3, 4, 4), np.uint8))
    with pytest.raises(ValueError):
        # column-strided out (pixels not contiguous) must be rejected
        bad = np.zeros((4, 8, 4), np.uint8)[:, ::2, :]
        st.scale(plan, img, backend="native", out=bad)


@pytest.mark.parametrize("backend", ["numpy", "native", "jax"])
def test_scale_streamed_assembles(backend):
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (96, 80, 4), np.uint8)
    plan = ScalePlan(80, 96, 37, 41, 0, 4, False)
    want = st.scale(plan, img, backend="numpy")
    got = np.zeros_like(want)
    firsts = []
    for first, rows in st.scale_streamed(plan, img, n_chunks=5,
                                         backend=backend):
        firsts.append(first)
        got[first : first + rows.shape[0]] = np.asarray(rows)
    assert firsts == sorted(firsts) and firsts[0] == 0
    assert len(firsts) == 5
    assert np.array_equal(got, want)


def test_scale_streamed_post_fn():
    img = np.full((32, 32, 4), 100, np.uint8)
    plan = ScalePlan(32, 32, 16, 16, 0, 0, False)
    chunks = list(st.scale_streamed(plan, img, n_chunks=4, backend="jax",
                                    post_fn=lambda rows: 255 - rows))
    out = np.concatenate([np.asarray(r) for _, r in chunks])
    assert (out == 155).all()
