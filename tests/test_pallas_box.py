"""Pallas fused box kernel: bit-exactness in interpreter mode (CPU).

Real-TPU exactness and throughput are exercised by bench.py; these tests
pin the kernel's numerics against the reference backend.
"""

from unittest import mock

import numpy as np
import pytest
from jax.experimental import pallas as pl

from smolscale_tpu.backends import numpy_ref
from smolscale_tpu.ops import pallas_box
from smolscale_tpu.plan import FilterType, ScalePlan

RNG = np.random.default_rng(31337)


def _interp_call(*a, **k):
    return _ORIG(*a, **k, interpret=True)


_ORIG = pl.pallas_call


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (256, 128, 16, 8, 0, 0),    # 16:1 both axes
        (384, 256, 3, 2, 0, 1),     # deep ratio, format reorder
        (512, 512, 4, 4, 2, 3),     # ARGB->ABGR
        (1280, 640, 128, 64, 1, 1), # 10:1
        (4096, 128, 256, 8, 0, 0),  # 16:1, block-diagonal chunked matmul
        (3840, 120, 384, 12, 2, 3), # 10:1, 3 column chunks + reorder
    ],
)
def test_pallas_box_exact(wi, hi, wo, ho, ti, to):
    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    assert pallas_box.applicable(plan)
    pallas_box._built.cache_clear()
    img = RNG.integers(0, 256, (2, hi, wi, 4), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_box.scale_fn(plan, img))
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)
    pallas_box._built.cache_clear()


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (256, 128, 16, 8, 8, 8),    # RGB24->RGB24 16:1 (alpha skipped)
        (384, 256, 3, 2, 9, 9),     # BGR24 deep ratio
        (512, 512, 4, 4, 8, 0),     # RGB24->RGBA (alpha computed, =255)
        (256, 128, 16, 8, 8, 4),    # RGB24->unassoc RGBA (epilogue)
    ],
)
def test_pallas_box_planes_exact(wi, hi, wo, ho, ti, to):
    """Channel-major u8 planes feed for 24bpp inputs through the
    dispatcher: same bytes as the padded surrogate, no pad+bitcast."""
    import jax

    from smolscale_tpu.backends import xla

    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    adapted = xla._adapt_24bpp(plan)
    assert adapted is not None and pallas_box.applicable(adapted[0])
    pallas_box._built_planes.cache_clear()
    img = RNG.integers(0, 256, (2, hi, wi, 3), dtype=np.uint8)
    xla._FORCE_PALLAS = True
    xla._RGB24_PLANES = True
    try:
        with mock.patch.object(pl, "pallas_call", _interp_call):
            got = np.asarray(jax.jit(lambda v: xla.scale_fn(plan, v))(img))
    finally:
        xla._FORCE_PALLAS = None
        xla._RGB24_PLANES = False
        pallas_box._built_planes.cache_clear()
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)


def test_applicability_gate():
    # unassoc->unassoc is PREMUL16/128bpp internally -> not applicable
    assert not pallas_box.applicable(ScalePlan(256, 128, 16, 8, 4, 4, False))
    # srgb -> 128bpp -> not applicable
    assert not pallas_box.applicable(ScalePlan(256, 128, 16, 8, 0, 0, True))
    # non-integer ratio -> not applicable
    assert not pallas_box.applicable(ScalePlan(250, 128, 16, 8, 0, 0, False))
    # bilinear -> not applicable
    assert not pallas_box.applicable(ScalePlan(256, 128, 64, 32, 0, 0, False))


@pytest.mark.parametrize("ti,to", [(4, 0), (5, 1), (6, 2)])
def test_pallas_box_unassoc_in(ti, to):
    plan = ScalePlan(256, 128, 16, 8, ti, to, False)
    assert pallas_box.applicable(plan)
    pallas_box._built.cache_clear()
    img = RNG.integers(0, 256, (2, 128, 256, 4), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_box.scale_fn(plan, img))
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)
    pallas_box._built.cache_clear()


@pytest.mark.parametrize("ti,to", [(0, 4), (1, 7), (2, 5), (3, 6)])
def test_pallas_box_unassoc_out(ti, to):
    # premul in -> unassociated out: kernel + output-sized unpremul epilogue
    plan = ScalePlan(256, 128, 16, 8, ti, to, False)
    assert pallas_box.applicable(plan)
    pallas_box._built.cache_clear()
    img = RNG.integers(0, 256, (2, 128, 256, 4), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_box.scale_fn(plan, img))
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)
    pallas_box._built.cache_clear()


def test_rows_t_mosaic_legal():
    """Row tiles must be 8-aligned multiples or span the whole output."""
    # h_out=25 has no 8-aligned divisor and the whole image exceeds the
    # single-block budget -> not applicable (XLA path), never an illegal tile
    big = ScalePlan(2560, 2500, 10, 25, 0, 0, False)
    assert pallas_box._pick_rows_t(big) is None
    assert not pallas_box.applicable(big)
    # small image: whole-output single block is legal at any size
    small = ScalePlan(256, 250, 16, 25, 0, 0, False)
    rt = pallas_box._pick_rows_t(small)
    assert rt == 25
    for wi, hi, wo, ho in [(256, 128, 16, 8), (1280, 640, 128, 64),
                           (512, 512, 4, 4), (384, 256, 3, 2)]:
        plan = ScalePlan(wi, hi, wo, ho, 0, 0, False)
        rt = pallas_box._pick_rows_t(plan)
        assert rt is not None and (rt % 8 == 0 or rt == ho), (plan.key, rt)


def test_unassoc_in_wide_block_cap():
    """Unassociated INPUT plans cap the row block at 3.25 MB.

    The in-kernel premultiply holds extra window-sized temporaries; on-chip
    fuzz (seed 20260823 --boxchunk) crashed the Mosaic compiler at
    3.87-4.13 MB blocks (9216x448->768x32 t4, 12288x2640->768x264 t5,
    8064x1560->896x104 t5) while a 3.19 MB unassoc block and 4 MB premul
    blocks compile fine.  Oversized plans must fall back to XLA.
    """
    for wi, hi, wo, ho, ti in [(9216, 448, 768, 32, 4),
                               (12288, 2640, 768, 264, 5),
                               (8064, 1560, 896, 104, 5)]:
        plan = ScalePlan(wi, hi, wo, ho, ti, 1, False)
        assert pallas_box._pick_rows_t(plan) is None, plan.key
        assert not pallas_box.applicable(plan)
    # the same geometry with premultiplied input keeps the 4 MB budget
    p = ScalePlan(9216, 448, 768, 32, 0, 1, False)
    assert pallas_box._pick_rows_t(p) == 8
    # widest observed-good unassoc block (3.19 MB, 7680x3016 t6) stays in
    p = ScalePlan(7680, 3016, 768, 232, 6, 1, False)
    assert pallas_box._pick_rows_t(p) == 8


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (256, 128, 256, 8, 0, 0),   # copy-H x box-V 16:1
        (256, 128, 16, 128, 0, 0),  # box-H 16:1 x copy-V
        (384, 64, 384, 4, 2, 3),    # copy-H x box-V, ARGB->ABGR
        (384, 64, 3, 64, 1, 1),     # deep box-H x copy-V, unassoc in+out
        (256, 60, 256, 6, 1, 0),    # copy-H x box-V 10:1, unassoc in
        (256, 64, 16, 64, 0, 1),    # box-H x copy-V, unassoc-out epilogue
        (3840, 120, 384, 120, 2, 3),  # chunked box-H matmul x copy-V
    ],
)
def test_pallas_box_copy_axes(wi, hi, wo, ho, ti, to):
    """COPY as a first-class axis (interp_horizontal_copy
    generic.c:1594-1611 / scale_outrow_copy generic.c:2302-2318): a COPY
    H axis skips the span matmul, a COPY V axis passes the h-row
    through."""
    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    assert FilterType.COPY in (plan.x.filter, plan.y.filter)
    assert pallas_box.applicable(plan)
    pallas_box._built.cache_clear()
    img = RNG.integers(0, 256, (2, hi, wi, 4), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_box.scale_fn(plan, img))
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)
    pallas_box._built.cache_clear()


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (256, 128, 256, 8, 8, 8),   # RGB24 copy-H x box-V (alpha skipped)
        (256, 128, 16, 128, 9, 8),  # BGR24 box-H x copy-V
        (384, 64, 384, 4, 8, 0),    # copy-H x box-V, RGB24->RGBA
    ],
)
def test_pallas_box_copy_axes_planes(wi, hi, wo, ho, ti, to):
    """24bpp channel-major planes feed with a COPY axis."""
    import jax

    from smolscale_tpu.backends import xla

    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    adapted = xla._adapt_24bpp(plan)
    assert adapted is not None and pallas_box.applicable(adapted[0])
    pallas_box._built_planes.cache_clear()
    img = RNG.integers(0, 256, (2, hi, wi, 3), dtype=np.uint8)
    xla._FORCE_PALLAS = True
    xla._RGB24_PLANES = True
    try:
        with mock.patch.object(pl, "pallas_call", _interp_call):
            got = np.asarray(jax.jit(lambda v: xla.scale_fn(plan, v))(img))
    finally:
        xla._FORCE_PALLAS = None
        xla._RGB24_PLANES = False
        pallas_box._built_planes.cache_clear()
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)


def test_copy_h_vspan_matrix_bounded():
    """COPY-H plans must bound the resident (rows_t, rows_t*ry) V-span
    matrix: 128x16016->128x1001 reaches the whole-output fallback
    (rows_t=1001, ry=16 -> a 15.3 MB int8 matrix) and would crash Mosaic's
    16 MB scoped VMEM at compile time, so it must fall back to XLA."""
    bad = ScalePlan(128, 16016, 128, 1001, 0, 0, False)
    assert bad.x.filter == FilterType.COPY
    assert pallas_box._pick_rows_t(bad) is None
    assert not pallas_box.applicable(bad)
    # fitting whole-output fallback stays in: h_out=25 has no 8-aligned
    # divisor and budget_rows (23) < h_out, so rows_t=25 comes from the
    # fallback, whose 10 KB matrix passes the bound
    ok = ScalePlan(1408, 400, 1408, 25, 0, 0, False)
    assert ok.x.filter == FilterType.COPY
    rt = pallas_box._pick_rows_t(ok)
    assert rt == 25 and rt * rt * 16 + rt * 1408 * 4 <= 2 * 2**20
    assert pallas_box.applicable(ok)
    # the certified strip geometry (4096^2 -> 4096x256) keeps its tile
    strip = ScalePlan(4096, 4096, 4096, 256, 0, 0, False)
    assert pallas_box._pick_rows_t(strip) == 8


def test_copy_copy_not_applicable():
    # pure repack (COPYxCOPY) stays on the XLA path
    assert not pallas_box.applicable(ScalePlan(256, 128, 256, 128, 0, 1, False))
