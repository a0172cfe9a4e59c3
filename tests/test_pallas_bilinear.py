"""Pallas fused bilinear kernel: bit-exactness in interpreter mode (CPU)."""

from unittest import mock

import numpy as np
import pytest
from jax.experimental import pallas as pl

from smolscale_tpu.backends import numpy_ref
from smolscale_tpu.ops import pallas_bilinear
from smolscale_tpu.plan import ScalePlan

RNG = np.random.default_rng(77)
_ORIG = pl.pallas_call


def _interp_call(*a, **k):
    return _ORIG(*a, **k, interpret=True)


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (512, 512, 1024, 1024, 5, 0),  # 0h upscale, unassociated input
        (300, 200, 290, 190, 0, 0),    # 0h mild downscale, odd sizes
        (512, 256, 96, 56, 0, 1),      # 2h ladder + reorder
        (700, 500, 123, 77, 2, 3),     # 2h, tails on both axes
        (64, 64, 16, 16, 0, 0),        # 1h
        (1024, 512, 128, 64, 0, 0),    # uniform 2h ladder (d=2, f=128) both
        (1024, 512, 128, 64, 4, 0),    # same, unassociated input
        (1000, 512, 100, 64, 0, 0),    # uniform box H (10:1) x uniform ladder V
        (640, 300, 64, 100, 0, 0),     # uniform box H x general bilinear V
        # COPY / ONE axes (interp_horizontal_one/copy generic.c:1558-1611,
        # scale_outrow_one/copy generic.c:2262-2318) as first-class fused
        # axes -- round-2 VERDICT item 3
        (1000, 500, 100, 500, 0, 0),   # box H x copy V
        (512, 1000, 512, 100, 0, 1),   # copy H x box V (strip thumbnail)
        (555, 300, 55, 300, 2, 0),     # non-integer box H x copy V
        (700, 1, 123, 9, 0, 0),        # ladder H x ONE V
        (1, 700, 9, 123, 4, 0),        # ONE H x ladder V, unassoc in
        (512, 700, 512, 123, 0, 3),    # copy H x ladder V
        (300, 260, 300, 260, 5, 2),    # copy x copy (pure conversion)
        (1, 1, 64, 32, 0, 0),          # ONE x ONE
    ],
)
def test_pallas_bilinear_exact(wi, hi, wo, ho, ti, to):
    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    assert pallas_bilinear.applicable(plan)
    pallas_bilinear._built.cache_clear()
    img = RNG.integers(0, 256, (2, hi, wi, 4), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_bilinear.scale_fn(plan, img))
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)
    pallas_bilinear._built.cache_clear()


def test_applicability_gate():
    # srgb -> 128bpp storage
    assert not pallas_bilinear.applicable(ScalePlan(512, 512, 256, 256, 0, 0, True))
    # unassoc->unassoc is PREMUL16/128bpp internally
    assert not pallas_bilinear.applicable(ScalePlan(512, 512, 256, 256, 4, 4, False))


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (512, 256, 96, 56, 0, 4),   # 2h ladder, premul -> unassoc
        (512, 512, 1024, 768, 1, 6), # 0h upscale + reorder, premul -> unassoc
        (1100, 300, 80, 100, 3, 5),  # box H x bilinear V, premul -> unassoc
    ],
)
def test_pallas_bilinear_unassoc_out(wi, hi, wo, ho, ti, to):
    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    assert pallas_bilinear.applicable(plan)
    pallas_bilinear._built.cache_clear()
    img = RNG.integers(0, 256, (2, hi, wi, 4), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_bilinear.scale_fn(plan, img))
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)
    pallas_bilinear._built.cache_clear()


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (1100, 300, 80, 100, 0, 0), # box H (13.75:1) x bilinear V
        (300, 1100, 100, 80, 4, 1), # bilinear H x box V, unassoc in
    ],
)
def test_general_box_paths_exact(wi, hi, wo, ho, ti, to):
    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    assert pallas_bilinear.applicable(plan)
    pallas_bilinear._built.cache_clear()
    img = RNG.integers(0, 256, (2, hi, wi, 4), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_bilinear.scale_fn(plan, img))
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)
    pallas_bilinear._built.cache_clear()


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (512, 256, 96, 56, 8, 8),    # RGB24->RGB24 ladder
        (384, 256, 3, 2, 8, 9),      # RGB24->BGR8 deep box
        (512, 256, 96, 56, 8, 0),    # RGB24->RGBA
        (300, 200, 290, 190, 0, 8),  # RGBA->RGB24
    ],
)
def test_24bpp_surrogate_exact(wi, hi, wo, ho, ti, to):
    """24bpp endpoints run through the 4-byte kernels via the RGBX
    surrogate (alpha byte = 255, dropped at pack)."""
    import jax

    from smolscale_tpu.backends import xla
    from smolscale_tpu.ops import pallas_box

    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    pallas_box._built.cache_clear()
    pallas_bilinear._built.cache_clear()
    nbi = 3 if ti >= 8 else 4
    img = RNG.integers(0, 256, (2, hi, wi, nbi), np.uint8)
    xla._FORCE_PALLAS = True
    try:
        with mock.patch.object(pl, "pallas_call", _interp_call):
            got = np.asarray(jax.jit(lambda v: xla.scale_fn(plan, v))(img))
    finally:
        xla._FORCE_PALLAS = None
        pallas_box._built.cache_clear()
        pallas_bilinear._built.cache_clear()
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (512, 256, 96, 56, 8, 8),     # RGB24->RGB24 ladder (alpha skipped)
        (512, 256, 96, 56, 9, 9),     # BGR24->BGR24
        (640, 300, 80, 110, 8, 8),    # non-integer box x box
        (512, 300, 512, 60, 8, 9),    # copy H x box V strip
        (512, 256, 96, 56, 8, 0),     # RGB24->RGBA (alpha computed, =255)
        (512, 256, 96, 56, 8, 4),     # RGB24->unassoc RGBA (epilogue)
        (333, 200, 330, 190, 8, 8),   # 0h both axes, ragged width
    ],
)
def test_24bpp_planes_exact(wi, hi, wo, ho, ti, to):
    """Channel-major u8 planes feed for 24bpp inputs: same bytes as the
    padded-surrogate path, without the pad+bitcast relayout; the
    synthesized-255 alpha is a kernel constant (skipped when the output
    drops it)."""
    import jax

    from smolscale_tpu.backends import xla
    from smolscale_tpu.ops import pallas_box

    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    adapted = xla._adapt_24bpp(plan)
    assert adapted is not None
    sp = adapted[0]
    assert pallas_bilinear.applicable(sp) and not pallas_box.applicable(sp)
    pallas_bilinear._built_planes.cache_clear()
    img = RNG.integers(0, 256, (2, hi, wi, 3), np.uint8)
    xla._FORCE_PALLAS = True
    xla._RGB24_PLANES = True
    try:
        with mock.patch.object(pl, "pallas_call", _interp_call):
            got = np.asarray(jax.jit(lambda v: xla.scale_fn(plan, v))(img))
    finally:
        xla._FORCE_PALLAS = None
        xla._RGB24_PLANES = False
        pallas_bilinear._built_planes.cache_clear()
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)


def test_box_x_box_dispatch():
    from smolscale_tpu.ops import pallas_box

    # integer-ratio box: pallas_box wins the dispatch (checked first)
    assert pallas_box.applicable(ScalePlan(640, 640, 64, 64, 0, 0, False))
    # non-integer box x box now runs on this kernel
    assert pallas_bilinear.applicable(ScalePlan(4096, 4096, 300, 300, 0, 0, False))


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to",
    [
        (1100, 1100, 80, 80, 0, 0),   # 13.75:1 box x box
        (1100, 990, 80, 110, 4, 1),   # box x box, mixed ratios, unassoc in
        (700, 700, 50, 50, 0, 4),     # 14:1 box x box, premul -> unassoc
    ],
)
def test_box_x_box_exact(wi, hi, wo, ho, ti, to):
    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    assert pallas_bilinear.applicable(plan)
    pallas_bilinear._built.cache_clear()
    img = RNG.integers(0, 256, (2, hi, wi, 4), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_bilinear.scale_fn(plan, img))
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert np.array_equal(want, got)
    pallas_bilinear._built.cache_clear()


def test_geometry_row_block_mosaic_legal():
    """TPU fuzz regression: Mosaic rejects multi-group output row blocks
    that are not 8-aligned (found with a 14-row sRGB output, t=7)."""
    from smolscale_tpu.ops import pallas_srgb

    cases = [
        (900, 1800, 768, 14, 0, 0, True),   # deep box V, tiny h_out, srgb
        (1265, 1272, 768, 14, 2, 3, True),
        (700, 500, 123, 77, 2, 3, False),
        (512, 512, 96, 25, 0, 0, False),
        (300, 1100, 100, 13, 4, 1, False),
    ]
    for wi, hi, wo, ho, ti, to, srgb in cases:
        plan = ScalePlan(wi, hi, wo, ho, ti, to, srgb)
        geo = pallas_srgb._geo(plan) if srgb else pallas_bilinear._geometry(plan)
        if geo is not None:
            t, n_rg = geo["t"], geo["n_rg"]
            assert t % 8 == 0 or n_rg == 1, (plan.key, t, n_rg)


def test_geometry_halving_jc_out_mosaic_legal():
    """TPU fuzz regression: with halvings, the per-ladder reshape needs a
    128-multiple column tile (w_out=166 -> jc_out=168 crashed Mosaic)."""
    cases = [
        (465, 914, 166, 1483, 0, 3),  # the fuzzed crash (1h H, 0h V up)
        (600, 600, 170, 170, 0, 0),   # 2h both axes, w_out in the gap
        (365, 677, 225, 729, 0, 1),   # 0h: non-128-multiple jc_out is fine
    ]
    for wi, hi, wo, ho, ti, to in cases:
        plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
        geo = pallas_bilinear._geometry(plan)
        if geo is not None and (geo["kh"] or geo["kv"]):
            assert geo["jc_out"] % 128 == 0, (plan.key, geo["jc_out"])


def test_halving_gap_width_exact():
    # exactness with the rounded-up column tile (wo in the 128..256 gap)
    plan = ScalePlan(465, 914, 166, 200, 0, 3, False)
    assert pallas_bilinear.applicable(plan)
    pallas_bilinear._built.cache_clear()
    img = RNG.integers(0, 256, (1, 914, 465, 4), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_bilinear.scale_fn(plan, img))
    want = numpy_ref.scale(plan, img[0])[None]
    assert np.array_equal(want, got)
    pallas_bilinear._built.cache_clear()


def test_span_mm_u7_exact():
    """Unbiased split-limb matmul: exact for values < 2**(s+7), both
    orientations, vs the int64 ground truth."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    for s, bound in [(4, 2047), (7, 2047), (7, (1 << 14) - 1)]:
        x = rng.integers(0, bound + 1, (24, 160)).astype(np.int64)
        m = rng.integers(0, 2, (160, 48)).astype(np.int8)
        want = (x @ m.astype(np.int64)) & 0xFFFFFFFF
        got = np.asarray(
            pallas_bilinear._span_mm_u7(jnp.asarray(x, jnp.int32),
                                        jnp.asarray(m), s)
        ).astype(np.uint32)
        assert np.array_equal(got, want.astype(np.uint32)), s
        mt = rng.integers(0, 2, (48, 24)).astype(np.int8)
        want_t = (mt.astype(np.int64) @ x) & 0xFFFFFFFF
        got_t = np.asarray(
            pallas_bilinear._span_mm_u7(jnp.asarray(x, jnp.int32),
                                        jnp.asarray(mt), s, transpose=True)
        ).astype(np.uint32)
        assert np.array_equal(got_t, want_t.astype(np.uint32)), s


def test_u7s_gate():
    """The unbiased split applies exactly to the P8L-linear class and
    never behind a box H (0xFFFF-normalized values)."""
    # P8L linear bilinear x bilinear: u7 on both stages
    p = ScalePlan(1920, 1080, 400, 225, 8, 8, True)
    assert pallas_bilinear._u7s(p, False) == 7
    assert pallas_bilinear._u7s(p, True) == 7
    # box H: V sees <= 0xFFFF
    pb = ScalePlan(2048, 2048, 190, 225, 8, 8, True)
    if pb.x.filter.name == "BOX":
        assert pallas_bilinear._u7s(pb, True) is None
    # S64 (bytes): single biased limb is cheaper
    assert pallas_bilinear._u7s(
        ScalePlan(1024, 1024, 300, 300, 0, 0, False), False) is None
    # PREMUL16 linear: < 2**19, too wide
    assert pallas_bilinear._u7s(
        ScalePlan(2048, 2048, 256, 256, 4, 4, True), False) is None


def test_folded_a255_lut_row():
    """LUT row 1 == unpremul(a=255) -> from_srgb -> premul_ul_to_p8l(a=255)
    composed per entry, packed halves."""
    from smolscale_tpu import luts
    from smolscale_tpu.ops import pallas_srgb

    t = pallas_srgb._lut_tables()
    fs = np.asarray(luts.FROM_SRGB, dtype=np.int64)
    inv255 = int(luts.INV_DIV_P8[255])
    v = np.arange(256, dtype=np.int64)
    l11 = fs[((v * inv255) >> 13) & 0xFF]
    want = (((l11 + 1) * ((255 << 3) + 1) - 1) >> 11) & 0x7FF
    got = np.where(v < 128, t[1][v & 127] & 0xFFFF,
                   (t[1][v & 127] >> 16) & 0xFFFF)
    assert np.array_equal(got, want)
    assert want.max() <= 2047  # both halves pack per i32 entry


@pytest.mark.parametrize(
    "wi,hi,wo,ho,ti,to,first,n",
    [
        (1024, 512, 128, 64, 0, 0, 16, 8),    # uniform 2h ladder, mid range
        (1024, 512, 128, 64, 0, 0, 0, 64),    # whole image as one "chunk"
        (1024, 512, 128, 64, 0, 0, 61, 3),    # tail, group-unaligned
        (1000, 512, 100, 64, 0, 0, 5, 20),    # uniform box H x ladder V
        (512, 500, 96, 50, 0, 0, 13, 17),     # non-uniform box V (v_box3)
        (512, 256, 96, 56, 0, 4, 10, 30),     # premul -> unassoc epilogue
        (512, 512, 1024, 1024, 5, 0, 100, 200),  # 0h upscale, unassoc in
        (512, 700, 512, 123, 0, 3, 40, 50),   # copy H x ladder V
    ],
)
def test_pallas_rows_exact(wi, hi, wo, ho, ti, to, first, n):
    """Fused row-range kernel (scale_rows_fn) vs the full-image reference:
    the streaming/row-batch analogue of smol_scale_batch_full
    (smolscale.c:506-546) computed by the fused pipeline."""
    plan = ScalePlan(wi, hi, wo, ho, ti, to, False)
    assert pallas_bilinear.applicable(plan)
    pallas_bilinear._built_rows.cache_clear()
    img = RNG.integers(0, 256, (2, hi, wi, 4), dtype=np.uint8)
    with mock.patch.object(pl, "pallas_call", _interp_call):
        got = np.asarray(pallas_bilinear.scale_rows_fn(plan, img, first, n))
    want = np.stack([numpy_ref.scale(plan, img[i]) for i in range(2)])
    assert got.shape == (2, n, wo, 4)
    assert np.array_equal(want[:, first : first + n], got)
    pallas_bilinear._built_rows.cache_clear()


def test_scale_rows_dispatch_pallas():
    """xla.scale_rows routes through the fused row-range kernel when
    forced (the TPU auto-dispatch path), bit-exact vs numpy_ref."""
    from smolscale_tpu.backends import xla

    plan = ScalePlan(1024, 512, 128, 64, 0, 0, False)
    img = RNG.integers(0, 256, (512, 1024, 4), dtype=np.uint8)
    want = numpy_ref.scale(plan, img)
    xla._FORCE_PALLAS = True
    pallas_bilinear._built_rows.cache_clear()
    try:
        with mock.patch.object(pl, "pallas_call", _interp_call):
            got = xla.scale_rows(plan, img, 24, 16)
    finally:
        xla._FORCE_PALLAS = None
        pallas_bilinear._built_rows.cache_clear()
        xla._jitted_rows_fused.cache_clear()
    assert np.array_equal(want[24:40], got)
