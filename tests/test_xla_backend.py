"""XLA backend bit-exactness vs the numpy reference backend (which is itself
oracle-exact, see test_numpy_ref_vs_oracle.py).  Runs on CPU; the TPU device
path is identical XLA HLO."""

import numpy as np
import pytest

from smolscale_tpu.backends import numpy_ref, xla
from smolscale_tpu.plan import ScalePlan

RNG = np.random.default_rng(99)


def run_case(wi, hi, wo, ho, ti, to, srgb):
    nbi = 3 if ti >= 8 else 4
    img = RNG.integers(0, 256, size=(hi, wi, nbi), dtype=np.uint8)
    plan = ScalePlan(wi, hi, wo, ho, ti, to, srgb)
    want = numpy_ref.scale(plan, img)
    got = xla.scale(plan, img)
    assert np.array_equal(want, got), (
        f"{wi}x{hi}->{wo}x{ho} t{ti}->t{to} srgb={srgb}: "
        f"{np.count_nonzero(want.astype(int) - got.astype(int))}/{want.size} differ "
        f"({plan.x.filter.name},{plan.y.filter.name},{plan.storage.name})"
    )


# One case per (filter-class x storage x alpha-mode x gamma) equivalence class,
# plus planner edges.  Full 10x10 format coverage lives in the (cheaper)
# numpy-vs-oracle suite; unpack/pack here covers every distinct code path.
CASES = [
    # bilinear 0h/1h/2h, box, one, copy x 64bpp premul
    (33, 17, 9, 6, 0, 0, False),
    (12, 14, 40, 30, 0, 0, False),
    (64, 64, 16, 16, 0, 0, False),
    (100, 80, 10, 8, 0, 0, False),
    (1, 7, 5, 3, 0, 0, False),
    (64, 64, 64, 64, 0, 0, False),
    (300, 5, 2, 5, 0, 0, False),
    # unassoc in/out, premul16, 24bpp, format conversions
    (33, 17, 9, 6, 4, 4, False),
    (33, 17, 9, 6, 4, 0, False),
    (33, 17, 9, 6, 0, 4, False),
    (33, 17, 9, 6, 8, 0, False),
    (33, 17, 9, 6, 0, 8, False),
    (33, 17, 9, 6, 5, 9, False),
    (12, 14, 40, 30, 4, 4, False),
    # srgb linear paths incl. both 24bpp pack variants
    (33, 17, 9, 6, 0, 0, True),
    (33, 17, 9, 6, 4, 4, True),
    (33, 17, 9, 6, 4, 0, True),
    (33, 17, 9, 6, 0, 8, True),   # quirky-pack side
    (33, 17, 9, 6, 3, 8, True),   # other orientation
    (33, 17, 9, 6, 5, 9, True),
    (100, 80, 10, 8, 4, 4, True),
    # deep box / 128bpp compressed / srgb cutoff
    (2000, 3, 7, 3, 0, 0, False),
    (2000, 3, 7, 3, 4, 4, False),
    (9000, 2, 1, 2, 0, 0, True),
    (2, 2, 1, 1, 0, 0, False),
]


@pytest.mark.parametrize("wi,hi,wo,ho,ti,to,srgb", CASES)
def test_xla_matches_reference(wi, hi, wo, ho, ti, to, srgb):
    run_case(wi, hi, wo, ho, ti, to, srgb)


def test_batch_axis():
    plan = ScalePlan(33, 17, 9, 6, 0, 0, False)
    imgs = RNG.integers(0, 256, size=(5, 17, 33, 4), dtype=np.uint8)
    got = xla.scale(plan, imgs)
    want = np.stack([numpy_ref.scale(plan, imgs[i]) for i in range(5)])
    assert got.shape == (5, 6, 9, 4)
    assert np.array_equal(want, got)


def test_scale_rows():
    plan = ScalePlan(97, 83, 31, 29, 4, 0, False)
    img = RNG.integers(0, 256, size=(83, 97, 4), dtype=np.uint8)
    want = numpy_ref.scale(plan, img)[10:17]
    got = xla.scale_rows(plan, img, 10, 7)
    assert np.array_equal(want, got)


def test_shape_validation():
    plan = ScalePlan(33, 17, 9, 6, 0, 0, False)
    with pytest.raises(ValueError):
        xla.scale(plan, np.zeros((17, 33, 3), dtype=np.uint8))


def test_post_fn_fused_in_program():
    """A traceable post callback composes inside the jitted program
    (SmolPostRowFunc analogue, smolscale.h:37-39)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    plan = ScalePlan(64, 48, 30, 20, 4, 0, False)
    img = rng.integers(0, 256, (48, 64, 4), dtype=np.uint8)

    def post(out):
        return (~out).astype(jnp.uint8)  # invert all bytes, row-wise safe

    want = ~numpy_ref.scale(plan, img)
    got = xla.scale(plan, img, post_fn=post)
    assert np.array_equal(want, got)
    # and through the public API, fused on the jax backend
    import smolscale_tpu as st

    got2 = np.asarray(st.scale(plan, img, backend="jax", post_fn=post))
    assert np.array_equal(want, got2)
    # jit-compose end to end: one program containing scale + post
    fn = jax.jit(lambda v: xla.scale_fn(plan, v, post_fn=post))
    got3 = np.asarray(fn(jnp.asarray(img)))
    assert np.array_equal(want, got3)
