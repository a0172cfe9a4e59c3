"""Channel-ordering invariant across the full format matrix — the widened
verify.c:189-225 port (round-2 VERDICT item 8).

verify.c populates a 16384-px line with a slowly-cycling channel pattern
(r=0x20+mod, g=0x60+mod, b=0xa0+mod, a=0xff, mod stepping 0..60 by 4),
scales it to 16383 px in each axis for every 10x10 pixel-type pair, and
fuzzy-compares the head of the output against the pattern re-populated in
the output format (fuzz 2).  A channel-routing bug in any repack/unpack
path shows up as a wholesale channel swap, which the fuzz never absorbs.

Beyond verify.c (its FIXME at verify.c:184-187 admits the 128bpp pathways
were never verified): the same invariant is run through the sRGB
linear-light plans and the PREMUL16 plans (unassociated in AND out),
which route through 128bpp storage here and upstream.

Runtime is kept sane with reduced dims (4096-px lines for the numpy spec
backend and the native engine, 768 px for the jit-compiled jax backend on
a reduced pair sample — jax coverage of the full matrix lives in the
oracle-exactness suite, tests/test_xla_backend.py).
"""

import numpy as np
import pytest

import smolscale_tpu as st
from smolscale_tpu.formats import PixelType, get_meta
from smolscale_tpu.plan import ScalePlan

ALL_TYPES = list(PixelType)
_BASE = {0: 0x20, 1: 0x60, 2: 0xA0, 3: 0xFF}  # r, g, b, a (verify.c:57-73)
N_MOD_STEPS, MOD_INCREMENT = 16, 4


def _populate(pt: PixelType, n_px: int) -> np.ndarray:
    """verify.c populate_pixels: per-pixel channel pattern in byte order."""
    meta = get_meta(pt)
    mod = (np.arange(n_px) % N_MOD_STEPS) * MOD_INCREMENT
    buf = np.zeros((n_px, meta.n_bytes), np.uint8)
    for byte_i, ch in enumerate(meta.layout):
        buf[:, byte_i] = _BASE[ch] + (0 if ch == 3 else mod)
    return buf


def _check_ordering(backend, tin, tout, axis, n, srgb=False, fuzz=2):
    line = _populate(tin, n)
    if axis == "h":
        img = line[None]  # (1, n, nb)
        plan = ScalePlan(n, 1, n - 1, 1, tin, tout, srgb)
    else:
        img = line[:, None]  # (n, 1, nb)
        plan = ScalePlan(1, n, 1, n - 1, tin, tout, srgb)
    out = np.asarray(st.scale(plan, img, backend=backend))
    got = out.reshape(-1)[:64].astype(np.int16)
    want = _populate(tout, n).reshape(-1)[:64].astype(np.int16)
    bad = np.abs(got - want) > fuzz
    assert not bad.any(), (
        f"{tin.name}->{tout.name} {axis}: byte {np.argmax(bad)} "
        f"got {got[bad][:8]} want {want[bad][:8]}"
    )


@pytest.mark.parametrize("backend", ["numpy", "native"])
@pytest.mark.parametrize("tin", ALL_TYPES)
@pytest.mark.parametrize("tout", ALL_TYPES)
def test_ordering_matrix(backend, tin, tout):
    for axis in ("h", "v"):
        _check_ordering(backend, tin, tout, axis, 4096)


# jax backend: reduced sample (one full in-type sweep against a rotating
# out type, both axes) at small dims — 10x10 would cost ~200 jit compiles
_JAX_PAIRS = [(ALL_TYPES[i], ALL_TYPES[(3 * i + 1) % 10]) for i in range(10)]


@pytest.mark.parametrize("tin,tout", _JAX_PAIRS)
def test_ordering_jax(tin, tout):
    for axis in ("h", "v"):
        _check_ordering("jax", tin, tout, axis, 768)


# ---- 128bpp pathways (verify.c's FIXME: upstream never verified these) ----

# sRGB linear-light: every type against itself plus cross-order pairs.
# The pattern values survive the linearize/delinearize round trip within
# the same fuzz (LUT round trip is identity for 8-bit-exact inputs).
_SRGB_PAIRS = [(t, t) for t in ALL_TYPES] + [
    (PixelType.RGBA8_PREMULTIPLIED, PixelType.BGRA8_PREMULTIPLIED),
    (PixelType.ARGB8_PREMULTIPLIED, PixelType.ABGR8_PREMULTIPLIED),
    (PixelType.RGBA8_UNASSOCIATED, PixelType.ABGR8_UNASSOCIATED),
    (PixelType.RGB8, PixelType.BGR8),
    (PixelType.BGR8, PixelType.RGBA8_PREMULTIPLIED),
]


@pytest.mark.parametrize("backend", ["numpy", "native"])
@pytest.mark.parametrize("tin,tout", _SRGB_PAIRS)
def test_ordering_srgb_128bpp(backend, tin, tout):
    for axis in ("h", "v"):
        _check_ordering(backend, tin, tout, axis, 2048, srgb=True)


@pytest.mark.parametrize("tin,tout", _SRGB_PAIRS[::4])
def test_ordering_srgb_jax(tin, tout):
    for axis in ("h", "v"):
        _check_ordering("jax", tin, tout, axis, 768, srgb=True)


# PREMUL16 (unassociated in AND out, smolscale.c:751-758): 4x4 sub-matrix.
_UNASSOC = [t for t in ALL_TYPES if get_meta(t).alpha.name == "UNASSOCIATED"]


@pytest.mark.parametrize("backend", ["numpy", "native"])
@pytest.mark.parametrize("tin", _UNASSOC)
@pytest.mark.parametrize("tout", _UNASSOC)
def test_ordering_premul16(backend, tin, tout):
    for axis in ("h", "v"):
        _check_ordering(backend, tin, tout, axis, 2048)
