"""Exactness of the 32-bit fixed-point formulations vs int64 ground truth.

Each helper in smolscale_tpu.ops.fixedpoint documents operand bounds; these
tests sweep those bounds (dense at the edges, random inside) and compare
against the wide-integer reference computation.
"""

import numpy as np
import jax.numpy as jnp

from smolscale_tpu.ops import fixedpoint as fp

RNG = np.random.default_rng(1234)


def _j(x):
    return jnp.asarray(x, dtype=jnp.int32)


def test_lerp256_exact():
    for mask, vmax in [(0xFF, 255), (0xFFFFFF, 0xFFFFFF)]:
        p = RNG.integers(0, vmax + 1, 20000).astype(np.int64)
        q = RNG.integers(0, vmax + 1, 20000).astype(np.int64)
        f = RNG.integers(0, 257, 20000).astype(np.int64)
        want = ((((p - q) * f) >> 8) + q) & mask
        got = np.asarray(fp.lerp256(_j(p), _j(q), _j(f), mask))
        assert np.array_equal(want, got)


def test_weight256_exact():
    for mask, vmax in [(0xFF, 255), (0xFFFFFF, 0xFFFFFF)]:
        v = RNG.integers(0, vmax + 1, 20000).astype(np.int64)
        w = RNG.integers(0, 257, 20000).astype(np.int64)
        want = ((v * w) >> 8) & mask
        got = np.asarray(fp.weight256(_j(v), _j(w), mask))
        assert np.array_equal(want, got)


def test_mul_shift_round24_exact():
    # Full accumulator domain a in [0, 2**32): covers PREMUL16 lanes
    # (65025) over spans to 65535 and linear lanes (521985) over spans to
    # the 8191:1 sRGB cutoff -- the band the old int32 split overflowed in.
    a = np.concatenate(
        [
            RNG.integers(0, 1 << 30, 20000),
            RNG.integers(1 << 30, 1 << 32, 20000),
            np.array(
                [0, 1, (1 << 30) - 1, 65535, 0xFFFF,
                 65025 * 65535, 521985 * 8191, (1 << 32) - 1]
            ),
        ]
    ).astype(np.int64)
    m = np.concatenate(
        [
            RNG.integers(0, 1 << 24, 40000),
            np.array([0, 1, (1 << 24) - 1, (1 << 22) - 1, 123,
                      258, 2**24 // 4113, (1 << 24) - 1]),
        ]
    ).astype(np.int64)
    n = min(len(a), len(m))
    a, m = a[:n], m[:n]
    want = ((a * m + (1 << 23)) >> 24) & 0xFFFFFFFF
    # int32 bit-pattern entry (what the kernels pass)
    a32 = jnp.asarray(a.astype(np.uint32).view(np.int32))
    got = np.asarray(fp.mul_shift_round24(a32, _j(m))).astype(np.int64)
    assert np.array_equal(want, got & 0xFFFFFFFF)
    # uint32 entry
    got_u = np.asarray(
        fp.mul_shift_round24(jnp.asarray(a, dtype=jnp.uint32), _j(m))
    ).astype(np.int64)
    assert np.array_equal(want, got_u & 0xFFFFFFFF)


def test_mul_shift_u32_exact():
    v = RNG.integers(0, 1 << 16, 20000).astype(np.int64)
    m = RNG.integers(0, (1 << 16) + 1, 20000).astype(np.int64)
    want = (v * m) >> 16
    got = np.asarray(fp.mul_shift_u32(_j(v), _j(m), 16))
    assert np.array_equal(want, got)


def test_mul_shift_p16l_exact():
    v = RNG.integers(0, 2047 * 255 + 1, 20000).astype(np.int64)
    m = RNG.integers(0, (1 << 19) + 1, 20000).astype(np.int64)
    want = (v * m) >> 19
    got = np.asarray(fp.mul_shift_p16l(_j(v), _j(m)))
    assert np.array_equal(want, got)


def test_segsum_cumsum_exact():
    w = 3000
    v = RNG.integers(0, 1 << 24, (2, w)).astype(np.int64)
    starts = np.sort(RNG.integers(0, w - 100, 40)).astype(np.int32)
    lengths = RNG.integers(0, 100, 40).astype(np.int32)
    want = np.stack(
        [
            [v[r, s : s + l].sum() for s, l in zip(starts, lengths)]
            for r in range(2)
        ]
    )
    got = np.asarray(
        fp.segsum_cumsum(_j(v), jnp.asarray(starts), jnp.asarray(lengths), axis=-1)
    ).astype(np.int64) & 0xFFFFFFFF
    assert np.array_equal(want & 0xFFFFFFFF, got)


def test_avg_floor_equals_lerp128():
    """The ladder fast path's floor average must equal lerp256(p, q, 128)
    exactly: all 256x256 byte pairs, plus sampled 16-bit and 20-bit lanes
    (PREMUL16 / linear-light ladder operands) and the packed-u32 SWAR
    4-channel form."""
    import jax.numpy as jnp

    from smolscale_tpu.ops import fixedpoint as fp
    from smolscale_tpu.ops.pallas_bilinear import (
        _avg_floor, _avg_floor_packed,
    )

    p, q = np.meshgrid(np.arange(256), np.arange(256))
    p = jnp.asarray(p.astype(np.int32))
    q = jnp.asarray(q.astype(np.int32))
    want = fp.lerp256(p, q, jnp.uint32(128), 0xFFFFFF)
    got = _avg_floor(p, q)
    assert np.array_equal(np.asarray(want), np.asarray(got))

    rng = np.random.default_rng(5)
    for bound in (65536, 1 << 20):
        a = jnp.asarray(rng.integers(0, bound, 4096, dtype=np.int64).astype(np.int32))
        b = jnp.asarray(rng.integers(0, bound, 4096, dtype=np.int64).astype(np.int32))
        want = fp.lerp256(a, b, jnp.uint32(128), 0xFFFFFF)
        assert np.array_equal(np.asarray(want), np.asarray(_avg_floor(a, b)))

    pp = rng.integers(0, 2**32, 4096, dtype=np.uint64).astype(np.uint32)
    qq = rng.integers(0, 2**32, 4096, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(_avg_floor_packed(jnp.asarray(pp), jnp.asarray(qq)))
    for byte in range(4):
        bp = (pp >> (8 * byte)) & 0xFF
        bq = (qq >> (8 * byte)) & 0xFF
        want = (bp + bq) // 2
        assert np.array_equal((got >> (8 * byte)) & 0xFF, want), byte
