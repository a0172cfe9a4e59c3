"""Symbolic validation of the chunk-centric deep-box span classification.

The chunk walk (ops/pallas_deep._built_chunked) pre-computes a per-chunk
scalar table (candidate span A, optional candidate B) and relies on four
invariants: every output span is initialized exactly once (by the chunk
containing its first row), accumulated with the reference edge weights
(w1 / 256 / w2', generic.c:2112-2260), emitted exactly once (by the chunk
containing its last row), and the 2-slot parity accumulator never holds
two live spans with the same parity.  This test replays the walk on
symbolic row weights — no kernel, no device — and compares against the
direct per-span accumulation, sweeping deep-band geometries including
spans whose last row lands exactly on a chunk boundary (the class of the
hardware-fuzz regression at 1842x1538->10x15 srgb).
"""

import numpy as np
import pytest

from smolscale_tpu.backends.xla import _box_v_arrays
from smolscale_tpu.ops import pallas_deep
from smolscale_tpu.plan import ScalePlan, StorageType


def _simulate(plan):
    got = pallas_deep._chunk_centric(plan)
    if got is None:
        return None
    C, n_chunks = got
    h_out, h_in = plan.height_out, plan.height_in
    bv = _box_v_arrays(plan.y)
    ofs = np.asarray(plan.y.offsets, dtype=np.int64)
    first = np.asarray(bv["first_idx"], dtype=np.int64)
    y1 = ofs[1 : h_out + 1]
    w1 = np.asarray(bv["w1"], dtype=np.int64)
    w2 = np.asarray(bv["w2"], dtype=np.int64)
    s128 = plan.storage == StorageType.S128
    w2p = np.maximum(w2 - 1, 0) if s128 else w2

    def weights(i):
        d = {}
        for r in range(first[i], y1[i] + 1):
            if r >= h_in:
                continue
            w = w1[i] if r == first[i] else (w2p[i] if r == y1[i] else 256)
            d[r] = d.get(r, 0) + w
        return d

    # rebuild scal exactly as _built_chunked does
    scal = np.zeros((n_chunks, 16), dtype=np.int64)
    for c in range(n_chunks):
        lo, hi = c * C, (c + 1) * C - 1
        ia = int(np.searchsorted(y1, lo, side="left"))
        ia = max(0, min(ia, h_out - 1))
        scal[c, :7] = (
            ia, first[ia], y1[ia], w1[ia], w2p[ia],
            1 if first[ia] >= lo else 0,
            1 if lo <= y1[ia] <= hi else 0,
        )
        ib = ia + 1
        vb = ib <= h_out - 1 and first[ib] <= hi
        scal[c, 7] = 1 if vb else 0
        if vb:
            scal[c, 8:13] = (ib, first[ib], y1[ib], w1[ib], w2p[ib])
        else:
            scal[c, 8:11] = (0, -2, -2)

    def classify(lo, hi, fi, yi, wv1, wv2):
        d = {}
        for r in range(lo, min(hi, h_in - 1) + 1):
            if fi <= r <= yi:
                d[r] = d.get(r, 0) + (
                    wv1 if r == fi else (wv2 if r == yi else 256)
                )
        return d

    acc = {}  # parity -> (span idx, row->weight)
    emitted = {}
    for c in range(n_chunks):
        lo, hi = c * C, (c + 1) * C - 1
        ia = scal[c, 0]
        pa = ia % 2
        part = classify(lo, hi, *scal[c, 1:5])
        if scal[c, 5] == 1:
            acc[pa] = (ia, dict(part))
        else:
            idx0, d0 = acc.get(pa, (ia, {}))
            assert idx0 == ia, f"parity clash at chunk {c}: {idx0} vs {ia}"
            for k, v in part.items():
                d0[k] = d0.get(k, 0) + v
            acc[pa] = (idx0, d0)
        if scal[c, 6] == 1:
            idx0, d0 = acc[pa]
            assert idx0 == ia, f"emit of wrong span at chunk {c}"
            assert ia not in emitted, f"double emit of span {ia}"
            emitted[ia] = dict(d0)
        if scal[c, 7] == 1:
            ib = scal[c, 8]
            acc[ib % 2] = (ib, classify(lo, hi, *scal[c, 9:13]))
    for i in range(h_out):
        assert i in emitted, f"span {i} never emitted"
        assert emitted[i] == weights(i), f"span {i} weight mismatch"
    return True


_RNG = np.random.default_rng(1234)
_CASES = [(hi, ho) for hi in range(512, 4200, 389)
          for ho in (1, 3, 8, 13, 15)]
_CASES += [(1538, 15), (1536, 12), (3072, 15)]  # exact boundary hits
_CASES += [(int(_RNG.integers(256, 6000)), int(_RNG.integers(1, 40)))
           for _ in range(40)]


@pytest.mark.parametrize("hi,ho", sorted(set(_CASES)))
def test_chunk_classification(hi, ho):
    checked = 0
    for srgb in (False, True):
        for t in ((0, 0), (4, 4)):
            plan = ScalePlan(1024, hi, 8, ho, t[0], t[1], srgb)
            if _simulate(plan):
                checked += 1
    assert checked  # at least one storage class engaged the chunk walk
