#!/usr/bin/env python
"""On-chip probe: XLA prep-cost alternatives for feeding 24bpp inputs.

RGB24 plans currently pad (H, W, 3) u8 to (H, W, 4) on device and
bitcast to a (H, W) u32 pixel view before the kernel (backends/xla.py
_scale_fn_impl) -- two full relayout passes over a 33%-inflated image.
This probe measures what the alternatives cost at 3a scale (batch 4,
4096^2 RGB24, 201 MB of payload):

  read        sum over the free host-side u32 *word* view (floor cost
              of touching the bytes once; every variant includes one
              such full reduce so relayouts can't be DCE'd away)
  pad+bitcast the current prep
  word-deint  u32 word view -> three stride-3 lane slices (the
              phase-plane feed for an in-kernel packed-24 decode)
  word-resh   u32 word view -> reshape (.., W/4, 3) -> three minor
              slices (same planes, reshape-then-slice lowering)
  u8-split    u8 (H, W, 3) -> three minor-axis channel planes
  u8-major    u8 (H, W, 3) -> channel-major transpose (3, H, W)

Interpreting: variant_cost - read ~= the prep's own HBM/relayout toll.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from smolscale_tpu.utils.timing import chain_timer  # noqa: E402


def main(h=4096, w=4096, batch=4, n_long=12):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (batch, h, w, 3), dtype=np.uint8)
    words = np.ascontiguousarray(img).reshape(batch, h, w * 3 // 4, 4)
    words = words.view(np.uint32)[..., 0]  # free host view, (B, H, 3W/4)

    x8 = jnp.asarray(img)
    xw = jnp.asarray(words)

    def v_read(v):
        return jnp.sum(v, dtype=jnp.uint32).astype(jnp.uint32)

    def v_pad_bitcast(v):
        p = jnp.pad(v, [(0, 0)] * 3 + [(0, 1)], constant_values=255)
        u = jax.lax.bitcast_convert_type(p, jnp.uint32)
        return jnp.sum(u, dtype=jnp.uint32)

    def v_word_deint(v):
        s = jnp.uint32(0)
        for k in range(3):
            s += jnp.sum(v[..., k::3], dtype=jnp.uint32)
        return s

    def v_word_resh(v):
        r = v.reshape(v.shape[0], v.shape[1], -1, 3)
        s = jnp.uint32(0)
        for k in range(3):
            s += jnp.sum(r[..., k], dtype=jnp.uint32)
        return s

    def v_u8_split(v):
        s = jnp.uint32(0)
        for k in range(3):
            s += jnp.sum(v[..., k], dtype=jnp.uint32)
        return s

    def v_u8_major(v):
        t = jnp.moveaxis(v, -1, 1)
        return jnp.sum(t, dtype=jnp.uint32)

    def v_planes_transpose(v):
        # exact candidate feed A': channel-major u32 4-pixel words
        t = jnp.moveaxis(v, -1, 1)
        r = t.reshape(t.shape[0], 3, t.shape[2], -1, 4)
        u = jax.lax.bitcast_convert_type(r, jnp.uint32)
        return jnp.sum(u, dtype=jnp.uint32)

    def v_planes_from_words(v):
        # exact candidate feed A'': same planes recombined from stride-3
        # word slices with static shifts (pixel 4k+p ch c = byte 12k+3p+c)
        w0, w1, w2 = v[..., 0::3], v[..., 1::3], v[..., 2::3]
        c0 = ((w0 & 0xFF) | (((w0 >> 24) & 0xFF) << 8)
              | (((w1 >> 16) & 0xFF) << 16) | (((w2 >> 8) & 0xFF) << 24))
        c1 = (((w0 >> 8) & 0xFF) | ((w1 & 0xFF) << 8)
              | (((w1 >> 24) & 0xFF) << 16) | (((w2 >> 16) & 0xFF) << 24))
        c2 = (((w0 >> 16) & 0xFF) | (((w1 >> 8) & 0xFF) << 8)
              | ((w2 & 0xFF) << 16) | (((w2 >> 24) & 0xFF) << 24))
        s = jnp.uint32(0)
        for c in (c0, c1, c2):
            s += jnp.sum(c, dtype=jnp.uint32)
        return s

    cases = [
        ("read (u32 word view)", v_read, xw),
        ("pad+bitcast (current)", v_pad_bitcast, x8),
        ("word-deint 0::3", v_word_deint, xw),
        ("word-resh (..,3) minor", v_word_resh, xw),
        ("u8 channel split", v_u8_split, x8),
        ("u8 channel-major transpose", v_u8_major, x8),
        ("planes via transpose+bitcast", v_planes_transpose, x8),
        ("planes via word-deint+shifts", v_planes_from_words, xw),
    ]
    for name, fn, x in cases:
        r = chain_timer(fn, x, n_long=n_long)
        print(
            json.dumps(
                {
                    "variant": name,
                    "ms": round(r.per * 1e3, 3),
                    "confidence": r.confidence,
                    "n_chain": r.n_long,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
