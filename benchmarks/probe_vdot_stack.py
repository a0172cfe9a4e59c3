"""Microbench: dot-count overhead in the K-chunked dense V matmul.

Config 2's ablation (novmm 0.09 vs full 0.15 ms) says the dense V stage
still costs ~0.06 ms AFTER K-chunking, yet its MAC count is tiny -- the
hypothesis is per-dot fixed cost: the kernel issues 4 chunks x 4
channels = 16 dots of (64, 64) @ (64, 512) per grid step.  Variants
time one grid step's worth of V work on resident VMEM blocks:

  v16    -- 16 x (64,64)@(64,512)            (what ships today, cm=64)
  v4lane -- 4 x (64,64)@(64,2048)            (channels lane-stacked)
  v4     -- 4 x (256,144)@(144,512)          (unchunked, per channel)
  v1lane -- 1 x (256,144)@(144,2048)         (unchunked, lane-stacked)
  v2x128 -- 8 x (128,80)@(80,512)            (cm=128 chunks)

All bf16 with f32 accumulation, matching the kernel's dense V forms.

Usage: python benchmarks/probe_vdot_stack.py [variant ...]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

WIN_R, JC = 144, 512  # config 2's s block per channel
TV = 256
REPS = 64             # grid steps per call (one per out row-group x tile)


def make_fn(variant):
    def kernel(s_ref, m_ref, o_ref):
        # int32 in (chain_timer XORs its tag into the input), one convert
        s = s_ref[...].astype(jnp.bfloat16)  # (4, WIN_R, JC) channels
        m = m_ref[...]  # (TV, WIN_R) bf16 dense V
        outs = []
        if variant == "v16":
            for c in range(4):
                parts = [
                    jnp.dot(m[j * 64 : (j + 1) * 64, : 64],
                            s[c, j * 32 : j * 32 + 64],
                            preferred_element_type=jnp.float32)
                    for j in range(4)
                ]
                outs.append(jnp.concatenate(parts, axis=0))
        elif variant == "v4lane":
            sl = jnp.concatenate([s[c] for c in range(4)], axis=1)
            parts = [
                jnp.dot(m[j * 64 : (j + 1) * 64, : 64],
                        sl[j * 32 : j * 32 + 64],
                        preferred_element_type=jnp.float32)
                for j in range(4)
            ]
            outs.append(jnp.concatenate(parts, axis=0))
        elif variant == "v4":
            for c in range(4):
                outs.append(jnp.dot(m, s[c],
                                    preferred_element_type=jnp.float32))
        elif variant == "v1lane":
            sl = jnp.concatenate([s[c] for c in range(4)], axis=1)
            outs.append(jnp.dot(m, sl, preferred_element_type=jnp.float32))
        elif variant == "v2x128":
            for c in range(4):
                parts = [
                    jnp.dot(m[j * 128 : (j + 1) * 128, : 80],
                            s[c, j * 64 : j * 64 + 80],
                            preferred_element_type=jnp.float32)
                    for j in range(2)
                ]
                outs.append(jnp.concatenate(parts, axis=0))
        else:
            raise ValueError(variant)
        acc = sum(((o.astype(jnp.int32) >> 8) & 0xFF) for o in outs)
        o_ref[...] = jnp.sum(acc[:, :128], dtype=jnp.int32, keepdims=True,
                             axis=(0, 1))

    return pl.pallas_call(
        kernel,
        grid=(REPS,),
        in_specs=[
            pl.BlockSpec((4, WIN_R, JC), lambda i: (0, 0, 0)),
            pl.BlockSpec((TV, WIN_R), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )


def main():
    from smolscale_tpu.utils.timing import chain_timer

    rng = np.random.default_rng(0)
    s = jnp.asarray(
        rng.integers(0, 256, (4, WIN_R, JC), dtype=np.int32)
    )
    m = jnp.asarray(
        rng.integers(0, 257, (TV, WIN_R)).astype(np.float32)
    ).astype(jnp.bfloat16)
    np.asarray(s[0, 0, 0])

    for variant in sys.argv[1:] or ["v16", "v4lane", "v4", "v1lane",
                                    "v2x128"]:
        try:
            call = make_fn(variant)
            fn = lambda v: call(v, m)[0, 0]
            np.asarray(jax.jit(fn)(s))
            res = chain_timer(lambda v: fn(v), s)
            per_step = res.per / REPS
            print(f"{variant:7s}: {res.per*1e6:8.1f} us/call  "
                  f"{per_step*1e6:6.2f} us/step  {res.confidence}",
                  flush=True)
        except Exception as e:
            print(f"{variant:7s}: FAILED {repr(e)[:240]}", flush=True)


if __name__ == "__main__":
    main()
