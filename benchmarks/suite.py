#!/usr/bin/env python
"""Benchmark suite: the five BASELINE.md configs on one TPU chip.

The reference's methodology analogue (bench.sh:41-52 + test.c:219-340):
fixed recipes, min-time-per-config, pixels/s metric.  Timing uses
in-device fori_loop chains (see bench.py) because the axon platform's
block_until_ready is not a reliable barrier.

Usage: python benchmarks/suite.py [--json out.json]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _chain_timer(step_fn, x, n_short=2, n_long=12, reps=3):
    """Shared chain-slope timer (see smolscale_tpu/utils/timing.py).

    The chain's trip count is traced, so the auto-scaling loop (grow the
    long chain until the slope clears the jitter floor and two estimates
    agree within 10%) costs one compile total.  Returns a ChainResult
    with a confidence figure for the published table.
    """
    from smolscale_tpu.utils.timing import chain_timer

    return chain_timer(step_fn, x, n_short=n_short, n_long=n_long, reps=reps)


def bench_config(name, plan, batch, check=True, n_long=12):
    import jax
    import jax.numpy as jnp

    from smolscale_tpu.backends import numpy_ref, xla

    rng = np.random.default_rng(0)
    nb = plan.meta_in.n_bytes
    imgs = rng.integers(
        0, 256, (batch, plan.height_in, plan.width_in, nb), dtype=np.uint8
    )
    if nb == 4:
        # free host u32 pixel view (skips the on-device relayout copy)
        up = imgs.reshape(batch, plan.height_in, plan.width_in * 4).view(np.uint32)
    else:
        up = imgs
    x = jax.device_put(jnp.asarray(up))
    _ = np.asarray(x[0, 0, 0])

    exact = True
    if check:
        got = np.asarray(jax.jit(lambda v: xla.scale_fn(plan, v))(x[:1]))[0]
        exact = bool(np.array_equal(got, numpy_ref.scale(plan, imgs[0])))

    def step(v):
        return xla.scale_fn(plan, v)[0, 0, 0, 0]

    res = _chain_timer(step, x, n_long=n_long)
    per = res.per
    in_px = batch * plan.width_in * plan.height_in
    out_px = batch * plan.width_out * plan.height_out
    rec = {
        "config": name,
        "batch": batch,
        "ms_per_batch": round(per * 1000, 3),
        "in_mpix_s": round(in_px / 1e6 / per, 1),
        "pps_mpix_s": round((in_px + out_px) / 1e6 / per, 1),  # reference metric
        "img_s": round(batch / per, 1),
        "bit_exact": exact,
        "confidence": res.confidence,
        "n_chain": res.n_long,
    }
    print(json.dumps(rec), flush=True)
    return rec


def bench_pyramid():
    import jax
    import jax.numpy as jnp

    from smolscale_tpu.backends import numpy_ref
    from smolscale_tpu.plan import ScalePlan
    from smolscale_tpu.pyramid import make_pyramid_fn

    B = 256
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (B, 512, 512, 4), dtype=np.uint8)
    # free host u32 pixel view, like every other 4-byte config
    up = imgs.reshape(B, 512, 512 * 4).view(np.uint32)
    x = jax.device_put(jnp.asarray(up))
    _ = np.asarray(x[0, 0, 0])
    sizes = (64, 128, 256)
    fn = make_pyramid_fn(512, 512, 0, sizes=sizes)

    plans = [ScalePlan(512, 512, s, s, 0, 0, False) for s in sizes]
    got = fn(x[:1])
    exact = all(
        np.array_equal(np.asarray(o)[0], numpy_ref.scale(p, imgs[0]))
        for p, o in zip(plans, got)
    )

    def step(v):
        # fold a scalar from EVERY level into the chain so no level's
        # program can be dead-code-eliminated out of the timing
        outs = fn(v)
        return sum(o[0, 0, 0, 0].astype(jnp.uint32) for o in outs)

    res = _chain_timer(step, x, n_long=8)
    per = res.per
    rec = {
        "config": "5: thumbnail farm 512^2 -> (64,128,256) pyramid",
        "batch": B,
        "ms_per_batch": round(per * 1000, 3),
        "in_mpix_s": round(B * 512 * 512 / 1e6 / per, 1),
        "img_s": round(B / per, 1),
        "pyramids_s": round(B / per, 1),
        "bit_exact": exact,
        "confidence": res.confidence,
        "n_chain": res.n_long,
    }
    print(json.dumps(rec), flush=True)
    return rec


def bench_pyramid_mixed(n_total=10000):
    """Config 5b: the BASELINE-declared 10k mixed-format fleet through
    scale_pyramid_mixed -- grouped dispatch, bounded sub-batches, host
    u32/planes feeds included.  Two figures:

    * resident sustained: fleet pre-uploaded (the tunnel's ~GB/s and
      >=512 MB wedge risk are axon artifacts, not v5e's host link),
      wall-clock over every group dispatch, forced by per-batch
      checksums (the reference's own fleet bench also discards outputs,
      test.c:839-883).
    * cold end-to-end: scale_pyramid_mixed verbatim on a 2k subsample --
      host stacking + upload + compute + full thumbnail download.
    """
    import time

    import jax
    import jax.numpy as jnp

    from smolscale_tpu.backends import numpy_ref
    from smolscale_tpu.plan import ScalePlan
    from smolscale_tpu.pyramid import make_pyramid_fn, scale_pyramid_mixed

    sizes = (64, 128, 256)
    # (weight, (h, w), pixel_type): three 4-byte formats (premul RGBA /
    # BGRA + unassociated RGBA), a 24bpp fleet (fused planes feed), and
    # a non-power-of-two shape whose levels fall to the per-level XLA
    # path -- grouped dispatch must handle both.
    spec = [
        (0.30, (512, 512), 0),
        (0.20, (512, 512), 4),
        (0.15, (512, 512), 1),
        (0.20, (512, 512), 8),
        (0.15, (384, 384), 0),
    ]
    rng = np.random.default_rng(0)
    images, types = [], []
    for wfrac, (h, w), pt in spec:
        n = int(round(wfrac * n_total))
        nb = 3 if pt >= 8 else 4
        # 32 distinct templates per group, cycled as views (a 10k fleet
        # of fully distinct images is ~8 GB of host RNG for no extra
        # coverage; the exactness gate below compares real outputs)
        tpl = [rng.integers(0, 256, (h, w, nb), dtype=np.uint8)
               for _ in range(32)]
        images += [tpl[i % 32] for i in range(n)]
        types += [pt] * n
    n_total = len(images)

    # exactness gate: one image per group through the full
    # scale_pyramid_mixed path vs the numpy reference
    probe_idx = []
    seen = set()
    for i, (img, pt) in enumerate(zip(images, types)):
        key = (img.shape, pt)
        if key not in seen:
            seen.add(key)
            probe_idx.append(i)
    got = scale_pyramid_mixed([images[i] for i in probe_idx],
                              [types[i] for i in probe_idx], sizes=sizes)
    exact = True
    for k, i in enumerate(probe_idx):
        h, w = images[i].shape[:2]
        for s, o in zip(sizes, got[k]):
            p = ScalePlan(w, h, s, s, types[i], types[i], False)
            exact = exact and bool(
                np.array_equal(o, numpy_ref.scale(p, images[i]))
            )

    # resident sustained: group + sub-batch exactly like
    # scale_pyramid_mixed (192 MB cap), but pre-uploaded
    cap_bytes = 192 * 2**20
    groups: dict = {}
    for i, (img, pt) in enumerate(zip(images, types)):
        groups.setdefault((img.shape, pt), []).append(i)
    batches = []
    for (shape, pt), idxs in groups.items():
        h, w = shape[:2]
        fn = make_pyramid_fn(w, h, int(pt), sizes=sizes)
        cap = max(1, min(len(idxs), cap_bytes // int(np.prod(shape))))
        for c0 in range(0, len(idxs), cap):
            sub = idxs[c0 : c0 + cap]
            stack = [images[i] for i in sub]
            if len(sub) < cap and c0 > 0:
                stack = stack + [stack[-1]] * (cap - len(sub))
            batch = np.stack(stack)
            if batch.shape[-1] == 4:
                batch = np.ascontiguousarray(batch).view(np.uint32)[..., 0]
            batches.append((fn, jax.device_put(jnp.asarray(batch)), len(sub)))

    def sweep():
        acc = []
        for fn, x, _n in batches:
            outs = fn(x)
            acc.append(sum(o[0, 0, 0, 0].astype(jnp.uint32) for o in outs))
        return [np.asarray(a) for a in acc]

    _ = sweep()  # compile + warm every group program
    per = None
    for _rep in range(3):
        t0 = time.time()
        _ = sweep()
        dt = time.time() - t0
        per = dt if per is None else min(per, dt)
    resident = n_total / per

    # cold end-to-end on a subsample (full host->device->host round trip)
    n_cold = min(2000, n_total)
    step = max(1, n_total // n_cold)
    cold_idx = list(range(0, n_total, step))[:n_cold]
    t0 = time.time()
    _ = scale_pyramid_mixed([images[i] for i in cold_idx],
                            [types[i] for i in cold_idx], sizes=sizes,
                            max_batch_bytes=cap_bytes)
    cold = len(cold_idx) / (time.time() - t0)

    rec = {
        "config": "5b: mixed fleet (3 x 4B formats + RGB24 + non-pow2) "
                  f"-> {sizes} pyramids",
        "n_images": n_total,
        "n_groups": len(groups),
        "pyramids_s": round(resident, 1),
        "pyramids_s_cold_2k": round(cold, 1),
        "bit_exact": exact,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--only", default=None,
                    help="substring filter on config names")
    args = ap.parse_args()

    from smolscale_tpu.plan import ScalePlan

    results = []

    def row(name, thunk):
        if args.only and args.only not in name:
            return
        results.append(thunk())

    # Config 1: one-shot 2048^2 -> 256^2 (smol_scale_simple analogue;
    # the planner picks BILINEAR_2H at exactly 8:1 -- box needs ratio > 8);
    # also batched to show farm throughput.
    row("1:", lambda: bench_config(
        "1: RGBA premul 2048^2->256^2 (2h ladder), one-shot",
        ScalePlan(2048, 2048, 256, 256, 0, 0, False), batch=1))
    row("1b:", lambda: bench_config(
        "1b: RGBA premul 2048^2->256^2 (2h ladder), batch 32",
        ScalePlan(2048, 2048, 256, 256, 0, 0, False), batch=32))
    # Headline: 4096^2 -> 256^2
    row("0:", lambda: bench_config(
        "0: RGBA premul 4096^2->256^2 box, batch 8 (headline)",
        ScalePlan(4096, 4096, 256, 256, 0, 0, False), batch=8))
    # Config 2: BGRA unassociated -> RGBA premul, 512^2 -> 1024^2 bilinear
    row("2:", lambda: bench_config(
        "2: BGRA unassoc->RGBA premul 512^2->1024^2 bilinear, batch 8",
        ScalePlan(512, 512, 1024, 1024, 5, 0, False), batch=8))
    # Config 3: RGB24 4096^2 -> non-integer ratios (bilinear ladder)
    row("3a:", lambda: bench_config(
        "3a: RGB24 4096^2->1371^2 (1h ladder), batch 4",
        ScalePlan(4096, 4096, 1371, 1371, 8, 8, False), batch=4, n_long=8))
    row("3b:", lambda: bench_config(
        "3b: RGB24 4096^2->3000^2 (0h), batch 2",
        ScalePlan(4096, 4096, 3000, 3000, 8, 8, False), batch=2, n_long=8))
    row("3c:", lambda: bench_config(
        "3c: RGBA 4096^2->700^2 (non-integer box 5.85:1... bilinear 2h), batch 4",
        ScalePlan(4096, 4096, 700, 700, 0, 0, False), batch=4, n_long=8))
    row("3d:", lambda: bench_config(
        "3d: RGBA 4096^2->300^2 (non-integer box 13.6:1), batch 8",
        ScalePlan(4096, 4096, 300, 300, 0, 0, False), batch=8))
    # premul -> unassociated output (fused kernel + unpremul epilogue)
    row("3e:", lambda: bench_config(
        "3e: RGBA premul->unassoc 4096^2->256^2 box, batch 8",
        ScalePlan(4096, 4096, 256, 256, 0, 4, False), batch=8))
    # Config 4: row-batch streaming, 16384^2 in row chunks
    row("4:", bench_row_stream)
    # Config 5: pyramid farm (resident batch) + 5b mixed fleet
    row("5:", bench_pyramid)
    row("5b:", bench_pyramid_mixed)
    # sRGB path
    row("6:", lambda: bench_config(
        "6: RGBA unassoc 2048^2->256^2 box with sRGB linear light, batch 8",
        ScalePlan(2048, 2048, 256, 256, 4, 4, True), batch=8, n_long=8))
    row("6b:", lambda: bench_config(
        "6b: RGB24 1920x1080->400x225 sRGB linear light, batch 8",
        ScalePlan(1920, 1080, 400, 225, 8, 8, True), batch=8, n_long=8))
    # 128bpp compressed-gamma classes (pallas_128): internal PREMUL16
    # (unassoc in AND out, smolscale.c:751-758) and >255:1 deep box
    row("7:", lambda: bench_config(
        "7: RGBA unassoc->unassoc 2048^2->256^2 (PREMUL16, 2h ladder), batch 8",
        ScalePlan(2048, 2048, 256, 256, 4, 4, False), batch=8, n_long=8))
    row("7b:", lambda: bench_config(
        "7b: RGBA premul 4096^2->16^2 deep box (256:1), batch 8",
        ScalePlan(4096, 4096, 16, 16, 0, 0, False), batch=8, n_long=8))
    # Mixed COPY axis (round-3: fused copy-x-box strip thumbnails;
    # previously fell to the XLA op-graph path)
    row("8:", lambda: bench_config(
        "8: RGBA premul 4096^2->4096x256 strip (copy H x box V), batch 8",
        ScalePlan(4096, 4096, 4096, 256, 0, 0, False), batch=8, n_long=8))
    # Ragged deep box (chunk-centric kernel: the image is walked once,
    # each chunk's rows classified into their spans)
    row("9:", lambda: bench_config(
        "9: RGBA premul 4096^2->12^2 ragged deep box (341.3:1), batch 8",
        ScalePlan(4096, 4096, 12, 12, 0, 0, False), batch=8, n_long=8))
    row("9b:", lambda: bench_config(
        "9b: RGBA unassoc->unassoc 2048^2->12^2 ragged deep (PREMUL16), batch 8",
        ScalePlan(2048, 2048, 12, 12, 4, 4, False), batch=8, n_long=8))
    row("9c:", lambda: bench_config(
        "9c: RGBA premul 2000^2->7^2 ragged deep, sRGB linear light, batch 8",
        ScalePlan(2000, 2000, 7, 7, 0, 0, True), batch=8, n_long=8))
    row("9d:", lambda: bench_config(
        "9d: RGB24 3000^2->9^2 ragged deep, batch 8",
        ScalePlan(3000, 3000, 9, 9, 8, 8, False), batch=8, n_long=8))

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


def bench_row_stream():
    import jax
    import jax.numpy as jnp

    from smolscale_tpu.backends import xla
    from smolscale_tpu.plan import ScalePlan

    # Large RGBA input scaled in 16 row chunks -- the smol_scale_batch_full
    # streaming pattern.  (8192^2 = 256 MiB: single transfers much beyond
    # this wedge the axon tunnel; the 16384^2 BASELINE shape runs the same
    # code path.)
    plan = ScalePlan(8192, 8192, 1024, 1024, 0, 0, False)
    n_chunks = 16
    tables = xla.RowShardTables(plan, n_chunks)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (8192, 8192, 4), dtype=np.uint8)
    # free host u32 pixel view (skips the on-device u8->u32 relayout copy)
    x = jax.device_put(jnp.asarray(img.reshape(8192, 8192 * 4).view(np.uint32)))
    _ = np.asarray(x[0, 0])

    # One dispatch computes every chunk (separate dispatches would measure
    # the axon tunnel's ~80ms RTT per fetch, not compute; a real streaming
    # consumer overlaps them).  Chunks run the fused Pallas row-range
    # kernel when the plan qualifies (the scale_rows dispatch path),
    # falling back to the windowed op-graph row machinery.
    step = plan.height_out // n_chunks
    use_fused = xla._pallas_rows_ok(plan)

    # The chain scalar must touch EVERY chunk's output: Pallas calls whose
    # results are unused get dead-code-eliminated (a naive concat[0,0,0]
    # measured "0.0 ms" -- XLA kept only chunk 0).
    if use_fused:
        from smolscale_tpu.ops import pallas_bilinear

        @jax.jit
        def all_chunks(v):
            outs = [
                pallas_bilinear.scale_rows_fn(plan, v, i * step, step)
                for i in range(n_chunks)
            ]
            return sum(o[0, 0, 0].astype(jnp.uint32) for o in outs)
    else:
        @jax.jit
        def all_chunks(v):
            padded = xla.pad_rows(plan, tables, v)
            outs = [
                xla.row_shard_fn(plan, tables, padded, jnp.int32(i))
                for i in range(n_chunks)
            ]
            return sum(o[0, 0, 0].astype(jnp.uint32) for o in outs)

    # exactness gate (the timing scalar can't prove correctness): full
    # concatenated chunks vs the numpy reference
    from smolscale_tpu.backends import numpy_ref

    if use_fused:
        from smolscale_tpu.ops import pallas_bilinear

        got = np.concatenate([
            np.asarray(jax.jit(
                lambda v, i=i: pallas_bilinear.scale_rows_fn(
                    plan, v, i * step, step)
            )(x))
            for i in range(n_chunks)
        ], axis=0)
    else:
        got = np.concatenate([
            np.asarray(jax.jit(
                lambda v, i=i: xla.row_shard_fn(
                    plan, tables, xla.pad_rows(plan, tables, v), jnp.int32(i))
            )(x))
            for i in range(n_chunks)
        ], axis=0)[: plan.height_out]
    exact = bool(np.array_equal(got, numpy_ref.scale(plan, img)))

    res = _chain_timer(all_chunks, x, n_short=1, n_long=5)
    per = res.per
    rec = {
        "config": "4: 8192^2->1024^2 streamed in 16 row chunks",
        "ms_total": round(per * 1000, 1),
        "in_mpix_s": round(8192 * 8192 / 1e6 / per, 1),
        "bit_exact": exact,
        "fused": use_fused,
        "confidence": res.confidence,
        "n_chain": res.n_long,
    }
    print(json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    main()
