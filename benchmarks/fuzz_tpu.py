#!/usr/bin/env python
"""On-hardware differential fuzz: random plans vs the compiled C reference.

Complements tests/test_fuzz_differential.py (CPU, seeded): this runs on the
real TPU chip, so it exercises the actual Pallas kernels and Mosaic
lowering, not the interpreter.  Found in round 1: an illegal (non-8-aligned,
multi-group) output row block for tiny outputs (fixed in
ops/pallas_bilinear._geometry / ops/pallas_box._pick_rows_t).

Usage: python benchmarks/fuzz_tpu.py [N] [seed] [--edges] [--mixed] [--box3]
                                     [--deep] [--boxchunk] [--copyaxes]
                                     [--vchunk] [--up] [--pyramid] [--s128]
  --edges weights toward tiny dims, deep up/downscales, 1x1 outputs.
  --mixed targets COPY/ONE mixed-axis plans (box-x-copy, ladder-x-one,
          copy-x-box, ...): one axis is forced to COPY (dim_out == dim_in)
          or ONE (dim_in == 1) while the other sweeps the filter space.
  --box3  targets the post-gather-edge general box path: resamples until
          the plan has 64bpp storage and a non-integer box axis.
  --deep  targets the chunk-centric ragged deep-box kernel: resamples
          until pallas_deep._chunk_centric accepts the plan (exercises the
          channel-stacked matmuls across gammas/storages).
  --boxchunk targets pallas_box's block-diagonal chunked span matmul:
          structured integer-ratio box plans with w_out a >128 multiple
          of 128 (n_chunks > 1), including dims the dense matrix's VMEM
          budget rejected.
  --copyaxes targets pallas_box's COPY-axis forms (copy-H x box-V strip
          and box-H x copy-V): resamples until pallas_box takes a plan
          with exactly one COPY axis.
  --s128  targets the 128bpp compressed-gamma kernel (pallas_128):
          resamples until it accepts the plan, weighting toward internal
          PREMUL16 (unassoc in+out) so the SWAR pair-product unpack and
          the f=128 packed-pair average get hit across filter shapes.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def _classify(run_once):
    """Run a differential attempt and disambiguate failure kinds.

    The axon remote-compile/transport layer can fail transiently (HTTP
    errors mid-compile produced one spurious "MISMATCH" in a round-4
    pyramid sweep); a certification sweep's failure count must mean
    numerics and nothing else.  Deterministic kernel bugs reproduce, so
    any non-OK first attempt is retried once:

      ok         -- exact on the first run
      transport  -- first attempt raised or mismatched, retry is exact
                    (transient; excluded from FAILS, reported separately)
      mismatch   -- wrong bytes on both runs (a real numeric finding)
      exc        -- raised on both runs (a real lowering/compile finding)

    Returns (status, detail).
    """
    try:
        if run_once():
            return "ok", ""
        first = "mismatch"
        detail = ""
    except Exception as e:
        first = "exc"
        detail = f"{type(e).__name__}: {str(e)[:120]}"
    try:
        ok2 = run_once()
    except Exception as e2:
        if first == "exc":
            return "exc", f"{detail}; retry {type(e2).__name__}: {str(e2)[:80]}"
        return "transport", f"retry raised {type(e2).__name__}: {str(e2)[:80]}"
    if ok2:
        return "transport", detail or "mismatch on first run only"
    return "mismatch", detail


def _report(counts, fails):
    print(
        "SUMMARY: ok={ok} mismatch={mismatch} exc={exc} "
        "transport_fail={transport}".format(**counts), flush=True,
    )
    print("FAILS:", fails, flush=True)
    sys.exit(1 if fails else 0)


def fuzz_pyramid(n: int, seed: int):
    """Differential fuzz for the fused multi-output pyramid kernel:
    random premul-format level sets vs the C oracle per level."""
    import jax
    import jax.numpy as jnp

    import oracle
    import smolscale_tpu as st
    from smolscale_tpu.ops import pallas_pyramid

    rng = np.random.default_rng(seed)
    print("backend:", jax.default_backend(), flush=True)
    fails = []
    counts = {"ok": 0, "mismatch": 0, "exc": 0, "transport": 0}
    i = 0
    while i < n:
        wi = 128 * int(rng.integers(1, 17))
        hi = 8 * int(rng.integers(2, 200))
        # 2-3 levels at bilinear-ladder ratios (2/4/8 exact divisions)
        n_lvl = int(rng.integers(2, 4))
        ratios = rng.permutation([2, 4, 8])[:n_lvl]
        # premul 4-byte, unassociated 4-byte, and 24bpp level sets all run
        # the fused kernel now; sample all three populations
        kind = int(rng.integers(0, 3))
        if kind == 0:
            ti, to = int(rng.integers(0, 4)), int(rng.integers(0, 4))
        elif kind == 1:
            # ONE-sided unassociated alpha (in-kernel premultiply /
            # unpremul epilogue); unassoc->unassoc is the PREMUL16
            # class and stays on the per-level kernels
            if rng.integers(0, 2):
                ti, to = int(rng.integers(4, 8)), int(rng.integers(0, 4))
            else:
                ti, to = int(rng.integers(0, 4)), int(rng.integers(4, 8))
        else:
            ti, to = int(rng.integers(8, 10)), int(rng.integers(8, 10))
        plans = []
        for r in ratios:
            if wi % r or hi % r:
                plans = None
                break
            plans.append(st.ScalePlan(wi, hi, wi // r, hi // r, ti, to, False))
        fused = (pallas_pyramid.pyramid_dispatch(tuple(plans))
                 if plans else None)
        if fused is None:  # incl. 24bpp surrogate-planes sets
            continue
        nb = plans[0].meta_in.n_bytes
        img = rng.integers(0, 256, (hi, wi, nb), dtype=np.uint8)
        if nb == 4:
            feed = np.ascontiguousarray(img).view(np.uint32)[..., 0]
        else:
            feed = img

        def run_once(plans=tuple(plans), feed=feed, img=img, ti=ti,
                     to=to, fused=fused):
            outs = jax.jit(fused)(jnp.asarray(feed))
            return all(
                np.array_equal(
                    np.asarray(o),
                    oracle.scale_simple(img, ti, p.width_out, p.height_out,
                                        to, False),
                )
                for p, o in zip(plans, outs)
            )

        status, detail = _classify(run_once)
        counts[status] += 1
        lv = ",".join(str(p.width_out) for p in plans)
        print(f"[{i:02d}] {wi}x{hi}->({lv}) t{ti}->{to}: "
              f"{status.upper()}{' ' + detail if detail else ''}", flush=True)
        if status in ("mismatch", "exc"):
            fails.append((i, wi, hi, tuple(ratios), ti, to, status))
        i += 1
    _report(counts, fails)


def main():
    import jax

    import oracle
    import smolscale_tpu as st

    from smolscale_tpu.plan import FilterType, StorageType

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--pyramid" in sys.argv:
        fuzz_pyramid(
            int(args[0]) if args else 24,
            int(args[1]) if len(args) > 1 else 20260816,
        )
    edges = "--edges" in sys.argv
    mixed = "--mixed" in sys.argv
    box3 = "--box3" in sys.argv
    deep = "--deep" in sys.argv
    boxchunk = "--boxchunk" in sys.argv
    copyaxes = "--copyaxes" in sys.argv
    vchunk = "--vchunk" in sys.argv
    up = "--up" in sys.argv
    s128 = "--s128" in sys.argv
    n = int(args[0]) if args else 24
    seed = int(args[1]) if len(args) > 1 else 20260816
    rng = np.random.default_rng(seed)
    print("backend:", jax.default_backend(), flush=True)

    fails = []
    counts = {"ok": 0, "mismatch": 0, "exc": 0, "transport": 0}
    for i in range(n):
        if up:
            # targets the single-column-tile upscale geometry (jc_out up
            # to 2048 with block-diagonal H chunking, _geo_kw): resample
            # bilinear-x-bilinear plans with width_out >= width_in
            from smolscale_tpu.ops import pallas_bilinear

            while True:
                wi = int(rng.integers(16, 1200))
                hi = int(rng.integers(16, 1200))
                wo = int(rng.integers(wi, min(2400, wi * 4) + 1))
                ho = int(rng.integers(16, max(17, hi * 3)))
                if wo * ho * 4 > 256 * 2**20:
                    continue
                ti, to = int(rng.integers(0, 10)), int(rng.integers(0, 10))
                srgb = False
                p = st.ScalePlan(wi, hi, wo, ho, ti, to, with_srgb=srgb)
                if (
                    p.x.filter.is_bilinear
                    and p.y.filter.is_bilinear
                    and pallas_bilinear.applicable(p)
                ):
                    break
        elif vchunk:
            # targets pallas_bilinear's K-chunked dense V matmul
            # (_v_chunk_slices): resample general-bilinear plans until the
            # selected geometry carries v_chunks (tall dense V matrices --
            # upscales and mild downscales with h_out >= 128)
            from smolscale_tpu.ops import pallas_bilinear

            while True:
                wi = int(rng.integers(64, 1200))
                hi = int(rng.integers(160, 1200))
                wo = int(rng.integers(32, max(33, wi * 2)))
                ho = int(rng.integers(160, max(161, hi * 2)))
                if wi * hi * 4 > 256 * 2**20:
                    continue
                ti, to = int(rng.integers(0, 10)), int(rng.integers(0, 10))
                srgb = False
                p = st.ScalePlan(wi, hi, wo, ho, ti, to, with_srgb=srgb)
                if not pallas_bilinear.applicable(p):
                    continue
                try:
                    geo = pallas_bilinear._geometry(
                        p, **pallas_bilinear._geo_kw(p)
                    )
                except Exception:
                    continue
                if geo is not None and geo.get("v_chunks") is not None:
                    break
        elif boxchunk:
            # structured dims: integer-ratio box both axes, w_out a >128
            # multiple of 128 so _span_chunks splits the matmul; resample
            # until pallas_box takes the plan (4-byte formats, 64bpp)
            from smolscale_tpu.ops import pallas_box

            while True:
                wo = 128 * int(rng.integers(2, 9))  # 256..1024
                rx = int(rng.integers(8, 17))  # box needs ratio > 8191/256
                wi = wo * rx
                ho = int(rng.integers(2, 65)) * 8
                ry = int(rng.integers(9, 17))
                hi = ho * ry
                if wi * hi * 4 > 256 * 2**20:  # keep uploads tunnel-safe
                    continue
                ti, to = int(rng.integers(0, 10)), int(rng.integers(0, 10))
                srgb = False
                p = st.ScalePlan(wi, hi, wo, ho, ti, to, with_srgb=srgb)
                if (
                    pallas_box.applicable(p)
                    and pallas_box._span_chunks(p.x) > 1
                ):
                    break
        elif copyaxes:
            # resample until pallas_box takes a plan with exactly one
            # COPY axis (the other integer-ratio box)
            from smolscale_tpu.ops import pallas_box

            while True:
                if rng.integers(0, 2):  # copy-H x box-V
                    wi = 128 * int(rng.integers(1, 33))
                    wo = wi
                    ry = int(rng.integers(9, 33))
                    ho = int(rng.integers(1, 65)) * 8
                    hi = ho * ry
                else:  # box-H x copy-V
                    rx = int(rng.integers(9, 33))
                    wo = int(rng.integers(1, 1025))
                    wi = wo * rx
                    hi = int(rng.integers(8, 3000))
                    ho = hi
                if wi % 128 or wi * hi * 4 > 256 * 2**20:
                    continue
                ti, to = int(rng.integers(0, 10)), int(rng.integers(0, 10))
                srgb = False
                p = st.ScalePlan(wi, hi, wo, ho, ti, to, with_srgb=srgb)
                if pallas_box.applicable(p) and FilterType.COPY in (
                    p.x.filter, p.y.filter
                ):
                    break
        elif s128:
            # resample until pallas_128 accepts the plan; 3 of 4 draws
            # force unassociated in+out (internal PREMUL16,
            # smolscale.c:751-758), the rest land deep-box S128 PREMUL8
            from smolscale_tpu.ops import pallas_128

            while True:
                wi = int(rng.integers(16, 2400))
                hi = int(rng.integers(16, 2400))
                wo = int(rng.integers(1, max(2, wi * 2)))
                ho = int(rng.integers(1, max(2, hi * 2)))
                if wi * hi * 4 > 256 * 2**20:
                    continue
                if rng.integers(0, 4):
                    ti = int(rng.choice([4, 5, 6, 7]))
                    to = int(rng.choice([4, 5, 6, 7]))
                else:
                    ti, to = int(rng.integers(0, 10)), int(rng.integers(0, 10))
                srgb = False
                p = st.ScalePlan(wi, hi, wo, ho, ti, to, with_srgb=srgb)
                if pallas_128.applicable(p):
                    break
        elif deep:
            # resample until the plan dispatches to the chunk-centric
            # ragged deep-box kernel (deep box both axes, every V span
            # >= 8 rows, not the uniform fast path)
            from smolscale_tpu.ops import pallas_deep

            while True:
                wi, hi = int(rng.integers(256, 3600)), int(rng.integers(256, 3600))
                wo = int(rng.integers(1, max(2, wi // 60)))
                ho = int(rng.integers(1, max(2, hi // 60)))
                ti, to = int(rng.integers(0, 10)), int(rng.integers(0, 10))
                srgb = bool(rng.integers(0, 2))
                p = st.ScalePlan(wi, hi, wo, ho, ti, to, with_srgb=srgb)
                if (
                    pallas_deep.applicable(p)
                    and not pallas_deep._uniform_deep(p)
                    and pallas_deep._chunk_centric(p) is not None
                ):
                    break
        elif box3:
            # resample until the plan lands on the post-gather-edge box
            # geometry: 64bpp storage + >=1 non-integer 8..255:1 box axis
            while True:
                wi, hi = int(rng.integers(80, 3200)), int(rng.integers(80, 3200))
                wo = int(rng.integers(max(1, wi // 255), max(2, wi // 8)))
                ho = int(rng.integers(1, max(2, hi * 2)))
                if rng.integers(0, 2):
                    wi, hi, wo, ho = hi, wi, ho, wo
                ti, to = int(rng.integers(0, 10)), int(rng.integers(0, 10))
                p = st.ScalePlan(wi, hi, wo, ho, ti, to, with_srgb=False)
                gen_box = any(
                    ax.filter == FilterType.BOX and d_in % d_out != 0
                    for ax, d_in, d_out in ((p.x, wi, wo), (p.y, hi, ho))
                )
                if p.storage == StorageType.S64 and gen_box:
                    break
        elif mixed:
            # free axis: anything from deep box to upscale ladder
            fd_in = int(rng.integers(8, 2048))
            fd_out = int(rng.integers(1, max(2, fd_in * 2)))
            triv_kind = int(rng.integers(0, 2))  # 0 = COPY, 1 = ONE
            td_in = 1 if triv_kind else int(rng.integers(1, 1024))
            td_out = int(rng.integers(1, 512)) if triv_kind else td_in
            if rng.integers(0, 2):  # trivial axis horizontal or vertical
                wi, wo, hi, ho = td_in, td_out, fd_in, fd_out
            else:
                wi, wo, hi, ho = fd_in, fd_out, td_in, td_out
        elif edges:
            mode = int(rng.integers(0, 3))
            if mode == 0:  # tiny everything
                wi, hi = int(rng.integers(1, 64)), int(rng.integers(1, 64))
                wo, ho = int(rng.integers(1, 64)), int(rng.integers(1, 64))
            elif mode == 1:  # deep downscale (incl. >8191:1 gamma fallback)
                wi, hi = int(rng.integers(512, 4096)), int(rng.integers(512, 4096))
                wo, ho = int(rng.integers(1, 16)), int(rng.integers(1, 16))
            else:  # deep upscale from tiny
                wi, hi = int(rng.integers(1, 32)), int(rng.integers(1, 32))
                wo, ho = int(rng.integers(64, 2048)), int(rng.integers(64, 2048))
        else:
            wi, hi = int(rng.integers(16, 1600)), int(rng.integers(16, 1200))
            wo = int(rng.integers(1, max(2, wi * 2)))
            ho = int(rng.integers(1, max(2, hi * 2)))
        if box3 or boxchunk or copyaxes or vchunk:
            srgb = False  # ti/to fixed by the resample loop above
        elif deep or s128:
            pass  # ti/to/srgb fixed by the resample loop above
        else:
            ti = int(rng.integers(0, 10))
            to = int(rng.integers(0, 10))
            srgb = bool(rng.integers(0, 2))
        plan = st.ScalePlan(wi, hi, wo, ho, ti, to, with_srgb=srgb)
        img = rng.integers(0, 256, (hi, wi, plan.meta_in.n_bytes), dtype=np.uint8)

        def run_once(plan=plan, img=img, ti=ti, wo=wo, ho=ho, to=to,
                     srgb=srgb):
            out = st.scale(plan, img)
            ref = oracle.scale_simple(img, ti, wo, ho, to, srgb)
            return bool(np.array_equal(out, ref))

        status, detail = _classify(run_once)
        counts[status] += 1
        print(
            f"[{i:02d}] {wi}x{hi}->{wo}x{ho} t{ti}->{to} srgb={int(srgb)}: "
            f"{status.upper()}{' ' + detail if detail else ''}", flush=True,
        )
        if status in ("mismatch", "exc"):
            fails.append((i, wi, hi, wo, ho, ti, to, srgb, status))

    _report(counts, fails)


if __name__ == "__main__":
    main()
