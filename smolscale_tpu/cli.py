"""Command-line harness: check / benchmark / benchmark-conv / generate.

The framework's equivalent of the reference's test driver modes
(test.c:1378-1390): correctness sweep, throughput benchmarks, the 10x10
format-conversion matrix, and PNG visual generation.

    python -m smolscale_tpu.cli check [--backend jax]
    python -m smolscale_tpu.cli benchmark [--width 1920 --height 1080 ...]
    python -m smolscale_tpu.cli benchmark-conv
    python -m smolscale_tpu.cli generate in.png out_prefix n_steps
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import smolscale_tpu as st
from .plan import ScalePlan
from .utils import png


def cmd_check(args) -> int:
    """Solid-color invariance sweep (test.c:1119-1298 strategy, reduced
    grid): scaling a constant image must reproduce the constant exactly --
    except the final output column at deep box ratios, where the numeric
    contract itself drops the last input pixel of each axis (the precalc
    clamp, smolscale-generic.c:105-110; the upstream produces e.g. 238 from
    solid 255 at 15->1).  Interior pixels are checked exactly; the final
    column within the bounded drop (<= value/8 + 2)."""
    rng = np.random.default_rng(1)
    sizes = [1, 2, 3, 5, 15, 16, 17, 100, 255, 256, 1000]
    failures = 0
    total = 0
    for ti in [0, 4, 8]:
        nb = 3 if ti >= 8 else 4
        color = rng.integers(0, 256, nb, dtype=np.uint8)
        if nb == 4:
            color[3] = 255
        tol_last = color.astype(int) // 8 + 2
        # unassociated formats route through the lossy premul8 roundtrip
        # (inv-div tables, smolscale.c:268-275): +-1 interior drift even in
        # the upstream (e.g. 256->17 produces 244 from solid 243)
        tol_int = 1 if ti == 4 else 0
        for wi in sizes:
            for wo in sizes:
                img = np.broadcast_to(color, (3, wi, nb)).copy()
                plan = ScalePlan(wi, 3, wo, 3, ti, ti, False)
                out = np.asarray(st.scale(plan, img, backend=args.backend)).astype(int)
                total += 1
                interior_ok = (
                    (np.abs(out[:, :-1] - color) <= tol_int).all() if wo > 1 else True
                )
                last_ok = (np.abs(out[:, -1] - color) <= tol_last).all()
                if not (interior_ok and last_ok):
                    failures += 1
                    print(f"FAIL {wi}->{wo} type {ti}: {out[0,-1]} vs {color}")
    print(f"check: {total - failures}/{total} ok")
    return 1 if failures else 0


def _bench_one(plan: ScalePlan, backend: str, reps: int = 5) -> float:
    """Min-time pixels/s = (in+out)/elapsed (test.c:219-224 metric)."""
    rng = np.random.default_rng(0)
    img = rng.integers(
        0, 256, (plan.height_in, plan.width_in, plan.meta_in.n_bytes), np.uint8
    )
    st.scale(plan, img, backend=backend)  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        st.scale(plan, img, backend=backend)
        best = min(best, time.time() - t0)
    px = plan.width_in * plan.height_in + plan.width_out * plan.height_out
    return px / best


def cmd_benchmark(args) -> int:
    """Proportional-resize sweep (bench.sh:41-52 recipe shape)."""
    w, h = args.width, args.height
    steps = args.steps
    print(f"# {w}x{h} proportional sweep, {steps} steps, backend={args.backend}")
    print("scale\twidth\theight\tMpix/s")
    for i in range(1, steps + 1):
        f = args.min_scale + (args.max_scale - args.min_scale) * i / steps
        wo, ho = max(1, int(w * f)), max(1, int(h * f))
        plan = ScalePlan(w, h, wo, ho, args.ptype, args.ptype, args.srgb)
        pps = _bench_one(plan, args.backend, args.reps)
        print(f"{f:.3f}\t{wo}\t{ho}\t{pps/1e6:.1f}")
    return 0


def cmd_benchmark_conv(args) -> int:
    """10x10 pixel-type conversion matrix (test.c:1055-1107 recipe,
    3840x2160 -> 3839x2159)."""
    print("# conversion matrix Mpix/s (rows: in type, cols: out type)")
    for ti in range(10):
        row = []
        for to in range(10):
            plan = ScalePlan(3840, 2160, 3839, 2159, ti, to, args.srgb)
            pps = _bench_one(plan, args.backend, args.reps)
            row.append(f"{pps/1e6:7.0f}")
        print(f"t{ti}: " + " ".join(row))
    return 0


def cmd_generate(args) -> int:
    """PNG in -> n scaled PNGs out (test.c:1302-1371 visual regression)."""
    img = png.read_png(args.input)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    ptype = st.PixelType.RGBA8_UNASSOCIATED if img.shape[2] == 4 else st.PixelType.RGB8
    h, w = img.shape[:2]
    for i in range(1, args.n + 1):
        f = i / args.n
        wo, ho = max(1, int(w * f)), max(1, int(h * f))
        out = np.asarray(
            st.scale_simple(img, ptype, wo, ho, with_srgb=args.srgb,
                            backend=args.backend)
        )
        path = f"{args.prefix}-{wo}x{ho}.png"
        png.write_png(path, out)
        print(path)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="smolscale_tpu.cli")
    ap.add_argument("--backend", default="auto")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("check")

    b = sub.add_parser("benchmark")
    b.add_argument("--width", type=int, default=1920)
    b.add_argument("--height", type=int, default=1080)
    b.add_argument("--steps", type=int, default=20)
    b.add_argument("--min-scale", type=float, default=0.01)
    b.add_argument("--max-scale", type=float, default=2.0)
    b.add_argument("--reps", type=int, default=5)
    b.add_argument("--ptype", type=int, default=0)
    b.add_argument("--srgb", action="store_true")

    c = sub.add_parser("benchmark-conv")
    c.add_argument("--reps", type=int, default=3)
    c.add_argument("--srgb", action="store_true")

    g = sub.add_parser("generate")
    g.add_argument("input")
    g.add_argument("prefix")
    g.add_argument("n", type=int, nargs="?", default=5)
    g.add_argument("--srgb", action="store_true")

    args = ap.parse_args(argv)
    return {
        "check": cmd_check,
        "benchmark": cmd_benchmark,
        "benchmark-conv": cmd_benchmark_conv,
        "generate": cmd_generate,
    }[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
