"""CLI harness modes and the dependency-free PNG codec."""

import numpy as np

from smolscale_tpu import cli
from smolscale_tpu.utils import png

RNG = np.random.default_rng(5)


def test_png_roundtrip(tmp_path):
    for c in (1, 3, 4):
        shape = (23, 31) if c == 1 else (23, 31, c)
        img = RNG.integers(0, 256, shape, np.uint8)
        p = tmp_path / f"t{c}.png"
        png.write_png(p, img)
        assert np.array_equal(png.read_png(p), img)


def test_cli_check():
    assert cli.main(["--backend", "numpy", "check"]) == 0


def test_cli_generate(tmp_path):
    img = RNG.integers(0, 256, (24, 36, 4), np.uint8)
    src = tmp_path / "in.png"
    png.write_png(src, img)
    prefix = str(tmp_path / "out")
    assert cli.main(["--backend", "numpy", "generate", str(src), prefix, "2"]) == 0
    out = png.read_png(f"{prefix}-18x12.png")
    assert out.shape == (12, 18, 4)
