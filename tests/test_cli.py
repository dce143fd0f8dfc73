"""CLI surface tests: flags, default output naming, exit codes, narration.

Mirrors the reference arg parser semantics (reference src/srcnn.cpp:331-425)
without spawning a subprocess per case (parse_args is pure); one subprocess
test covers the full binary-equivalent invocation.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from srcnn_cpp_tpu.cli import parse_args


def test_defaults():
    opts = parse_args(["photo.png"])
    assert opts["scale"] == 2.0
    assert opts["verbose"] is True
    assert opts["src"] == "photo.png"
    assert opts["dst"] == "photo_resized.png"


def test_scale_parsing():
    assert parse_args(["--scale=1.5", "a.jpg"])["scale"] == 1.5
    # non-positive or malformed scales fall back to the default (ref :359-370)
    assert parse_args(["--scale=-3", "a.jpg"])["scale"] == 2.0
    assert parse_args(["--scale=abc", "a.jpg"])["scale"] == 2.0


def test_noverbose_and_dst():
    opts = parse_args(["--noverbose", "in.png", "out.png"])
    assert opts["verbose"] is False
    assert opts["dst"] == "out.png"


def test_help_returns_none():
    assert parse_args(["--help"]) is None


def test_missing_src_is_error():
    from srcnn_cpp_tpu.cli import main

    assert main(["--noverbose"]) == 1


@pytest.mark.slow
def test_end_to_end_subprocess(tmp_path):
    import cv2

    src = tmp_path / "in.png"
    img = np.random.default_rng(0).integers(0, 256, (32, 48, 3), dtype=np.uint8)
    cv2.imwrite(str(src), img)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "srcnn_cpp_tpu", "--scale=1.5", str(src)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    out_path = tmp_path / "in_resized.png"
    assert out_path.exists()
    out = cv2.imread(str(out_path))
    assert out.shape == (48, 72, 3)
    assert "Performance" in proc.stdout
