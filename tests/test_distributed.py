"""Multi-process distributed runtime integration tests.

Spawns real OS processes that each call ``jax.distributed.initialize`` on
the CPU backend (2 processes x 2 virtual devices) and stream frames through
the full sharded pipeline with cross-process halo exchange — the hermetic
stand-in for a 2-host slice (SURVEY.md §4d, §5.8).  The ``--check`` flag
makes every process verify its locally-owned output block bit-exactly
against the monolithic single-device pipeline.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(port, pid, nprocs, extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.Popen(
        [sys.executable, "-m", "srcnn_cpp_tpu.parallel.distributed",
         f"--coordinator=127.0.0.1:{port}",
         f"--num-processes={nprocs}", f"--process-id={pid}",
         "--local-devices=2", "--platform=cpu", *extra],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=REPO)


def _run_all(nprocs, extra):
    port = _free_port()
    procs = [_spawn(port, pid, nprocs, extra) for pid in range(nprocs)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\nstdout:{o}\nstderr:{e}"
    # Gloo interleaves its own progress lines on stdout: take the JSON line
    return [json.loads(next(ln for ln in o.splitlines()
                            if ln.startswith("{"))) for o, _ in outs]


def test_two_process_stream_bitexact_row_spanning():
    """Rows of one frame span both processes: halos cross the process
    boundary and the stitched result must equal the monolith bit-for-bit."""
    rows = _run_all(2, ["--frames=3", "--size=64x48", "--scale=2", "--check"])
    for r in rows:
        assert r["processes"] == 2
        assert r["mesh"]["row"] == 4
        assert r["bitexact"] is True
        assert r["max_abs_diff"] == 0


def test_two_process_stream_bitexact_data_parallel():
    """data=2: each process owns whole frames; rows shard intra-process."""
    rows = _run_all(2, ["--data=2", "--frames=2", "--size=48x64",
                        "--scale=1.5", "--check"])
    for r in rows:
        assert r["mesh"] == {"data": 2, "row": 2, "col": 1}
        assert r["bitexact"] is True


def test_single_process_stream_on_virtual_mesh(weights):
    """The same runner degenerates to one process on the 8-device mesh."""
    from srcnn_cpp_tpu.parallel.distributed import frame_mesh, run_synthetic

    mesh = frame_mesh(data=2)
    r = run_synthetic(2, (48, 64), 2.0, mesh, weights=weights, depth=1,
                      check=True)
    assert r["bitexact"] is True
    assert r["frames"] == 4  # 2 pushes x data=2 frames per dispatch


def test_local_bounds_cover_sharding(weights):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from srcnn_cpp_tpu.parallel.distributed import _local_bounds, frame_mesh

    mesh = frame_mesh(data=2)
    spec = NamedSharding(mesh, P("data", None, "row", None))
    b = _local_bounds(spec, (4, 3, 32, 16), dims=(0, 2))
    assert b[0] == (0, 4)       # single process: owns everything
    assert b[2] == (0, 32)
