"""Shared on-chip A/B methodology for every benchmark harness.

All decision-grade measurements in this repo follow one protocol
(KERNEL_NOTES rounds 2-4), factored here so the harnesses
(the ab.py and profile.py subcommands) cannot drift:

* ONE process, variants INTERLEAVED best-of-N — the shared chip drifts
  ±20% across processes and ±5% across minutes, so only same-process
  interleaved deltas are decision-grade;
* completion fenced by a tiny host fetch (``block_until_ready`` does not
  fence through the axon relay), never a bulk download (the dev tunnel's
  ~10-30 MB/s would dominate);
* per-variant compile failures tolerated (VMEM spills drop out of a sweep
  without killing it);
* every variant bit-checked against the experiment's anchor/reference
  before timing, because a fast-but-wrong variant is not a result.
"""

from __future__ import annotations

import time

import numpy as np


def fence(out):
    """Force completion with a tiny host fetch (relay-safe)."""
    o = out
    while isinstance(o, (tuple, list)):
        o = o[0]
    np.asarray(o[(slice(0, 1),) * o.ndim])


def compile_all(cases, *, check=None, on_fail: str = "skip"):
    """Compile each ``name -> thunk``; returns ``(fns, outs)`` survivors.

    ``outs[name]`` keeps the first (device) output for anchor bit-checks.
    ``check(name, out)`` (optional) runs once per variant on the first
    output — print a bit-check line or raise to reject the variant.
    ``on_fail="skip"`` drops variants whose compile raises (VMEM spills in
    sweeps); ``"raise"`` propagates.
    """
    fns, outs = {}, {}
    for name, thunk in cases.items():
        try:
            out = thunk()
            fence(out)
        except Exception as e:
            if on_fail != "skip":
                raise
            print(f"compile FAILED {name}: {type(e).__name__}", flush=True)
            continue
        if check is not None:
            check(name, out)
        else:
            print(f"compiled {name}", flush=True)
        fns[name] = thunk
        outs[name] = out
    return fns, outs


def time_interleaved(fns, *, rounds: int = 5, iters: int = 4):
    """Interleaved best-of-N: ``{name: best seconds per call}``."""
    best = {name: float("inf") for name in fns}
    for _ in range(rounds):
        for name, thunk in fns.items():
            t0 = time.monotonic()
            out = None
            for _ in range(iters):
                out = thunk()
            fence(out)
            best[name] = min(best[name], (time.monotonic() - t0) / iters)
    return best


def print_table(title: str, best, mp: float):
    """Standard ``variant / ms / MP/s`` table."""
    print(f"\n{title}")
    print(f"{'variant':>20}  {'ms':>8}  {'MP/s':>8}")
    for name, sec in best.items():
        print(f"{name:>20}  {sec * 1e3:8.2f}  {mp / sec:8.1f}")
