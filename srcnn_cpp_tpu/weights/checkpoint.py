"""Checkpoint save/restore (the runtime counterpart of convdata.h).

The reference's only checkpoint is the weight header compiled into the
binary (reference src/convdata.h included at srcnn.cpp:31) — load-only, by
recompilation.  Here checkpoints are first-class artifacts:

* ``save_npz`` / ``load_weights`` — the portable .npz format (the canonical
  pretrained checkpoint ships as srcnn955.npz);
* ``save_orbax`` / ``load_orbax`` — Orbax checkpointing for training runs
  (async-capable, multi-host safe), used by the trainer when available;
* ``export_convdata_header`` — writes a C header in the reference's layout
  so a trained model can be carried *back* to the reference binary.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .loader import SRCNNWeights, load_weights  # noqa: F401

_KEYS = ("conv1_w", "conv1_b", "conv2_w", "conv2_b", "conv3_w", "conv3_b")


def save_npz(path, weights: SRCNNWeights) -> None:
    np.savez_compressed(
        Path(path), **{k: np.asarray(getattr(weights, k)) for k in _KEYS})


def save_orbax(path, weights: SRCNNWeights) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).resolve(), weights.as_dict())


def load_orbax(path) -> SRCNNWeights:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(Path(path).resolve())
    return SRCNNWeights(**{k: np.asarray(tree[k]) for k in _KEYS})


def export_convdata_header(path, weights: SRCNNWeights) -> None:
    """Write weights as a convdata.h-layout C header (reference interop).

    Emits the same symbols the reference compiles in (convdata.h:19-1176):
    biases_conv1/weights_conv1_data/... with the 9-5-5 64/32 shapes.
    """
    w = weights
    c1w = np.asarray(w.conv1_w, np.float32).reshape(64, 81)
    c2w = np.asarray(w.conv2_w, np.float32).reshape(32, 64)
    c3w = np.asarray(w.conv3_w, np.float32).reshape(32, 25)

    def fmt_block(rows):
        return ",\n".join(
            "    { " + ", ".join(f"{v:.6g}f" for v in row) + " }"
            for row in rows)

    # declaration style matches the reference (typedef'd array types with
    # the symbol directly followed by `=`, convdata.h:19,32)
    lines = [
        "/* Auto-exported SRCNN 9-5-5 checkpoint (srcnn_cpp_tpu). */",
        "#define CONV1_FILTERS 64",
        "#define CONV2_FILTERS 32",
        "typedef float ConvKernel1[CONV1_FILTERS];",
        "typedef float ConvKernel64_99[CONV1_FILTERS][81];",
        "typedef float ConvKernel2[CONV2_FILTERS];",
        "typedef float ConvKernel32_64[CONV2_FILTERS][64];",
        "typedef float ConvKernel32_55[CONV2_FILTERS][25];",
        "const ConvKernel1 biases_conv1 = {",
        "    " + ", ".join(f"{v:.6g}f" for v in np.asarray(w.conv1_b)),
        "};",
        "const ConvKernel64_99 weights_conv1_data = {",
        fmt_block(c1w),
        "};",
        "const ConvKernel2 biases_conv2 = {",
        "    " + ", ".join(f"{v:.6g}f" for v in np.asarray(w.conv2_b)),
        "};",
        "const ConvKernel32_64 weights_conv2_data = {",
        fmt_block(c2w),
        "};",
        f"const float biases_conv3 = {float(np.asarray(w.conv3_b)[0]):.6g}f;",
        "const ConvKernel32_55 weights_conv3_data = {",
        fmt_block(c3w),
        "};",
        "",
    ]
    Path(path).write_text("\n".join(lines))
