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

    Emits the reference's exact typedef names and array shapes
    (convdata.h:4-16) — ``ConvKernel64_99[64][9][9]``,
    ``ConvKernel32x64[32][64]``, ``ConvKernel32_55[32][5][5]`` — with
    nested-brace initializers, so the exported header drop-in replaces
    convdata.h in a reference build (the conv kernels index
    ``kernel[fc][i][j]``, srcnn.cpp:297,316,229).
    """
    w = weights
    c1w = np.asarray(w.conv1_w, np.float32).reshape(64, 9, 9)
    c2w = np.asarray(w.conv2_w, np.float32).reshape(32, 64)
    c3w = np.asarray(w.conv3_w, np.float32).reshape(32, 5, 5)

    def fmt(v):
        # shortest decimal that round-trips the float32 value, always with
        # a decimal point/exponent so the `f` suffix stays a valid literal
        s = np.format_float_positional(np.float32(v), unique=True, trim="0")
        if "." not in s and "e" not in s:
            s += ".0"
        return s + "f"

    def fmt_vec(row, indent):
        return indent + "{ " + ", ".join(fmt(v) for v in row) + " }"

    def fmt_2d(rows, indent="    "):
        return ",\n".join(fmt_vec(r, indent) for r in rows)

    def fmt_3d(blocks):
        return ",\n".join(
            "    {\n" + fmt_2d(b, "        ") + "\n    }" for b in blocks)

    lines = [
        "/* Auto-exported SRCNN 9-5-5 checkpoint (srcnn_cpp_tpu). */",
        "#ifndef __CONVDATA_H__",
        "#define __CONVDATA_H__",
        "",
        "#define CONV1_FILTERS       64",
        "#define CONV2_FILTERS       32",
        "",
        "typedef float KernelMat99[9][9];",
        "typedef float ConvKernel64_99[CONV1_FILTERS][9][9];",
        "typedef float ConvKernel32x64[CONV2_FILTERS][CONV1_FILTERS];",
        "typedef float ConvKernel32_55[CONV2_FILTERS][5][5];",
        "typedef float ConvKernel1[CONV1_FILTERS];",
        "typedef float ConvKernel2[CONV2_FILTERS];",
        "typedef float ConvKernel21[CONV2_FILTERS][CONV1_FILTERS];",
        "",
        "const ConvKernel1 biases_conv1 = {",
        "    " + ", ".join(fmt(v) for v in np.asarray(w.conv1_b)),
        "};",
        "",
        "const ConvKernel64_99 weights_conv1_data = {",
        fmt_3d(c1w),
        "};",
        "",
        "const ConvKernel2 biases_conv2 = {",
        "    " + ", ".join(fmt(v) for v in np.asarray(w.conv2_b)),
        "};",
        "",
        "const ConvKernel32x64 weights_conv2_data = {",
        fmt_2d(c2w),
        "};",
        "",
        f"const float biases_conv3 = {fmt(np.asarray(w.conv3_b).ravel()[0])};",
        "",
        "const ConvKernel32_55 weights_conv3_data = {",
        fmt_3d(c3w),
        "};",
        "",
        "#endif",
        "",
    ]
    Path(path).write_text("\n".join(lines))
