"""The SRCNN 9-5-5 conv stack as XLA convolutions (the baseline compute path).

Reproduces the numerics of the reference's hand-written kernels —
``Convolution99x11`` (reference src/srcnn.cpp:254-325) and ``Convolution55``
(:189-243) — as three ``lax.conv_general_dilated`` calls on the MXU:

* unnormalized uint8 0-255 input to conv1 (srcnn.cpp:297);
* replicate (clamp-to-edge) "same" padding, realized as an explicit edge pad
  followed by VALID convolution (srcnn.cpp:269-280 index LUTs);
* ReLU after conv1 and conv2, none after conv3 (srcnn.cpp:304,319);
* float32 accumulation (precision=HIGHEST so the MXU's bf16x3 passes carry
  full fp32 significance; the reference accumulates fp32/fp64 —
  srcnn.cpp:291-316,222-232);
* truncating uint8 quantization (srcnn.cpp:238-240) via
  :func:`..ops.quantize.quantize_trunc_u8`.

A fused single-pass Pallas kernel lives in :mod:`.pallas_srcnn`; this module
is the always-available reference path it is verified against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .quantize import quantize_trunc_u8

def _conv(x, w, precision):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=jnp.float32,
    )


def _edge_pad_hw(x, pad: int):
    """Replicate-pad the H and W dims of an NHWC tensor."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


def srcnn_y_f32(y, weights, precision=lax.Precision.HIGHEST):
    """3-layer SRCNN on float32 Y planes; returns pre-quantization float32.

    ``y``: ``[H, W]``, ``[B, H, W]`` or NHWC ``[B, H, W, 1]`` in the 0-255
    domain.  ``weights``: an ``SRCNNWeights`` (OIHW filter layout).
    """
    squeeze = []
    if y.ndim == 2:
        y = y[None]
        squeeze.append(0)
    if y.ndim == 3:
        y = y[..., None]
    x = y.astype(jnp.float32)

    w1 = jnp.transpose(weights.conv1_w.astype(jnp.float32), (2, 3, 1, 0))
    w2 = jnp.transpose(weights.conv2_w.astype(jnp.float32), (2, 3, 1, 0))
    w3 = jnp.transpose(weights.conv3_w.astype(jnp.float32), (2, 3, 1, 0))

    x = _conv(_edge_pad_hw(x, 4), w1, precision) + weights.conv1_b.astype(jnp.float32)
    x = jax.nn.relu(x)
    x = _conv(x, w2, precision) + weights.conv2_b.astype(jnp.float32)
    x = jax.nn.relu(x)
    x = _conv(_edge_pad_hw(x, 2), w3, precision) + weights.conv3_b.astype(jnp.float32)

    x = x[..., 0]
    for ax in squeeze:
        x = jnp.squeeze(x, ax)
    return x


def srcnn_y(y_u8, weights, precision=lax.Precision.HIGHEST):
    """uint8 Y plane(s) -> uint8 super-resolved Y plane(s)."""
    return quantize_trunc_u8(srcnn_y_f32(y_u8, weights, precision))
