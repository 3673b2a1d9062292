"""RGB -> YCbCr color conversion (BT.601 / JFIF constants).

TPU-native formulation: one vectorized elementwise pass over the whole image
(VPU work, fused by XLA with the surrounding pad/reshape), instead of the
reference's per-pixel scalar loop (colorspace.rs:5-15, jpeg_image.rs:121-134).

Numerics contract: float32 with per-operation rounding and the same
association order as the reference, final cast truncating toward zero with
saturation (Rust `as u8`).

The per-operation rounding is load-bearing: contracting `a * b + c` into
an FMA merges two roundings into one and flips pixels whose exact value
lands on a rounding tie (e.g. RGB (1, 233, 245): the reference's f32 chain
hits the exact tie 164.99999237 and rounds-to-even to 165.0; the FMA's
exact product steers it to 164.99998 — truncating to 164). Rust never
contracts (LLVM default fp-contract=off), so the oracle is ground truth.

Backend status, measured exhaustively over all 2^24 RGB triples
(tools/hw_parity_sweep.py --color):
* TPU: 0 mismatches with the plain multiply chain — bit-exact.
* XLA:CPU: the multiply chain flipped ~3.5k triples (2e-4) by one; the CPU
  backend forms FMAs even across jax.lax.optimization_barrier /
  reduce_precision (both were tried and are folded away). Non-TPU backends
  therefore use a contraction-proof formulation: each per-channel PRODUCT
  comes from a precomputed 256-entry f32 table (NumPy computes the exact
  per-op-rounded values host-side), so the traced program contains only
  additions — and an add chain has no mul to contract with, making the
  result per-op-rounded on any IEEE backend. Verified exhaustively vs the
  oracle on CPU (tests/test_ops.py::test_color_exhaustive_cpu).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_F = jnp.float32
_F32 = np.float32


@functools.cache
def _channel_luts() -> tuple[np.ndarray, ...]:
    """Per-channel contribution tables, exactly per-op-rounded in f32.

    Each table entry is the f32 value the reference's scalar chain holds
    after the multiplications touching that channel (colorspace.rs:10-12):
    NumPy evaluates them elementwise with one rounding per operation and
    no contraction, so gather + add/sub reproduces the chain bit-exactly.
    """
    c = np.arange(256, dtype=_F32)
    y_r = _F32(0.299) * c
    y_g = _F32(0.587) * c
    y_b = _F32(0.114) * c
    cb_r = _F32(128.0) - _F32(0.168736) * c  # first two ops of the cb chain
    cb_g = _F32(0.331264) * c
    cb_b = _F32(0.5) * c
    cr_r = _F32(128.0) + _F32(0.5) * c
    cr_g = _F32(0.418688) * c
    cr_b = _F32(0.081312) * c
    return y_r, y_g, y_b, cb_r, cb_g, cb_b, cr_r, cr_g, cr_b


def _to_u8(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.trunc(x), 0.0, 255.0).astype(jnp.uint8)


def rgb_to_ycbcr(rgb: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(..., 3) uint8 RGB -> three uint8 planes (y, cb, cr)."""
    if jax.default_backend() == "tpu":
        # Plain multiply chain: fuses into the surrounding pipeline and is
        # measured bit-exact on TPU (no FMA contraction observed across the
        # 2^24 sweep with per-op association preserved).
        r = rgb[..., 0].astype(_F)
        g = rgb[..., 1].astype(_F)
        b = rgb[..., 2].astype(_F)
        y = (_F(0.299) * r + _F(0.587) * g) + _F(0.114) * b
        cb = ((_F(128.0) - _F(0.168736) * r) - _F(0.331264) * g) + _F(0.5) * b
        cr = ((_F(128.0) + _F(0.5) * r) - _F(0.418688) * g) - _F(0.081312) * b
        return _to_u8(y), _to_u8(cb), _to_u8(cr)

    # Contraction-proof path (XLA:CPU and anything else): products via
    # tables, adds in the traced program — nothing for an FMA to merge.
    y_r, y_g, y_b, cb_r, cb_g, cb_b, cr_r, cr_g, cr_b = (
        jnp.asarray(t) for t in _channel_luts()
    )
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    y = (y_r[r] + y_g[g]) + y_b[b]
    cb = (cb_r[r] - cb_g[g]) + cb_b[b]
    cr = (cr_r[r] - cr_g[g]) - cr_b[b]
    return _to_u8(y), _to_u8(cb), _to_u8(cr)


def ycbcr_to_rgb(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray) -> jnp.ndarray:
    """Inverse transform (colorspace.rs:17-27 equivalent), for round-trips."""
    yf = y.astype(_F)
    cbf = cb.astype(_F) - _F(128.0)
    crf = cr.astype(_F) - _F(128.0)
    r = yf + _F(1.402) * crf
    g = (yf - _F(0.344136) * cbf) - _F(0.714136) * crf
    b = yf + _F(1.772) * cbf
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.trunc(rgb), 0.0, 255.0).astype(jnp.uint8)
