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
* TPU: 0 mismatches — bit-exact.
* XLA:CPU: ~3.5k triples (2e-4) flip by one; the CPU backend forms FMAs
  even across jax.lax.optimization_barrier / reduce_precision (both were
  tried and are folded away), so it cannot currently be pinned to per-op
  rounding. The CPU test suite stays deterministic (fixed seeds), and the
  NumPy oracle carries the exactness contract there.
"""

from __future__ import annotations

import jax.numpy as jnp

_F = jnp.float32


def rgb_to_ycbcr(rgb: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(..., 3) uint8 RGB -> three uint8 planes (y, cb, cr)."""
    r = rgb[..., 0].astype(_F)
    g = rgb[..., 1].astype(_F)
    b = rgb[..., 2].astype(_F)

    y = (_F(0.299) * r + _F(0.587) * g) + _F(0.114) * b
    cb = ((_F(128.0) - _F(0.168736) * r) - _F(0.331264) * g) + _F(0.5) * b
    cr = ((_F(128.0) + _F(0.5) * r) - _F(0.418688) * g) - _F(0.081312) * b

    def to_u8(x: jnp.ndarray) -> jnp.ndarray:
        return jnp.clip(jnp.trunc(x), 0.0, 255.0).astype(jnp.uint8)

    return to_u8(y), to_u8(cb), to_u8(cr)


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
