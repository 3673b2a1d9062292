"""End-to-end encode pipeline: one jitted device program + host assembly.

The reference runs five sequential host stages with two thread-scope forks
(main.rs:8-68). Here the entire compute path — color conversion, padding,
subsampling, both DCT variants, quantization, run-length symbolization and
Huffman bit packing — is a single XLA program per (geometry, algorithm)
pair, traced once and cached. The host only decodes the BMP, slices the
packed payload, stuffs 0xFF bytes, and concatenates the JFIF container.

The per-channel thread parallelism of the reference (sampling.rs:83-98,
dct_quant.rs:29-60) is subsumed by batching: all three channels' blocks flow
through the same vectorized ops, and XLA schedules them across the chip.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jpeg_encoder_tpu import tables
from jpeg_encoder_tpu.config import DctAlgorithm, EncoderConfig, FrameGeometry
from jpeg_encoder_tpu.io import bmp, jfif
from jpeg_encoder_tpu.ops import color, dct, entropy, sample

# Hard upper bound on packed bits per scan entry (one 8x8 block):
# DC slot <= 11+11, 63 AC slots <= 16+10, EOB <= 16. We use the round
# 65 * 27 bound; with it, overflow is impossible and no retry path is needed.
WORST_CASE_BITS_PER_ENTRY = entropy.SLOTS_PER_ENTRY * 27


def worst_case_capacity_bytes(geom: FrameGeometry) -> int:
    bits = geom.num_scan_entries * WORST_CASE_BITS_PER_ENTRY
    return (bits // 8 + 4) // 4 * 4


def encode_core(
    rgb: jnp.ndarray,
    geom: FrameGeometry,
    algorithm: DctAlgorithm,
    capacity_bytes: int,
    fast_dct: bool = False,
) -> dict[str, jnp.ndarray]:
    """(H, W, 3) uint8 -> packed entropy payload + quantized coefficients.

    Pure, jittable, and vmap/shard_map-compatible for fixed static args.
    """
    y, cb, cr = color.rgb_to_ycbcr(rgb)
    y = sample.pad_plane(y, geom)
    cb = sample.subsample_plane(sample.pad_plane(cb, geom), geom)
    cr = sample.subsample_plane(sample.pad_plane(cr, geom), geom)

    y_q = dct.dct_quantize(
        sample.blockify(y), tables.Y_QUANT_TABLE, algorithm, fast_dct
    )
    cb_q = dct.dct_quantize(
        sample.blockify(cb), tables.C_QUANT_TABLE, algorithm, fast_dct
    )
    cr_q = dct.dct_quantize(
        sample.blockify(cr), tables.C_QUANT_TABLE, algorithm, fast_dct
    )

    payload, total_bits = entropy.encode_scan(y_q, cb_q, cr_q, geom, capacity_bytes)
    return {
        "payload": payload,
        "total_bits": total_bits,
        "y_coeffs": y_q,
        "cb_coeffs": cb_q,
        "cr_coeffs": cr_q,
    }


@functools.lru_cache(maxsize=64)
def compiled_encoder(
    geom: FrameGeometry,
    algorithm: DctAlgorithm,
    capacity_bytes: int,
    fast_dct: bool = False,
):
    """Jitted encode_core for one static configuration (cached)."""

    def fn(rgb: jnp.ndarray) -> dict[str, jnp.ndarray]:
        return encode_core(rgb, geom, algorithm, capacity_bytes, fast_dct)

    return jax.jit(fn)


@dataclasses.dataclass
class EncodeResult:
    file_bytes: bytes
    entropy_payload: bytes  # unstuffed scan payload
    bit_length: int
    geom: FrameGeometry


def encode_array(
    rgb: np.ndarray,
    config: EncoderConfig = EncoderConfig(),
    *,
    return_coeffs: bool = False,
):
    """Encode an (H, W, 3) uint8 RGB array into JFIF bytes."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (H, W, 3) RGB input")
    height, width = rgb.shape[:2]
    geom = config.geometry(width, height)
    capacity = worst_case_capacity_bytes(geom)
    out = compiled_encoder(geom, config.dct_algorithm, capacity, config.fast_dct)(
        jnp.asarray(rgb, dtype=jnp.uint8)
    )
    bit_length = int(out["total_bits"])
    num_bytes = (bit_length + 7) // 8
    payload = np.asarray(out["payload"])[:num_bytes].tobytes()
    result = EncodeResult(
        file_bytes=jfif.assemble(geom, payload),
        entropy_payload=payload,
        bit_length=bit_length,
        geom=geom,
    )
    if return_coeffs:
        coeffs = tuple(
            np.asarray(out[k]) for k in ("y_coeffs", "cb_coeffs", "cr_coeffs")
        )
        return result, coeffs
    return result


def encode_file(
    bmp_path: str | os.PathLike,
    output_path: str | os.PathLike,
    config: EncoderConfig = EncoderConfig(),
) -> EncodeResult:
    """BMP file -> JFIF file (the reference's single-image CLI path)."""
    rgb = bmp.read(bmp_path)
    result = encode_array(rgb, config)
    with open(output_path, "wb") as f:
        f.write(result.file_bytes)
    return result
