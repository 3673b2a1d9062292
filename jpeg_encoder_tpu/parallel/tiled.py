"""Sharded single-image encode: MCU bands across the mesh + ICI collectives.

The TPU answer to "the image is too big for one chip" (the analog of
sequence parallelism): split the image into contiguous MCU-row bands, one
per device. Every stage is band-local except two genuinely global pieces of
state, both tiny:

* the running DC predictors — each band's first DC difference depends on
  the previous band's final DC value. Since raw DCs are known after the
  DCT, one `lax.ppermute` (three int32 per device, riding ICI) shifts each
  band's final (Y, Cb, Cr) DCs to its successor; band 0 receives the
  implicit zero predictors. No serial chain, one hop.
* the bitstream itself — each band packs its own byte-aligned stream and
  reports its exact bit length; the host splices them at bit level
  (utils/bits.py), which costs O(payload bytes).

The result is byte-identical to the single-device encode (asserted in
tests on a virtual 8-device mesh).

Constraints: the global MCU row count must divide by the mesh size, and the
degenerate width/height % (8*factor) == 1 geometries (where the reference's
chroma grid misaligns with the luma superblock grid; see
oracle.subsample_plane) are rejected — band-local encoding cannot reproduce
that global misalignment, and no real image hits it deliberately.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from jpeg_encoder_tpu import pipeline, tables
from jpeg_encoder_tpu.config import DctAlgorithm, EncoderConfig, FrameGeometry
from jpeg_encoder_tpu.io import jfif
from jpeg_encoder_tpu.ops import color, dct, entropy, sample
from jpeg_encoder_tpu.parallel.mesh import DATA_AXIS
from jpeg_encoder_tpu.utils.bits import splice_bitstreams


def _check_tileable(geom: FrameGeometry, n_dev: int) -> None:
    if geom.chroma_width != geom.padded_width // geom.h_factor or (
        geom.chroma_height != geom.padded_height // geom.v_factor
    ):
        raise ValueError(
            "tiled encode requires aligned luma/chroma grids; "
            f"dimensions {geom.width}x{geom.height} hit the reference's "
            "dim % (8*factor) == 1 misalignment quirk"
        )
    if geom.mcu_rows % n_dev != 0:
        raise ValueError(
            f"MCU row count {geom.mcu_rows} must divide by mesh size {n_dev}"
        )


@functools.lru_cache(maxsize=32)
def compiled_tiled_encoder(
    mesh: Mesh,
    geom: FrameGeometry,
    algorithm: DctAlgorithm,
    capacity: int,
    fast_dct: bool = False,
):
    """Jitted (padded_height, W, 3) -> ((n_dev, cap) payloads, (n_dev,) bits)."""
    n_dev = mesh.devices.size
    band_h = geom.padded_height // n_dev
    band_geom = _band_geometry(geom, band_h)

    def shard_fn(rgb_band):  # (band_h, W, 3) uint8
        idx = jax.lax.axis_index(DATA_AXIS)
        y, cb, cr = color.rgb_to_ycbcr(rgb_band)
        # Rows at or beyond the original image height are zero in the
        # reference's planes (the host hands us arbitrary padding content).
        row = idx * band_h + jnp.arange(band_h)
        live = (row < geom.height)[:, None]
        y = jnp.where(live, y, 0)
        cb = jnp.where(live, cb, 0)
        cr = jnp.where(live, cr, 0)

        y = sample.pad_plane(y, band_geom)
        cb = sample.subsample_plane(sample.pad_plane(cb, band_geom), band_geom)
        cr = sample.subsample_plane(sample.pad_plane(cr, band_geom), band_geom)

        y_q = dct.dct_quantize(
            sample.blockify(y), tables.Y_QUANT_TABLE, algorithm, fast_dct
        )
        cb_q = dct.dct_quantize(
            sample.blockify(cb), tables.C_QUANT_TABLE, algorithm, fast_dct
        )
        cr_q = dct.dct_quantize(
            sample.blockify(cr), tables.C_QUANT_TABLE, algorithm, fast_dct
        )

        # Chain DC predictors: my final DCs become my successor's initers.
        lasts = entropy.final_dc(y_q, cb_q, cr_q, band_geom)
        prev = jax.lax.ppermute(
            lasts, DATA_AXIS, [(i, i + 1) for i in range(n_dev - 1)]
        )  # band 0 gets zeros: the scan's initial predictors

        payload, bits = entropy.encode_scan(
            y_q, cb_q, cr_q, band_geom, capacity, init_dc=prev
        )
        return payload[None], bits[None]

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P(DATA_AXIS, None, None),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS)),
        # Pallas outputs don't carry vma metadata; every kernel here is
        # shard-local, so the varying-mesh-axes check adds nothing.
        check_vma=False,
    )
    return jax.jit(sharded)


def _band_geometry(geom: FrameGeometry, band_h: int) -> FrameGeometry:
    """Geometry of one full-width MCU band of band_h pixel rows."""
    band = FrameGeometry(
        width=geom.width,
        height=band_h,
        h_factor=geom.h_factor,
        v_factor=geom.v_factor,
    )
    assert band.padded_height == band_h  # band_h is a multiple of 8*v
    return band


def encode_tiled(
    rgb: np.ndarray,
    config: EncoderConfig,
    mesh: Mesh,
) -> pipeline.EncodeResult:
    """Encode one (H, W, 3) image sharded into MCU bands across the mesh."""
    height, width = rgb.shape[:2]
    geom = config.geometry(width, height)
    n_dev = mesh.devices.size
    _check_tileable(geom, n_dev)

    padded = np.zeros((geom.padded_height, width, 3), np.uint8)
    padded[:height] = rgb

    band_geom = _band_geometry(geom, geom.padded_height // n_dev)
    capacity = pipeline.default_capacity_bytes(
        band_geom, config.capacity_bytes_per_pixel
    )
    device_rgb = jnp.asarray(padded)
    while True:
        encoder = compiled_tiled_encoder(
            mesh, geom, config.dct_algorithm, capacity, config.fast_dct
        )
        payloads, bit_lengths = encoder(device_rgb)
        bit_lengths = np.asarray(bit_lengths)
        if int(bit_lengths.max()) <= 8 * capacity:
            break
        # A band overflowed the capacity estimate: grow and re-encode.
        capacity = pipeline.next_capacity_bytes(band_geom, capacity)
    payloads = np.asarray(payloads)

    spliced, total_bits = splice_bitstreams(
        [(payloads[i], int(bit_lengths[i])) for i in range(n_dev)]
    )
    return pipeline.EncodeResult(
        file_bytes=jfif.assemble(geom, spliced),
        entropy_payload=spliced,
        bit_length=total_bits,
        geom=geom,
    )
