"""Data-parallel batch encode: shard a batch of images across the mesh.

Each device encodes whole images independently (embarrassingly parallel —
the "100x 4K over 8 chips" configuration). The per-image program is the
same jitted pipeline as single-image encode, vmapped over the device-local
batch and laid out with shard_map so XLA keeps every image's data resident
on its own chip; the only cross-device traffic is the result fetch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from jpeg_encoder_tpu.config import DctAlgorithm, EncoderConfig, FrameGeometry
from jpeg_encoder_tpu.io import jfif
from jpeg_encoder_tpu import pipeline
from jpeg_encoder_tpu.parallel.mesh import DATA_AXIS


@functools.lru_cache(maxsize=32)
def compiled_batch_encoder(
    mesh: Mesh,
    geom: FrameGeometry,
    algorithm: DctAlgorithm,
    capacity_bytes: int,
    fast_dct: bool = False,
    bin_dct_descale: bool = False,
    quality: int | None = None,
    restart_interval: int | None = None,
):
    """Jitted (B, H, W, 3) -> ((B, capacity) payloads, (B,) bit lengths).

    With restart_interval set, the per-image program is the restart-mode
    core instead and the outputs gain an interval axis:
    (B, n_intervals, capacity) payloads and (B, n_intervals) bit lengths
    (capacity_bytes is then PER INTERVAL).
    """

    def per_image(rgb):
        if restart_interval is not None:
            out = pipeline.encode_core_restart(
                rgb, geom, algorithm, capacity_bytes, restart_interval,
                fast_dct, bin_dct_descale=bin_dct_descale, quality=quality,
            )
            return out["payloads"], out["bits"]
        out = pipeline.encode_core(
            rgb, geom, algorithm, capacity_bytes, fast_dct,
            bin_dct_descale=bin_dct_descale, quality=quality,
        )
        return out["payload"], out["total_bits"]

    def per_shard(batch):  # (B_local, H, W, 3)
        return jax.vmap(per_image)(batch)

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=P(DATA_AXIS),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        # Pallas outputs don't carry vma metadata; every kernel here is
        # shard-local, so the varying-mesh-axes check adds nothing.
        check_vma=False,
    )
    return jax.jit(sharded)


def encode_batch(
    images: np.ndarray,
    config: EncoderConfig,
    mesh: Mesh,
) -> list[bytes]:
    """Encode (B, H, W, 3) uint8 images -> list of B JFIF files.

    B is padded up to a multiple of the mesh size with blank images (their
    outputs are discarded), so any batch size works.
    """
    if images.ndim != 4 or images.shape[3] != 3:
        raise ValueError("expected (B, H, W, 3) uint8 batch")
    if config.optimize_huffman:
        # Per-image tables need a per-image stats pass + host table build;
        # the simple correct form is the single-image two-pass per member
        # (the heavy passes still run on device; a vmapped-LUT batch
        # program is a possible future optimization).
        return [
            pipeline.encode_array(np.asarray(im), config).file_bytes
            for im in images
        ]
    batch, height, width = images.shape[:3]
    geom = config.geometry(width, height)
    restart = config.restart_interval
    if restart is not None:
        pipeline.check_restart_geometry(geom)
        capacity = pipeline.restart_default_capacity_bytes(
            geom, restart, config.capacity_bytes_per_pixel
        )
    else:
        capacity = pipeline.default_capacity_bytes(
            geom, config.capacity_bytes_per_pixel
        )

    n_dev = mesh.devices.size
    padded_batch = -(-batch // n_dev) * n_dev
    if padded_batch != batch:
        pad = np.zeros((padded_batch - batch, height, width, 3), np.uint8)
        images = np.concatenate([images, pad])

    device_images = jnp.asarray(images)
    encoder = compiled_batch_encoder(
        mesh, geom, config.dct_algorithm, capacity, config.fast_dct,
        config.bin_dct_descale, config.quality, restart,
    )
    payloads, bit_lengths = encoder(device_images)
    bit_lengths = np.asarray(bit_lengths)
    # Device-side prefix slice before fetching: the capacity rectangle is
    # ~5x the real payloads, and device->host transfer is the dominant
    # host-path cost on remote-attached chips (pipeline.encode_array).
    max_bytes = min(capacity, (int(bit_lengths.max()) + 7) // 8)
    payloads = np.asarray(payloads[..., :max_bytes])

    files = []
    if restart is not None:
        for i in range(batch):
            bits_i = bit_lengths[i]
            if int(bits_i.max()) > 8 * capacity:
                # Per-image retry through the single-image restart path
                # (identical program semantics), starting past the rung
                # that just overflowed.
                files.append(
                    pipeline.encode_array(
                        np.asarray(images[i]), config,
                        _initial_capacity_bytes=(
                            pipeline.restart_next_capacity_bytes(
                                geom, restart, capacity
                            )
                        ),
                    ).file_bytes
                )
                continue
            files.append(jfif.assemble_restart(
                geom, payloads[i], [int(b) for b in bits_i], restart,
                quality=config.quality,
            ))
        return files
    header = jfif.header_bytes(geom, config.quality)
    for i in range(batch):
        bits = int(bit_lengths[i])
        if bits > 8 * capacity:
            # This image overflowed the shared capacity estimate. Re-encode
            # only it through the single-image path (same program semantics,
            # so the payload is byte-identical), starting at the next
            # capacity rung. Re-running the whole batch at 8x capacity would
            # inflate every member's buffer toward the fused kernel's VMEM
            # ceiling for one pathological image.
            result = pipeline.encode_array(
                np.asarray(images[i]), config,
                _initial_capacity_bytes=pipeline.next_capacity_bytes(
                    geom, capacity
                ),
            )
            files.append(result.file_bytes)
            continue
        nbytes = (bits + 7) // 8
        scan = jfif.stuff_bytes(payloads[i, :nbytes])
        files.append(header + scan + jfif.EOI)
    return files
