"""Throughput benchmark: steady-state single-chip encode rate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full device encode program (color convert -> subsample ->
RealDCT -> quantize -> run-length -> Huffman bit packing) on a batch of
1080p images resident on device, in Mpixel/s of *original image* pixels.
vs_baseline is the fraction of the BASELINE.json per-chip north star
(10 Gpixel/s aggregate on a v5e-16 => 625 Mpixel/s per chip).

Input data is generated on device (jax PRNG): the axon environment tunnels
to the chip over the network, so host->device transfer of benchmark inputs
would measure the tunnel, not the encoder. Details go to stderr; the JSON
line is the only stdout output.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

# Persistent compilation cache: the axon remote-compile service takes
# minutes for the full fused pipeline; cache hits make reruns instant.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from jpeg_encoder_tpu import pipeline
from jpeg_encoder_tpu.config import DctAlgorithm, EncoderConfig

BASELINE_MPIX_PER_CHIP = 10_000.0 / 16.0  # 10 Gpixel/s on 16 chips

HEIGHT, WIDTH = 1088, 1920  # 1080p rounded to an MCU multiple
BATCH = 8
WARMUP_ITERS = 2
MIN_TIMED_SECONDS = 3.0  # amortize the ~30 ms scalar-fetch RTT of the tunnel


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    config = EncoderConfig(subsampling_ratio=(4, 2, 0))
    geom = config.geometry(WIDTH, HEIGHT)
    capacity = pipeline.default_capacity_bytes(
        geom, config.capacity_bytes_per_pixel
    )

    def make_batch(seed):
        key = jax.random.key(seed)
        # Smooth-ish synthetic content (pure noise over-weights the packer).
        base = jax.random.uniform(key, (BATCH, HEIGHT // 8, WIDTH // 8, 3))
        img = jax.image.resize(base, (BATCH, HEIGHT, WIDTH, 3), "linear")
        noise = jax.random.uniform(jax.random.key(seed + 1),
                                   (BATCH, HEIGHT, WIDTH, 3)) * 0.1
        return ((img * 0.9 + noise) * 255).astype(jnp.uint8)

    # Dev A/B knob (byte-identical output): JPEG_TPU_TRANSPOSED_DCT=0/1
    # forces the XLA chain / transposed-chain Pallas kernel (unset: the
    # production auto default — the Pallas kernel on TPU).
    _tdct_env = os.environ.get("JPEG_TPU_TRANSPOSED_DCT")
    transposed_dct = None if _tdct_env is None else _tdct_env == "1"

    def encode_batch(images):
        def one(rgb):
            out = pipeline.encode_core(
                rgb, geom, DctAlgorithm.REAL_DCT, capacity, fast_dct=False,
                with_coeffs=False, transposed_dct=transposed_dct,
            )
            return out["payload"], out["total_bits"]
        return jax.vmap(one)(images)

    make_batch = jax.jit(make_batch, static_argnums=0)
    encode = jax.jit(encode_batch)

    device = jax.devices()[0]
    log(f"device: {device}, batch {BATCH} x {WIDTH}x{HEIGHT} RGB, "
        f"RealDCT 4:2:0")

    images = jax.block_until_ready(make_batch(0))
    t0 = time.perf_counter()
    payloads, bits = jax.block_until_ready(encode(images))
    log(f"first call (incl. compile): {time.perf_counter() - t0:.2f}s, "
        f"mean payload {float(jnp.mean(bits)) / 8 / 1024:.1f} KiB")
    assert int(jnp.max(bits)) <= 8 * capacity, (
        "benchmark payload overflowed the capacity estimate; a production "
        "encode would retry with pipeline.next_capacity_bytes"
    )

    def timed_run(iters: int) -> float:
        """Enqueue `iters` encodes, then fetch one scalar from the last.

        The device executes the queue in order, so the scalar of the final
        program is ready only after every enqueued batch has run; fetching
        it is the only sync primitive the tunneled platform is trusted to
        honor (block_until_ready was observed returning early here).
        """
        t0 = time.perf_counter()
        for i in range(iters):
            _, bits = encode(images)
        np.asarray(bits[0])
        return time.perf_counter() - t0

    for i in range(WARMUP_ITERS):
        timed_run(1)

    pixels_per_iter = BATCH * HEIGHT * WIDTH
    # Calibrate the iteration count so the run swamps the fetch RTT.
    est = timed_run(4) / 4
    iters = max(8, min(2048, int(MIN_TIMED_SECONDS / max(est, 1e-5))))
    elapsed = timed_run(iters)

    mpix_s = pixels_per_iter * iters / elapsed / 1e6
    log(f"steady state: {elapsed / iters * 1e3:.2f} ms/batch over {iters} "
        f"iters, {mpix_s:.1f} Mpixel/s")

    print(json.dumps({
        "metric": "single_chip_encode_throughput_1080p_420_realdct",
        "value": round(mpix_s, 2),
        "unit": "Mpixel/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_PER_CHIP, 4),
    }))


if __name__ == "__main__":
    main()
