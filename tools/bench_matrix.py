"""Throughput matrix: ratios x DCT algorithms (BASELINE configs 2 & 3).

Batch 8 x 1080p, device-resident inputs. Timing discipline is IDENTICAL to
bench.py (the canonical flagship bench): the jitted program returns the
per-image payload bytes AND bit counts (so the u32->byte serialization is
part of the measurement, exactly like a production encode), enqueue-K +
scalar-fetch timing with the iteration count calibrated to swamp the
tunnel's fetch RTT. The 4:2:0 real-dct row of this table and bench.py's
JSON line are therefore the same measurement up to run noise.

Prints one markdown table row per configuration.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from jpeg_encoder_tpu import pipeline
from jpeg_encoder_tpu.config import DctAlgorithm, EncoderConfig

H, W, B = 1088, 1920, 8
MIN_TIMED_SECONDS = 3.0
key = jax.random.key(0)
base = jax.random.uniform(key, (B, H // 8, W // 8, 3))
img = jax.image.resize(base, (B, H, W, 3), "linear")
noise = jax.random.uniform(jax.random.key(100), (B, H, W, 3)) * 0.1
images = ((img * 0.9 + noise) * 255).astype(jnp.uint8)

print("| ratio | algorithm | Mpixel/s |")
print("|---|---|---|")
for ratio in [(4, 2, 0), (4, 2, 2), (4, 4, 4)]:
    for algo in [DctAlgorithm.REAL_DCT, DctAlgorithm.BIN_DCT]:
        config = EncoderConfig(subsampling_ratio=ratio, dct_algorithm=algo)
        geom = config.geometry(W, H)
        cap = pipeline.default_capacity_bytes(
            geom, config.capacity_bytes_per_pixel)

        @jax.jit
        def go(imgs, geom=geom, algo=algo, cap=cap):
            def one(rgb):
                out = pipeline.encode_core(
                    rgb, geom, algo, cap, with_coeffs=False)
                return out["payload"], out["total_bits"]
            return jax.vmap(one)(imgs)

        def timed_run(iters):
            t0 = time.perf_counter()
            for _ in range(iters):
                _, bits = go(images)
            np.asarray(bits[0])
            return time.perf_counter() - t0

        _, bits = go(images)
        _ = np.asarray(bits[0])
        for _ in range(2):
            timed_run(1)
        est = timed_run(4) / 4
        iters = max(8, min(2048, int(MIN_TIMED_SECONDS / max(est, 1e-5))))
        dt = timed_run(iters) / iters
        name = ":".join(str(x) for x in ratio)
        print(f"| {name} | {algo.value} | {B*H*W/dt/1e6:.0f} |", flush=True)
