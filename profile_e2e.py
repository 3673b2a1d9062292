"""End-to-end encode_core timing: ops DCT vs Pallas DCT paths (dev)."""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from jpeg_encoder_tpu import pipeline
from jpeg_encoder_tpu.config import DctAlgorithm, EncoderConfig

H, W, BATCH = 1088, 1920, 8
config = EncoderConfig(subsampling_ratio=(4,2,0))
geom = config.geometry(W, H)
cap = pipeline.default_capacity_bytes(geom, config.capacity_bytes_per_pixel)
key = jax.random.key(0)
base = jax.random.uniform(key, (BATCH, H//8, W//8, 3))
img = jax.image.resize(base, (BATCH, H, W, 3), "linear")
noise = jax.random.uniform(jax.random.key(100), (BATCH, H, W, 3)) * 0.1
images = ((img*0.9+noise)*255).astype(jnp.uint8)

def run(transposed_dct):
    @jax.jit
    def go(imgs):
        def one(rgb):
            out = pipeline.encode_core(rgb, geom, DctAlgorithm.REAL_DCT, cap,
                                       transposed_dct=transposed_dct)
            return out["payload"], out["total_bits"]
        return jax.vmap(one)(imgs)
    out = go(images); b = np.asarray(out[1])
    t0 = time.perf_counter()
    for _ in range(12): out = go(images)
    _ = np.asarray(out[1][0])
    dt = (time.perf_counter()-t0)/12
    print(f"transposed_dct={transposed_dct}: {dt*1e3:8.2f} ms/batch "
          f"({BATCH*H*W/dt/1e6:.1f} Mpix/s), bits={b[:2]}", file=sys.stderr)
    return b

b1 = run(False)  # XLA ordered chain
b2 = run(True)   # production transposed-layout Pallas kernel
print("bits equal:", (b1 == b2).all(), file=sys.stderr)
