"""Time the fused entropy kernel alone on precomputed inputs (dev)."""
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
from jpeg_encoder_tpu.kernels import entropy_pallas
from jpeg_encoder_tpu.ops import color, dct, entropy, sample

H, W, BATCH = 1088, 1920, 8
config = EncoderConfig(subsampling_ratio=(4, 2, 0))
geom = config.geometry(W, H)
cap = pipeline.default_capacity_bytes(geom, config.capacity_bytes_per_pixel)
key = jax.random.key(0)
base = jax.random.uniform(key, (BATCH, H // 8, W // 8, 3))
img = jax.image.resize(base, (BATCH, H, W, 3), "linear")
noise = jax.random.uniform(jax.random.key(100), (BATCH, H, W, 3)) * 0.1
images = ((img * 0.9 + noise) * 255).astype(jnp.uint8)


def front(im):
    y, cb, cr = color.rgb_to_ycbcr(im)
    y = sample.pad_plane(y, geom)
    cb = sample.subsample_plane(sample.pad_plane(cb, geom), geom)
    cr = sample.subsample_plane(sample.pad_plane(cr, geom), geom)
    y_z, cb_z, cr_z = dct.dct_quantize_planes(
        sample.blockify(y), sample.blockify(cb), sample.blockify(cr),
        DctAlgorithm.REAL_DCT, False, zigzag_out=True)
    return entropy.marshal_scan_inputs(
        y_z, cb_z, cr_z, geom, coeffs_zigzagged=True, want_diff=False
    )[0]


zs = jax.jit(jax.vmap(front))(images)
zs = jax.block_until_ready(zs)


@jax.jit
def k_only(zs):
    def one(z):
        _, bits = entropy_pallas.encode_entropy_fused(z, geom, cap)
        return bits
    return jnp.sum(jax.vmap(one)(zs))


out = k_only(zs)
_ = np.asarray(out)
iters = 100
t0 = time.perf_counter()
for _ in range(iters):
    out = k_only(zs)
_ = np.asarray(out)
dt = (time.perf_counter() - t0) / iters
label = sys.argv[1] if len(sys.argv) > 1 else "kernel"
print(f"{label:16s} {dt*1e3:7.2f} ms/batch")
