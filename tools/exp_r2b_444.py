"""Experiment: 4:4:4 lever sweep (dev).

A/Bs the knobs that might lift the 4:4:4 cells toward the 1200 Mpix/s bar:
  default        transposed Pallas DCT + fused entropy (production)
  fast           non-exact matmul DCT (upper bound for any exact DCT path)

Also times the front (color/subsample/blockify) and DCT stages alone.
Requires a TPU backend (the Pallas stage timers run compiled kernels).

    python tools/exp_r2b_444.py [ratio]
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
from jpeg_encoder_tpu.config import parse_subsampling_ratio
from jpeg_encoder_tpu.kernels import dct_pallas
from jpeg_encoder_tpu.ops import color, dct, sample

H, W, B = 1088, 1920, 8
RATIO = parse_subsampling_ratio(sys.argv[1]) if len(sys.argv) > 1 else (4, 4, 4)
config = EncoderConfig(subsampling_ratio=RATIO)
geom = config.geometry(W, H)
cap = pipeline.default_capacity_bytes(geom, config.capacity_bytes_per_pixel)
print(f"ratio {RATIO}, cap={cap}", file=sys.stderr)

key = jax.random.key(0)
base = jax.random.uniform(key, (B, H // 8, W // 8, 3))
img = jax.image.resize(base, (B, H, W, 3), "linear")
noise = jax.random.uniform(jax.random.key(100), (B, H, W, 3)) * 0.1
images = ((img * 0.9 + noise) * 255).astype(jnp.uint8)


def timeit(name, fn, *args, iters=60):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[-1]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[-1]).ravel()[0]
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:24s} {dt*1e3:8.2f} ms/batch  {B*H*W/dt/1e6:7.1f} Mpix/s",
          flush=True)
    return dt


def e2e(name, **kw):
    @jax.jit
    def go(imgs):
        def one(rgb):
            out = pipeline.encode_core(
                rgb, geom, DctAlgorithm.REAL_DCT, cap, with_coeffs=False, **kw)
            return out["total_bits"]
        return jnp.sum(jax.vmap(one)(imgs))

    return timeit(name, go, images)


def front(rgb):
    y, cb, cr = color.rgb_to_ycbcr(rgb)
    y = sample.pad_plane(y, geom)
    cb = sample.subsample_plane(sample.pad_plane(cb, geom), geom)
    cr = sample.subsample_plane(sample.pad_plane(cr, geom), geom)
    return y, cb, cr


assert jax.default_backend() == "tpu", "stage timers need a TPU backend"


@jax.jit
def dct_t(imgs):
    def one(rgb):
        yb, cbb, crb = front(rgb)
        y_z, cb_z, cr_z = dct_pallas.real_dct_quant_planes_zigzag_pallas_t(
            yb, cbb, crb)
        return (jnp.sum(y_z.astype(jnp.int32)) + jnp.sum(cb_z.astype(jnp.int32))
                + jnp.sum(cr_z.astype(jnp.int32)))
    return jnp.sum(jax.vmap(one)(imgs))


@jax.jit
def front_only(imgs):
    def one(rgb):
        yb, cbb, crb = front(rgb)
        return (jnp.sum(yb.astype(jnp.int32)) + jnp.sum(cbb.astype(jnp.int32))
                + jnp.sum(crb.astype(jnp.int32)))
    return jnp.sum(jax.vmap(one)(imgs))


timeit("front (planes) only", front_only, images)
timeit("dct transposed-pallas", dct_t, images)
e2e("e2e default")
e2e("e2e fast (inexact)", transposed_dct=False, fast_dct=True)
