"""On-chip stage-by-stage cost map of the fused 1080p pipeline (dev tool).

Times nested prefixes of the pipeline (each jitted separately, synced by
fetching a scalar — see memory/axon notes: block_until_ready lies here) and
prints the incremental cost of each stage, plus the fused entropy kernel
alone on precomputed inputs.

    python tools/profile_stages.py [4:2:0|4:2:2|4:4:4] [real-dct|bin-dct]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from jpeg_encoder_tpu import pipeline, tables
from jpeg_encoder_tpu.config import DctAlgorithm, EncoderConfig
from jpeg_encoder_tpu.config import parse_subsampling_ratio
from jpeg_encoder_tpu.kernels import entropy_pallas
from jpeg_encoder_tpu.ops import color, dct, entropy, sample

H, W, BATCH = 1088, 1920, 8
_args = [a for a in sys.argv[1:] if not a.startswith("-")]
RATIO = parse_subsampling_ratio(_args[0]) if _args else (4, 2, 0)
ALG = (
    DctAlgorithm.BIN_DCT
    if len(_args) > 1 and _args[1] == "bin-dct"
    else DctAlgorithm.REAL_DCT
)
config = EncoderConfig(subsampling_ratio=RATIO, dct_algorithm=ALG)
print(f"ratio {RATIO}, {ALG.value}", file=sys.stderr)
geom = config.geometry(W, H)
cap = pipeline.default_capacity_bytes(geom, config.capacity_bytes_per_pixel)
key = jax.random.key(0)
base = jax.random.uniform(key, (BATCH, H // 8, W // 8, 3))
img = jax.image.resize(base, (BATCH, H, W, 3), "linear")
noise = jax.random.uniform(jax.random.key(100), (BATCH, H, W, 3)) * 0.1
images = ((img * 0.9 + noise) * 255).astype(jnp.uint8)


def timeit(name, fn, *args, iters=60):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[-1]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[-1]).ravel()[0]
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt*1e3:8.2f} ms/batch")
    return dt


def front_planes(rgb):
    y, cb, cr = color.rgb_to_ycbcr(rgb)
    y = sample.pad_plane(y, geom)
    cb = sample.subsample_plane(sample.pad_plane(cb, geom), geom)
    cr = sample.subsample_plane(sample.pad_plane(cr, geom), geom)
    return y, cb, cr




def front_dct(rgb):
    y, cb, cr = front_planes(rgb)
    return dct.dct_quantize_planes(
        sample.blockify(y), sample.blockify(cb), sample.blockify(cr),
        ALG, False, zigzag_out=True)


def marshal(y_z, cb_z, cr_z):
    """Shared scan-order marshalling (ops/entropy.marshal_scan_inputs)."""
    return entropy.marshal_scan_inputs(
        y_z, cb_z, cr_z, geom, coeffs_zigzagged=True, want_diff=False
    )[0]


@jax.jit
def s1(rgb):
    y, cb, cr = jax.vmap(front_planes)(rgb)
    return jnp.sum(y) + jnp.sum(cb) + jnp.sum(cr)


@jax.jit
def s2(rgb):
    y_z, cb_z, cr_z = jax.vmap(front_dct)(rgb)
    return (jnp.sum(y_z.astype(jnp.int32)) + jnp.sum(cb_z.astype(jnp.int32))
            + jnp.sum(cr_z.astype(jnp.int32)))


@jax.jit
def s3(rgb):
    y_z, cb_z, cr_z = jax.vmap(front_dct)(rgb)
    z = jax.vmap(marshal)(y_z, cb_z, cr_z)
    return jnp.sum(z.astype(jnp.int32))


@jax.jit
def s4(rgb):
    def one(im):
        out = pipeline.encode_core(
            im, geom, ALG, cap, with_coeffs=False)
        return out["total_bits"]
    return jnp.sum(jax.vmap(one)(rgb))


# Kernel alone on precomputed inputs.
y_z, cb_z, cr_z = jax.jit(jax.vmap(front_dct))(images)
zs = jax.jit(jax.vmap(marshal))(y_z, cb_z, cr_z)
zs = jax.block_until_ready(zs)


@jax.jit
def k_only(zs):
    def one(z):
        _, bits = entropy_pallas.encode_entropy_fused(z, geom, cap)
        return bits
    return jnp.sum(jax.vmap(one)(zs))


t1 = timeit("color+pad+subsample", s1, images)
t2 = timeit("+blockify+DCT+quant", s2, images)
t3 = timeit("+marshal (scan order+dcdiff)", s3, images)
t4 = timeit("full fused pipeline", s4, images)
tk = timeit("fused kernel alone", k_only, zs)
print(f"\nincrements: dct={1e3*(t2-t1):.2f} marshal={1e3*(t3-t2):.2f} "
      f"kernel(in situ)={1e3*(t4-t3):.2f} kernel(alone)={1e3*tk:.2f}")
print(f"Mpix/s full: {BATCH*H*W/t4/1e6:.1f}")
