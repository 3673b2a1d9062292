"""Micro-profile of front-end pieces + layout-tax probes (dev)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from jpeg_encoder_tpu import tables
from jpeg_encoder_tpu.config import EncoderConfig
from jpeg_encoder_tpu.ops import color, dct, sample

H, W, B = 1088, 1920, 8
geom = EncoderConfig(subsampling_ratio=(4, 2, 0)).geometry(W, H)
rng = np.random.default_rng(0)
rgb = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), np.uint8))
N = 8 * (32640 + 2 * 8160)
blocks = jnp.asarray(rng.integers(0, 256, (N, 64), np.uint8))


def timeit(name, fn, *args, iters=100):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[-1]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[-1]).ravel()[0]
    print(f"{name:32s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms")


@jax.jit
def f_color(x):
    y, cb, cr = jax.vmap(color.rgb_to_ycbcr)(x)
    return jnp.sum(y) + jnp.sum(cb) + jnp.sum(cr)


@jax.jit
def f_sub(x):
    def one(im):
        y, cb, cr = color.rgb_to_ycbcr(im)
        cb = sample.subsample_plane(sample.pad_plane(cb, geom), geom)
        cr = sample.subsample_plane(sample.pad_plane(cr, geom), geom)
        return y, cb, cr
    y, cb, cr = jax.vmap(one)(x)
    return jnp.sum(y) + jnp.sum(cb) + jnp.sum(cr)


@jax.jit
def f_blockify(x):
    def one(im):
        y, cb, cr = color.rgb_to_ycbcr(im)
        cb = sample.subsample_plane(sample.pad_plane(cb, geom), geom)
        cr = sample.subsample_plane(sample.pad_plane(cr, geom), geom)
        return (sample.blockify(sample.pad_plane(y, geom)),
                sample.blockify(cb), sample.blockify(cr))
    y, cb, cr = jax.vmap(one)(x)
    return (jnp.sum(y.astype(jnp.int32)) + jnp.sum(cb.astype(jnp.int32))
            + jnp.sum(cr.astype(jnp.int32)))


@jax.jit
def f_roundtrip64(b):
    x = b.astype(jnp.int16) - 128
    return jnp.sum((x + x).astype(jnp.int32))


@jax.jit
def f_roundtrip128(b):
    x = b.reshape(-1, 128).astype(jnp.int16) - 128
    return jnp.sum((x + x).astype(jnp.int32))


@jax.jit
def f_f32chain64(b):
    x = (b.astype(jnp.int16) - 128).astype(jnp.float32)
    acc = jnp.zeros_like(x)
    for k in range(64):
        acc = acc + x * np.float32(1.0 + k)
    return jnp.sum(acc)


@jax.jit
def f_f32chain128(b):
    x = (b.reshape(-1, 128).astype(jnp.int16) - 128).astype(jnp.float32)
    acc = jnp.zeros_like(x)
    for k in range(64):
        acc = acc + x * np.float32(1.0 + k)
    return jnp.sum(acc)


@jax.jit
def f_mxu_blockdiag(b):
    k64 = dct.dct_kron_matrix()[:, tables.ZIGZAG_ORDER]
    k128 = np.zeros((128, 128), np.float32)
    k128[:64, :64] = k64
    k128[64:, 64:] = k64
    q = tables.Y_QUANT_TABLE.reshape(64)[tables.ZIGZAG_ORDER].astype(np.float32)
    q2 = np.tile(q, 2)
    x = (b.reshape(-1, 128).astype(jnp.int16) - 128).astype(jnp.float32)
    c = jnp.dot(x, jnp.asarray(k128), preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(jnp.trunc(c / jnp.asarray(q2)).astype(jnp.int16).astype(
        jnp.int32))


timeit("color only", f_color, rgb)
timeit("color+pad+subsample", f_sub, rgb)
timeit("+blockify", f_blockify, rgb)
timeit("u8->i16 roundtrip (N,64)", f_roundtrip64, blocks)
timeit("u8->i16 roundtrip (N/2,128)", f_roundtrip128, blocks)
timeit("64-step f32 chain (N,64)", f_f32chain64, blocks)
timeit("64-step f32 chain (N/2,128)", f_f32chain128, blocks)
timeit("mxu blockdiag (N/2,128)", f_mxu_blockdiag, blocks)
