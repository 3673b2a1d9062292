"""Honest per-stage timing via enqueue-K + scalar fetch (dev tool).

block_until_ready was observed returning early on the tunneled platform for
tuple outputs; wrapping every stage to return one scalar (sum of outputs)
and fetching it is the only trustworthy sync.
"""
import os, sys, time
import jax
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from jpeg_encoder_tpu import pipeline, tables
from jpeg_encoder_tpu.config import DctAlgorithm, EncoderConfig
from jpeg_encoder_tpu.ops import color, dct, entropy, sample

H, W, BATCH = 1088, 1920, 8
config = EncoderConfig(subsampling_ratio=(4, 2, 0))
geom = config.geometry(W, H)
cap = pipeline.default_capacity_bytes(geom, 1.0)


def log(m): print(m, file=sys.stderr, flush=True)


def make_images():
    key = jax.random.key(0)
    base = jax.random.uniform(key, (BATCH, H // 8, W // 8, 3))
    img = jax.image.resize(base, (BATCH, H, W, 3), "linear")
    noise = jax.random.uniform(jax.random.key(100), (BATCH, H, W, 3)) * 0.1
    return ((img * 0.9 + noise) * 255).astype(jnp.uint8)


images = jax.jit(make_images)()
_ = np.asarray(images[0, 0, 0, 0])  # materialize


def timed(name, fn, iters=6):
    jfn = jax.jit(fn)
    _ = np.asarray(jfn(images))  # compile + run once
    t0 = time.perf_counter()
    for _i in range(iters):
        out = jfn(images)
    v = np.asarray(out)  # scalar fetch: queue drained
    dt = (time.perf_counter() - t0) / iters
    log(f"{name:34s} {dt*1e3:9.2f} ms/batch  ({BATCH*H*W/dt/1e6:7.1f} Mpix/s)")
    return dt


def front_fn(imgs):
    def one(rgb):
        y, cb, cr = color.rgb_to_ycbcr(rgb)
        y = sample.pad_plane(y, geom)
        cb = sample.subsample_plane(sample.pad_plane(cb, geom), geom)
        cr = sample.subsample_plane(sample.pad_plane(cr, geom), geom)
        return (jnp.sum(sample.blockify(y).astype(jnp.int32))
                + jnp.sum(sample.blockify(cb).astype(jnp.int32))
                + jnp.sum(sample.blockify(cr).astype(jnp.int32)))
    return jnp.sum(jax.vmap(one)(imgs))


def make_blocks(imgs):
    def one(rgb):
        y, cb, cr = color.rgb_to_ycbcr(rgb)
        y = sample.pad_plane(y, geom)
        cb = sample.subsample_plane(sample.pad_plane(cb, geom), geom)
        cr = sample.subsample_plane(sample.pad_plane(cr, geom), geom)
        return (sample.blockify(y), sample.blockify(cb), sample.blockify(cr))
    return jax.vmap(one)(imgs)


def dct_fn(imgs, fast):
    yb, cbb, crb = make_blocks(imgs)
    f = lambda b, q: dct.dct_quantize(b, q, DctAlgorithm.REAL_DCT, fast)
    yq = jax.vmap(lambda b: f(b, tables.Y_QUANT_TABLE))(yb)
    cbq = jax.vmap(lambda b: f(b, tables.C_QUANT_TABLE))(cbb)
    crq = jax.vmap(lambda b: f(b, tables.C_QUANT_TABLE))(crb)
    return yq, cbq, crq


def upto_dct(imgs):
    yq, cbq, crq = dct_fn(imgs, False)
    return (jnp.sum(yq.astype(jnp.int32)) + jnp.sum(cbq.astype(jnp.int32))
            + jnp.sum(crq.astype(jnp.int32)))


def upto_dct_fast(imgs):
    yq, cbq, crq = dct_fn(imgs, True)
    return (jnp.sum(yq.astype(jnp.int32)) + jnp.sum(cbq.astype(jnp.int32))
            + jnp.sum(crq.astype(jnp.int32)))


def upto_symbols(imgs):
    yq, cbq, crq = dct_fn(imgs, False)
    real_pack = entropy.pack_entries
    try:
        entropy.pack_entries = lambda sb, sl, c: (
            jnp.sum(sb), jnp.sum(sl))
        def one(a, b, c):
            return entropy.encode_scan(a, b, c, geom, 1024)
        sb, sl = jax.vmap(one)(yq, cbq, crq)
    finally:
        entropy.pack_entries = real_pack
    return jnp.sum(sb).astype(jnp.int32) + jnp.sum(sl)


def full(imgs):
    def one(rgb):
        out = pipeline.encode_core(rgb, geom, DctAlgorithm.REAL_DCT, cap)
        return out["payload"], out["total_bits"]
    p, b = jax.vmap(one)(imgs)
    return jnp.sum(p.astype(jnp.int32)) + jnp.sum(b)


timed("front (color+sub+blockify)", front_fn)
timed("..+ dct exact", upto_dct)
timed("..+ dct fast", upto_dct_fast)
timed("..+ symbolize (no pack)", upto_symbols)
timed("FULL (incl. pack)", full)
log("done")
