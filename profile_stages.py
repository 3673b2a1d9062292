"""Stage-by-stage timing of the encode pipeline on the real chip (dev tool)."""
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

H, W, BATCH = 1088, 1920, 4
config = EncoderConfig(subsampling_ratio=(4, 2, 0))
geom = config.geometry(W, H)

key = jax.random.key(0)
base = jax.random.uniform(key, (BATCH, H // 8, W // 8, 3))
img = jax.image.resize(base, (BATCH, H, W, 3), "linear")
noise = jax.random.uniform(jax.random.key(1), (BATCH, H, W, 3)) * 0.1
images = jax.block_until_ready(((img * 0.9 + noise) * 255).astype(jnp.uint8))


def timeit(name, fn, *args, iters=8):
    fn = jax.jit(fn)
    out = jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.2f} ms/batch", file=sys.stderr)
    return out


def fused(cap):
    def go(imgs):
        def one(rgb):
            out = pipeline.encode_core(rgb, geom, DctAlgorithm.REAL_DCT, cap)
            return out["payload"], out["total_bits"]
        return jax.vmap(one)(imgs)
    return go


def front_and_dct(imgs):
    def one(rgb):
        y, cb, cr = color.rgb_to_ycbcr(rgb)
        y = sample.pad_plane(y, geom)
        cb = sample.subsample_plane(sample.pad_plane(cb, geom), geom)
        cr = sample.subsample_plane(sample.pad_plane(cr, geom), geom)
        f = lambda b, q: dct.dct_quantize(b, q, DctAlgorithm.REAL_DCT, False)
        return (f(sample.blockify(y), tables.Y_QUANT_TABLE),
                f(sample.blockify(cb), tables.C_QUANT_TABLE),
                f(sample.blockify(cr), tables.C_QUANT_TABLE))
    return jax.vmap(one)(imgs)


def symbolize_only(yq, cbq, crq):
    """encode_scan minus pack_entries: returns slot bits/lens reductions."""
    import jpeg_encoder_tpu.ops.entropy as E
    real_pack = E.pack_entries
    try:
        E.pack_entries = lambda sb, sl, cap: (
            sb.sum(dtype=jnp.uint32), sl.sum(dtype=jnp.int32))
        def one(a, b, c):
            return E.encode_scan(a, b, c, geom, 1024)
        return jax.vmap(one)(yq, cbq, crq)
    finally:
        E.pack_entries = real_pack


yq, cbq, crq = timeit("front+dct", front_and_dct, images)
timeit("symbolize only (no pack)", symbolize_only, yq, cbq, crq)

def pack_only(cap):
    def go(yq, cbq, crq):
        def one(a, b, c):
            return entropy.encode_scan(a, b, c, geom, cap)
        return jax.vmap(one)(yq, cbq, crq)
    return go

for cap in (1 << 19, 1 << 21):
    timeit(f"scan+pack cap={cap>>10}KiB", pack_only(cap), yq, cbq, crq)
    timeit(f"FUSED encode cap={cap>>10}KiB", fused(cap), images)

print("done", file=sys.stderr)
