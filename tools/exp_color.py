"""Experiment: where does the color+pad+subsample 1.27 ms/batch go? (dev)

Times isolated pieces of the pipeline front on chip: the strided channel
extraction, the f32 convert chain, pad, subsample — then candidate
bitcast-deinterleave formulations of the channel split.

    python tools/exp_color.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from jpeg_encoder_tpu.config import EncoderConfig
from jpeg_encoder_tpu.ops import color, sample

H, W, B = 1088, 1920, 8
config = EncoderConfig(subsampling_ratio=(4, 2, 0))
geom = config.geometry(W, H)

rng = np.random.default_rng(0)
imgs = jnp.asarray(
    rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
)
_F = jnp.float32


def timeit(fn, tag, iters=80):
    # FULL reduction: a sliced probe lets XLA dead-code the actual work.
    jfn = jax.jit(lambda x: jnp.sum(fn(x).astype(jnp.int32)))
    np.asarray(jfn(imgs))  # compile + warm
    np.asarray(jfn(imgs))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jfn(imgs)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:34s} {dt*1e3:7.2f} ms/batch")
    return dt


def extract_only(x):
    return (x[..., 0].astype(_F) + x[..., 1].astype(_F)
            + x[..., 2].astype(_F))


def convert_full(x):
    y, cb, cr = jax.vmap(color.rgb_to_ycbcr)(x)
    return y.astype(_F) + cb.astype(_F) + cr.astype(_F)


def convert_pad_sub(x):
    def one(rgb):
        y, cb, cr = color.rgb_to_ycbcr(rgb)
        y = sample.pad_plane(y, geom)
        cb = sample.subsample_plane(sample.pad_plane(cb, geom), geom)
        cr = sample.subsample_plane(sample.pad_plane(cr, geom), geom)
        return y, cb, cr
    y, cb, cr = jax.vmap(one)(x)
    return y.astype(_F)


def bitcast_deinterleave(x):
    """(B,H,W,3) u8 -> channel sums via i32 words (4 px / 3 words)."""
    xb = x.reshape(B, H, W * 3 // 4, 4)
    w = jax.lax.bitcast_convert_type(xb, jnp.int32)  # (B,H,W*3/4)
    w3 = w.reshape(B, H, W // 4, 3)
    w0, w1, w2 = w3[..., 0], w3[..., 1], w3[..., 2]
    def byte(v, k):
        return (v >> (8 * k)) & 0xFF
    # pixels 4j..4j+3 of each row
    r = jnp.stack([byte(w0, 0), byte(w0, 3), byte(w1, 2), byte(w2, 1)], -1)
    g = jnp.stack([byte(w0, 1), byte(w1, 0), byte(w1, 3), byte(w2, 2)], -1)
    b = jnp.stack([byte(w0, 2), byte(w1, 1), byte(w2, 0), byte(w2, 3)], -1)
    return (r.reshape(B, H, W).astype(_F)
            + g.reshape(B, H, W).astype(_F)
            + b.reshape(B, H, W).astype(_F))


def main():
    timeit(extract_only, "strided channel extract + adds")
    timeit(convert_full, "full color convert")
    timeit(convert_pad_sub, "color + pad + subsample")
    timeit(bitcast_deinterleave, "bitcast deinterleave + adds")


if __name__ == "__main__":
    main()
