"""Experiment: scan-order marshal variants (dev).

(a) current 5-D transpose + concat on i16
(b) row gather via scan_layout.entry_row
(c) bitcast i16->i32 pairs, transpose, bitcast back
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
from jpeg_encoder_tpu.ops import entropy

H, W, B = 1088, 1920, 8
geom = EncoderConfig(subsampling_ratio=(4, 2, 0)).geometry(W, H)
rng = np.random.default_rng(0)
ny, nc = geom.num_luma_blocks, geom.num_chroma_blocks
y = jnp.asarray(rng.integers(-1000, 1000, (B, ny, 64), np.int16))
cb = jnp.asarray(rng.integers(-1000, 1000, (B, nc, 64), np.int16))
cr = jnp.asarray(rng.integers(-1000, 1000, (B, nc, 64), np.int16))

h, v = geom.h_factor, geom.v_factor
hv = h * v
m = geom.num_mcus
by, bx = geom.luma_blocks_y, geom.luma_blocks_x
bpm = geom.blocks_per_mcu


def marshal_a(yc, cbc, crc):
    sup = (yc.reshape(by // v, v, bx // h, h, 64)
           .transpose(0, 2, 1, 3, 4).reshape(-1, hv, 64))[:m]
    rows = jnp.concatenate(
        [sup, cbc[:, None, :], crc[:, None, :]], axis=1).reshape(m * bpm, 64)
    return rows


layout = entropy.scan_layout(geom)
entry_row = jnp.asarray(layout.entry_row)


def marshal_b(yc, cbc, crc):
    allc = jnp.concatenate([yc, cbc, crc], axis=0)
    return allc[entry_row]


def marshal_c(yc, cbc, crc):
    y32 = jax.lax.bitcast_convert_type(yc.reshape(ny, 32, 2), jnp.int32)
    sup = (y32.reshape(by // v, v, bx // h, h, 32)
           .transpose(0, 2, 1, 3, 4).reshape(-1, hv, 32))[:m]
    c32 = jax.lax.bitcast_convert_type(cbc.reshape(nc, 32, 2), jnp.int32)
    r32 = jax.lax.bitcast_convert_type(crc.reshape(nc, 32, 2), jnp.int32)
    rows32 = jnp.concatenate(
        [sup, c32[:, None, :], r32[:, None, :]], axis=1).reshape(m * bpm, 32)
    return jax.lax.bitcast_convert_type(
        rows32[..., None], jnp.int16).reshape(m * bpm, 64)


def timeit(name, fn, iters=100):
    f = jax.jit(jax.vmap(fn))
    out = f(y, cb, cr)
    _ = np.asarray(out[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(y, cb, cr)
    _ = np.asarray(out[0, 0, 0])
    print(f"{name:28s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms/batch")
    return out


oa = timeit("5-D transpose (i16)", marshal_a)
ob = timeit("row gather", marshal_b)
oc = timeit("bitcast-i32 transpose", marshal_c)
print("b equal:", bool(jnp.all(oa == ob)), " c equal:", bool(jnp.all(oa == oc)))
