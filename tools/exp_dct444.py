"""Decompose the 4:4:4 DCT-side cost: pack_t / kernel / output-.T / marshal.

Nested jitted prefixes (enqueue-K + scalar fetch), batch 8 x 1080p. The
question: how much of profile_stages' "+blockify+DCT+quant" increment is
the transform chain itself vs the layout ops around it (packed-input
build, the (64, N) -> (N, 64) output transpose, the scan marshal).

    python tools/exp_dct444.py [4:4:4|4:2:0|4:2:2]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import functools

import jax.numpy as jnp
import numpy as np

from jpeg_encoder_tpu import pipeline
from jpeg_encoder_tpu.config import DctAlgorithm, EncoderConfig
from jpeg_encoder_tpu.config import parse_subsampling_ratio
from jpeg_encoder_tpu.kernels import dct_pallas
from jpeg_encoder_tpu.ops import color, entropy, sample

H, W, B = 1088, 1920, 8
RATIO = parse_subsampling_ratio(sys.argv[1]) if len(sys.argv) > 1 else (4, 4, 4)
config = EncoderConfig(subsampling_ratio=RATIO)
geom = config.geometry(W, H)
rng = np.random.default_rng(0)
images = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), np.uint8))


def planes(im):
    y, cb, cr = color.rgb_to_ycbcr(im)
    y = sample.pad_plane(y, geom)
    cb = sample.subsample_plane(sample.pad_plane(cb, geom), geom)
    cr = sample.subsample_plane(sample.pad_plane(cr, geom), geom)
    return y, cb, cr


def stage_front(im):
    return planes(im)


def stage_pack(im):
    y, cb, cr = planes(im)
    xp, ny, nc, n = dct_pallas._plane_pack_t(y, cb, cr, dct_pallas.T_TILE)
    return (xp,)


def _kernel_t(im):
    """Run the transposed-chain kernel but return the (64, N) output."""
    y, cb, cr = planes(im)
    xp, ny, nc, n = dct_pallas._plane_pack_t(y, cb, cr, dct_pallas.T_TILE)
    padded_n = xp.shape[1]
    a, b, scale, qy = (
        np.asarray(c) for c in dct_pallas._realdct_constants("y", None)
    )
    qc = np.asarray(dct_pallas._realdct_constants("c", None)[3])
    at = jnp.asarray(a.T.copy())
    bt = jnp.asarray(b.T.copy())
    sq = np.zeros((64, 8), np.float32)
    sq[:, 0] = scale.reshape(64)
    sq[:, 1] = qy.reshape(64)
    sq[:, 2] = qc.reshape(64)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out_t = pl.pallas_call(
        functools.partial(
            dct_pallas._realdct_t_planes_rows_kernel,
            tile=dct_pallas.T_TILE, ny=ny,
        ),
        grid=(padded_n // dct_pallas.T_TILE,),
        in_specs=[
            pl.BlockSpec((16, dct_pallas.T_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (dct_pallas.T_TILE, 64), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((padded_n, 64), jnp.int16),
    )(xp, at, bt, jnp.asarray(sq))
    return out_t, ny, nc, n


def stage_kernel(im):
    out_t, ny, nc, n = _kernel_t(im)
    return (out_t,)


def stage_transpose(im):
    # rows kernel already emits (N, 64): the "transpose" stage is now a
    # split only (kept so the stage list and history stay comparable).
    out, ny, nc, n = _kernel_t(im)
    return out[:ny], out[ny:ny + nc], out[ny + nc:n]


def stage_marshal(im):
    y_z, cb_z, cr_z = stage_transpose(im)
    z, _ = entropy.marshal_scan_inputs(
        y_z, cb_z, cr_z, geom, coeffs_zigzagged=True, want_diff=False
    )
    return (z,)


def run(name, fn, prev):
    f = jax.jit(lambda x: jax.tree.map(
        lambda a: jnp.sum(a.astype(jnp.int32)), jax.vmap(fn)(x)))
    out = f(images)
    _ = np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    iters = 200
    for _ in range(iters):
        out = f(images)
    _ = np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:12s} {dt:7.2f} ms/batch  (+{dt - prev:6.2f})")
    return dt


prev = 0.0
for name, fn in [
    ("front", stage_front),
    ("pack_t", stage_pack),
    ("kernel", stage_kernel),
    ("transpose", stage_transpose),
    ("marshal", stage_marshal),
]:
    prev = run(name, fn, prev)
