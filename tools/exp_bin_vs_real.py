"""Kernel-only A/B at 4:4:4: transposed binDCT vs transposed RealDCT chain.

pack_t + DCT kernel + pallas row consumer (forces materialization), batch
8 x 1080p, bench-matrix content. Isolates whether the bin-dct cell's gap
vs real-dct lives in the transform kernel or downstream (entropy/density).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg_encoder_tpu.kernels import dct_pallas

H, W, B = 1088, 1920, 8
key = jax.random.key(0)
base = jax.random.uniform(key, (B, H // 8, W // 8, 3))
img = jax.image.resize(base, (B, H, W, 3), "linear")
noise = jax.random.uniform(jax.random.key(100), (B, H, W, 3)) * 0.1
images = ((img * 0.9 + noise) * 255).astype(jnp.uint8)


def _consume_kernel(x_ref, out_ref):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    r = x_ref[:].astype(jnp.int32)
    while r.shape[1] > 128:
        hlf = r.shape[1] // 2
        r = r[:, :hlf] | r[:, hlf:]
    while r.shape[0] > out_ref.shape[0]:
        hlf = r.shape[0] // 2
        r = r[:hlf] | r[hlf:]
    out_ref[:] = out_ref[:] | r


def consume_cols(x):  # (64, N) i16 consumer
    return pl.pallas_call(
        _consume_kernel,
        grid=(x.shape[1] // 1024,),
        in_specs=[pl.BlockSpec((64, 1024), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
    )(x)


def variant(kind, im):
    y = im[:, :, 0]
    cb = im[:, :, 1]
    cr = im[:, :, 2]
    if kind == "pack":
        xp, *_ = dct_pallas._plane_pack_t(y, cb, cr, dct_pallas.T_TILE)
        return consume16(xp)
    fns = {
        "real": dct_pallas.real_dct_quant_planes_zigzag_pallas_t,
        "bin": dct_pallas.bin_dct_quant_planes_zigzag_pallas_t,
    }
    y_z, cb_z, cr_z = fns[kind](y, cb, cr)
    allz = jnp.concatenate([y_z, cb_z, cr_z], axis=0)
    return consume_rows(allz)


def consume16(x):  # (16, N) i32 consumer
    return pl.pallas_call(
        _consume_kernel,
        grid=(x.shape[1] // 1024,),
        in_specs=[pl.BlockSpec((16, 1024), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
    )(x)


def consume_rows(x):  # (N, 64) i16 consumer
    n = x.shape[0]
    t = 1024
    pad = -(-n // t) * t - n
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return pl.pallas_call(
        _consume_kernel,
        grid=(x.shape[0] // t,),
        in_specs=[pl.BlockSpec((t, 64), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 64), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 64), jnp.int32),
    )(x)


def timeit(name, kind):
    @jax.jit
    def go(ims):
        return jax.vmap(lambda im: variant(kind, im))(ims)

    out = go(images)
    _ = np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    iters = 200
    for _ in range(iters):
        out = go(images)
    _ = np.asarray(out).ravel()[0]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:24s} {dt:7.2f} ms/batch")


timeit("pack only", "pack")
timeit("pack+real chain (+.T)", "real")
timeit("pack+bin lifting (+.T)", "bin")
