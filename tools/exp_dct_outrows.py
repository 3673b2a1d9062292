"""A/B: transposed-chain DCT kernel emitting (64, N) columns (production,
XLA .T afterwards) vs a variant that transposes in-kernel and writes
(N, 64) rows directly — does Mosaic's in-VMEM (64, T) i16 transpose beat
the XLA relayout + the extra HBM round-trip?

Both variants' outputs are consumed by a pallas reduction over the (N, 64)
row layout (the entropy kernel's input form), so the transpose cannot be
elided either way.

    python tools/exp_dct_outrows.py
"""
import functools
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
from jpeg_encoder_tpu.kernels.dct_pallas import (
    T_TILE, _plane_pack_t, _realdct_constants, _realdct_t_planes_rows_kernel,
    _unpack_pixel_rows,
)

H, W, B = 1088, 1920, 8
rng = np.random.default_rng(0)
planes = jnp.asarray(rng.integers(0, 256, (B, 3, H, W), np.uint8))


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


def consume_rows(x):  # (N, 64) i16 consumer, entropy-kernel-like tiling
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


def _consts():
    a, b, scale, qy = (np.asarray(c) for c in _realdct_constants("y", None))
    qc = np.asarray(_realdct_constants("c", None)[3])
    at = jnp.asarray(a.T.copy())
    bt = jnp.asarray(b.T.copy())
    sq = np.zeros((64, 8), np.float32)
    sq[:, 0] = scale.reshape(64)
    sq[:, 1] = qy.reshape(64)
    sq[:, 2] = qc.reshape(64)
    return at, bt, jnp.asarray(sq)


def _chain(x_ref, at_ref, bt_ref, sq_ref, *, tile, ny):
    pid = pl.program_id(0)
    rows = _unpack_pixel_rows(x_ref[:])
    a_cols = [at_ref[:, k:k + 1] for k in range(64)]
    b_cols = [bt_ref[:, k:k + 1] for k in range(64)]
    acc = jnp.zeros((64, tile), jnp.float32)
    for k in range(64):
        xk = rows[k].astype(jnp.float32) - 128.0
        acc = acc + (xk * a_cols[k]) * b_cols[k]
    s_col = sq_ref[:, 0:1]
    is_luma = (
        pid * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    ) < ny
    q = jnp.where(is_luma, sq_ref[:, 1:2], sq_ref[:, 2:3])
    return jnp.trunc((s_col * acc) / q).astype(jnp.int16)


def _kernel_cols(x_ref, at_ref, bt_ref, sq_ref, out_ref, *, tile, ny):
    out_ref[:] = _chain(x_ref, at_ref, bt_ref, sq_ref, tile=tile, ny=ny)


def _kernel_rows(x_ref, at_ref, bt_ref, sq_ref, out_ref, *, tile, ny):
    out_ref[:] = _chain(
        x_ref, at_ref, bt_ref, sq_ref, tile=tile, ny=ny
    ).T


def run_variant(rows_out: bool, img3):
    y, cb, cr = img3[0], img3[1], img3[2]
    xp, ny, nc, n = _plane_pack_t(y, cb, cr, T_TILE)
    padded_n = xp.shape[1]
    at, bt, sq = _consts()
    in_specs = [
        pl.BlockSpec((16, T_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((64, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if rows_out:
        out = pl.pallas_call(
            functools.partial(_kernel_rows, tile=T_TILE, ny=ny),
            grid=(padded_n // T_TILE,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((T_TILE, 64), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((padded_n, 64), jnp.int16),
        )(xp, at, bt, sq)
    else:
        out_t = pl.pallas_call(
            functools.partial(_kernel_cols, tile=T_TILE, ny=ny),
            grid=(padded_n // T_TILE,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((64, T_TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((64, padded_n), jnp.int16),
        )(xp, at, bt, sq)
        out = out_t.T
    return consume_rows(out)


def timeit(name, rows_out):
    @jax.jit
    def go(ps):
        return jax.vmap(lambda img3: run_variant(rows_out, img3))(ps)

    out = go(planes)
    _ = np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    iters = 200
    for _ in range(iters):
        out = go(planes)
    _ = np.asarray(out).ravel()[0]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s} {dt:7.2f} ms/batch")


# correctness: rows variant output == cols variant .T
a = np.asarray(jax.jit(lambda p: run_variant(False, p))(planes[0]))
b = np.asarray(jax.jit(lambda p: run_variant(True, p))(planes[0]))
assert np.array_equal(a, b), "consumer mismatch"
print("variants agree")

timeit("cols + XLA .T (production)", False)
timeit("rows (in-kernel transpose)", True)
