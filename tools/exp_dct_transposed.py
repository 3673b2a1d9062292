"""Experiment: (64, N)-transposed ordered DCT vs the (N, 64) chain (dev).

The ordered chain on (N, 64) half-fills every (8, 128) vreg. Transposed,
step inputs are full lane-rows broadcast over sublanes and the per-output
constants are per-sublane columns broadcast over lanes — both native
broadcasts, full vreg utilization. Per-lane arithmetic is unchanged, so
outputs must be bit-identical.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from jpeg_encoder_tpu import tables
from jpeg_encoder_tpu.ops import dct

_F32 = np.float32


def ordered_t(blocks_u8, quant, zigzag_out=True):
    basis = dct.dct_basis_f32()
    u_of = np.arange(64) // 8
    v_of = np.arange(64) % 8
    if zigzag_out:
        u_of = u_of[tables.ZIGZAG_ORDER]
        v_of = v_of[tables.ZIGZAG_ORDER]
    x_of = np.arange(64) // 8
    y_of = np.arange(64) % 8
    a_np = basis[u_of[:, None], x_of[None, :]]  # (uv, step)
    b_np = basis[v_of[:, None], y_of[None, :]]
    a_c = jnp.asarray(a_np)
    b_c = jnp.asarray(b_np)
    shifted = dct.level_shift(blocks_u8).astype(jnp.float32).reshape(-1, 64)
    st = shifted.T  # (64, N)
    acc = jnp.zeros_like(st)
    for k in range(64):
        acc = acc + (st[k : k + 1, :] * a_c[:, k : k + 1]) * b_c[:, k : k + 1]
    inv_sqrt2 = _F32(1.0) / _F32(np.sqrt(2.0))
    alpha = np.where(np.arange(8) == 0, inv_sqrt2, _F32(1.0)).astype(_F32)
    scale = ((_F32(0.25) * alpha[u_of]) * alpha[v_of]).astype(_F32)
    q = quant.reshape(64).astype(np.float32)
    if zigzag_out:
        q = q[tables.ZIGZAG_ORDER]
    coeffs = (jnp.asarray(scale)[:, None] * acc) / jnp.asarray(q)[:, None]
    return jnp.trunc(coeffs).astype(jnp.int16).T


N = 8 * (32640 + 2 * 8160)  # one 1080p 4:2:0 batch's worth of blocks
rng = np.random.default_rng(0)
blocks = jnp.asarray(rng.integers(0, 256, (N, 64), np.uint8))
qt = tables.Y_QUANT_TABLE

f_base = jax.jit(lambda b: dct.real_dct_quant_ordered(b, qt, zigzag_out=True))
f_t = jax.jit(lambda b: ordered_t(b, qt, zigzag_out=True))
f_mxu = jax.jit(lambda b: dct.real_dct_quant(b, qt, zigzag_out=True))


def timeit(name, fn, iters=12):
    out = fn(blocks)
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(blocks)
    _ = np.asarray(out[0, 0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:24s} {dt*1e3:8.2f} ms ({N*64/dt/1e9:.1f} Gpix-coeff/s)")
    return out


o1 = timeit("ordered (N,64)", f_base)
o2 = timeit("ordered transposed", f_t)
o3 = timeit("mxu matmul", f_mxu)
print("transposed bit-equal:", bool(jnp.all(o1 == o2)))
print("mxu equal fraction:", float(jnp.mean((o1 == o3).astype(jnp.float32))))
