"""Experiment: ordered DCT fed by strided plane slices vs blockify (dev).

blockify's (0,2,1,3) u8 transpose costs ~1.4 ms/batch. The 64-step chain
can instead read step k's pixels as plane[x_k::8, y_k::8] — a strided
slice that XLA can fuse into the chain, making the block transpose
implicit. Outputs must be bit-identical.
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
from jpeg_encoder_tpu.ops import dct, sample

_F32 = np.float32
H, W, B = 1088, 1920, 8
rng = np.random.default_rng(0)
planes = jnp.asarray(rng.integers(0, 256, (B, H, W), np.uint8))
qt = tables.Y_QUANT_TABLE


def consts(zigzag_out=True):
    basis = dct.dct_basis_f32()
    u_of = np.arange(64) // 8
    v_of = np.arange(64) % 8
    if zigzag_out:
        u_of = u_of[tables.ZIGZAG_ORDER]
        v_of = v_of[tables.ZIGZAG_ORDER]
    x_of = np.arange(64) // 8
    y_of = np.arange(64) % 8
    a_steps = basis[u_of[None, :], x_of[:, None]]
    b_steps = basis[v_of[None, :], y_of[:, None]]
    inv_sqrt2 = _F32(1.0) / _F32(np.sqrt(2.0))
    alpha = np.where(np.arange(8) == 0, inv_sqrt2, _F32(1.0)).astype(_F32)
    scale = ((_F32(0.25) * alpha[u_of]) * alpha[v_of]).astype(_F32)
    q = qt.reshape(64).astype(np.float32)
    if zigzag_out:
        q = q[tables.ZIGZAG_ORDER]
    return a_steps, b_steps, scale, q, x_of, y_of


def dct_strided(plane):
    a_steps, b_steps, scale, q, x_of, y_of = consts()
    a_c = jnp.asarray(a_steps)
    b_c = jnp.asarray(b_steps)
    shifted = (plane.astype(jnp.int16) - 128).astype(jnp.float32)
    n = (H // 8) * (W // 8)
    acc = jnp.zeros((n, 64), jnp.float32)
    for k in range(64):
        px = shifted[x_of[k]::8, y_of[k]::8].reshape(n, 1)
        acc = acc + (px * a_c[k : k + 1, :]) * b_c[k : k + 1, :]
    coeffs = (jnp.asarray(scale)[None, :] * acc) / jnp.asarray(q)
    return jnp.trunc(coeffs).astype(jnp.int16)


@jax.jit
def f_blockify(ps):
    def one(p):
        return dct.real_dct_quant_ordered(sample.blockify(p), qt,
                                          zigzag_out=True)
    out = jax.vmap(one)(ps)
    return out


@jax.jit
def f_strided(ps):
    return jax.vmap(dct_strided)(ps)


def timeit(name, fn, iters=100):
    out = fn(planes)
    _ = np.asarray(out[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(planes)
    _ = np.asarray(out[0, 0, 0])
    print(f"{name:24s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms/batch")
    return out


o1 = timeit("blockify + chain", f_blockify)
o2 = timeit("strided chain", f_strided)
print("bit-equal:", bool(jnp.all(o1 == o2)))
