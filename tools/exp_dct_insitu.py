"""Probe: in-situ DCT cost under vmap; concat-planes single-chain variant."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from jpeg_encoder_tpu import tables
from jpeg_encoder_tpu.config import DctAlgorithm, EncoderConfig
from jpeg_encoder_tpu.ops import color, dct, sample

_F32 = np.float32
H, W, B = 1088, 1920, 8
geom = EncoderConfig(subsampling_ratio=(4, 2, 0)).geometry(W, H)
rng = np.random.default_rng(0)
rgb = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), np.uint8))
ny, nc = geom.num_luma_blocks, geom.num_chroma_blocks


def front(im):
    y, cb, cr = color.rgb_to_ycbcr(im)
    y = sample.pad_plane(y, geom)
    cb = sample.subsample_plane(sample.pad_plane(cb, geom), geom)
    cr = sample.subsample_plane(sample.pad_plane(cr, geom), geom)
    return (sample.blockify(y), sample.blockify(cb), sample.blockify(cr))


@jax.jit
def v_three(x):
    def one(im):
        by, bcb, bcr = front(im)
        y_z = dct.dct_quantize(by, tables.Y_QUANT_TABLE,
                               DctAlgorithm.REAL_DCT, False, zigzag_out=True)
        cb_z = dct.dct_quantize(bcb, tables.C_QUANT_TABLE,
                                DctAlgorithm.REAL_DCT, False, zigzag_out=True)
        cr_z = dct.dct_quantize(bcr, tables.C_QUANT_TABLE,
                                DctAlgorithm.REAL_DCT, False, zigzag_out=True)
        return y_z, cb_z, cr_z
    y, cb, cr = jax.vmap(one)(x)
    return (jnp.sum(y.astype(jnp.int32)) + jnp.sum(cb.astype(jnp.int32))
            + jnp.sum(cr.astype(jnp.int32)))


def ordered_concat(blocks_u8, row_is_luma_col):
    basis = dct.dct_basis_f32()
    u_of = np.arange(64) // 8
    v_of = np.arange(64) % 8
    u_of = u_of[tables.ZIGZAG_ORDER]
    v_of = v_of[tables.ZIGZAG_ORDER]
    x_of = np.arange(64) // 8
    y_of = np.arange(64) % 8
    a_steps = jnp.asarray(basis[u_of[None, :], x_of[:, None]])
    b_steps = jnp.asarray(basis[v_of[None, :], y_of[:, None]])
    shifted = dct.level_shift(blocks_u8).astype(jnp.float32)
    if BARRIER:
        shifted = jax.lax.optimization_barrier(shifted)
    acc = jnp.zeros_like(shifted)
    for k in range(64):
        acc = acc + (shifted[:, k : k + 1] * a_steps[k : k + 1, :]) * (
            b_steps[k : k + 1, :]
        )
    inv_sqrt2 = _F32(1.0) / _F32(np.sqrt(2.0))
    alpha = np.where(np.arange(8) == 0, inv_sqrt2, _F32(1.0)).astype(_F32)
    scale = ((_F32(0.25) * alpha[u_of]) * alpha[v_of]).astype(_F32)
    qy = tables.Y_QUANT_TABLE.reshape(64).astype(np.float32)[tables.ZIGZAG_ORDER]
    qc = tables.C_QUANT_TABLE.reshape(64).astype(np.float32)[tables.ZIGZAG_ORDER]
    q = jnp.where(row_is_luma_col, jnp.asarray(qy)[None, :],
                  jnp.asarray(qc)[None, :])
    coeffs = (jnp.asarray(scale)[None, :] * acc) / q
    return jnp.trunc(coeffs).astype(jnp.int16)


BARRIER = False


@jax.jit
def v_concat(x):
    def one(im):
        by, bcb, bcr = front(im)
        allb = jnp.concatenate([by, bcb, bcr], axis=0)
        is_y = (jnp.arange(allb.shape[0]) < ny)[:, None]
        out = ordered_concat(allb, is_y)
        return out[:ny], out[ny:ny + nc], out[ny + nc:]
    y, cb, cr = jax.vmap(one)(x)
    return (jnp.sum(y.astype(jnp.int32)) + jnp.sum(cb.astype(jnp.int32))
            + jnp.sum(cr.astype(jnp.int32)))


def timeit(name, fn, iters=60):
    out = fn(rgb)
    _ = np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(rgb)
    _ = np.asarray(out).ravel()[0]
    print(f"{name:28s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms/batch")
    return out


o1 = timeit("front + 3 DCT calls", v_three)
o2 = timeit("front + concat DCT", v_concat)
BARRIER = True


@jax.jit
def v_concat_b(x):
    def one(im):
        by, bcb, bcr = front(im)
        allb = jnp.concatenate([by, bcb, bcr], axis=0)
        is_y = (jnp.arange(allb.shape[0]) < ny)[:, None]
        out = ordered_concat(allb, is_y)
        return out[:ny], out[ny:ny + nc], out[ny + nc:]
    y, cb, cr = jax.vmap(one)(x)
    return (jnp.sum(y.astype(jnp.int32)) + jnp.sum(cb.astype(jnp.int32))
            + jnp.sum(cr.astype(jnp.int32)))


o3 = timeit("front + concat DCT +barrier", v_concat_b)
print("sums equal:", int(o1) == int(o2), int(o1) == int(o3))
