"""Experiment: transposed-chain Pallas RealDCT vs the shipping paths (dev).

The (N, 64) ordered chain pays a cross-lane extract broadcast per step;
the transposed (64, T) chain replaces it with a native sublane broadcast
(see kernels/dct_pallas.py `_realdct_chain_t`). Round 1's XLA-level
transposed experiment (exp_dct_transposed.py) lost to HBM transposes;
these variants confine the transposes to VMEM (A) or isolate the chain
cost with XLA transposes left outside (B, an upper-bound probe).

Run on the chip: python tools/exp_dct_chain_t.py
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
from jpeg_encoder_tpu.kernels import dct_pallas
from jpeg_encoder_tpu.ops import dct

N = 8 * (32640 + 2 * 8160)  # one 1080p 4:2:0 batch-8's worth of blocks
rng = np.random.default_rng(0)
blocks = jnp.asarray(rng.integers(0, 256, (N, 64), np.uint8))
qt = tables.Y_QUANT_TABLE

f_ops = jax.jit(lambda b: dct.real_dct_quant_ordered(b, qt, zigzag_out=True))
f_pl = jax.jit(
    lambda b: dct_pallas.real_dct_quant_zigzag_pallas(b, True)
)
f_tk = jax.jit(
    lambda b: dct_pallas.real_dct_quant_zigzag_pallas_t(
        b, True, transposed="kernel"
    )
)
f_tx = jax.jit(
    lambda b: dct_pallas.real_dct_quant_zigzag_pallas_t(
        b, True, transposed="xla"
    )
)


def timeit(name, fn, iters=60):
    try:
        out = fn(blocks)
        _ = np.asarray(out[0, 0])  # sync (block_until_ready lies here)
    except Exception as e:  # Mosaic lowering may reject a variant
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:140]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(blocks)
    _ = np.asarray(out[0, 0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:24s} {dt*1e3:8.2f} ms")
    return out


o_ops = timeit("ops ordered (N,64)", f_ops)
o_pl = timeit("pallas (N,64)", f_pl)
o_tk = timeit("pallas transposed A", f_tk)
o_tx = timeit("pallas pre-T B", f_tx)
for name, o in (("pallas", o_pl), ("transposed A", o_tk), ("pre-T B", o_tx)):
    if o is not None and o_ops is not None:
        eq = bool(jnp.all(o_ops.astype(jnp.int32) == o.astype(jnp.int32)))
        print(f"{name} bit-equal vs ops: {eq}")

# --- variant C: transposed chain, constants pre-transposed to (64, 64)
# COLUMNS (column k = step k), sliced as (64,1) lane slices and hoisted
# out of the step loop -- no per-step (1,64)->(64,1) relayout. T swept. ---
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _chain_tc_kernel(x_ref, at_ref, bt_ref, scale_ref, quant_ref, out_ref,
                     *, tt):
    xt = x_ref[:].astype(jnp.float32) - 128.0  # (64, T), pre-transposed
    a_cols = [at_ref[:, k : k + 1] for k in range(64)]   # loop-invariant
    b_cols = [bt_ref[:, k : k + 1] for k in range(64)]
    acc = jnp.zeros_like(xt)
    for k in range(64):
        acc = acc + (xt[k : k + 1, :] * a_cols[k]) * b_cols[k]
    s_col = scale_ref[:, 0:1]
    q_col = quant_ref[:, 0:1]
    out_ref[:] = jnp.trunc((s_col * acc) / q_col).astype(jnp.int32)


def chain_tc(blocks_u8, tt):
    import functools as ft
    n = blocks_u8.shape[0]
    padded_n = -(-n // tt) * tt
    x = jnp.zeros((padded_n, 64), jnp.int32).at[:n].set(
        blocks_u8.astype(jnp.int32))
    a, b, scale, quant = (
        np.asarray(c) for c in dct_pallas._realdct_constants("y", None))
    at = jnp.asarray(a.T.copy())            # (64 uv?, 64 steps) columns
    bt = jnp.asarray(b.T.copy())
    sc = jnp.asarray(np.repeat(scale.T, 8, axis=1))   # (64, 8) cols
    qc = jnp.asarray(np.repeat(quant.T, 8, axis=1))
    xt = x.T
    out_t = pl.pallas_call(
        ft.partial(_chain_tc_kernel, tt=tt),
        grid=(padded_n // tt,),
        in_specs=[
            pl.BlockSpec((64, tt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (64, tt), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, padded_n), jnp.int32),
    )(xt, at, bt, sc, qc)
    return out_t.T[:n]


for tt in (256, 512, 1024, 2048):
    f_c = jax.jit(lambda b, t=tt: chain_tc(b, t))
    o_c = timeit(f"pre-T C (T={tt})", f_c)
    if o_c is not None and o_ops is not None:
        eq = bool(jnp.all(o_ops.astype(jnp.int32) == o_c.astype(jnp.int32)))
        print(f"  C T={tt} bit-equal vs ops: {eq}")

# --- the production comparison: 3-plane fusion, ops chain vs transposed ---
from jpeg_encoder_tpu.config import DctAlgorithm  # noqa: E402

NY, NC = 8 * 32640, 8 * 8160  # 1080p 4:2:0 batch-8 plane splits
yb = jnp.asarray(rng.integers(0, 256, (NY, 64), np.uint8))
cbb = jnp.asarray(rng.integers(0, 256, (NC, 64), np.uint8))
crb = jnp.asarray(rng.integers(0, 256, (NC, 64), np.uint8))

f_planes_ops = jax.jit(
    lambda a, b, c: dct.dct_quantize_planes(
        a, b, c, DctAlgorithm.REAL_DCT, zigzag_out=True
    )
)
# The planes kernel now takes padded (H, W) planes (packed-i32 input
# layout); hand it planes whose blockify equals yb/cbb/crb so the
# bit-equality check below still compares identical content.
from jpeg_encoder_tpu.ops import sample as _sample  # noqa: E402

_ypl = _sample.unblockify(yb, 8160, 2048)      # 1020*256 = NY blocks
_cbpl = _sample.unblockify(cbb, 2040, 2048)    # 255*256 = NC blocks
_crpl = _sample.unblockify(crb, 2040, 2048)
f_planes_t = jax.jit(
    lambda a, b, c: dct_pallas.real_dct_quant_planes_zigzag_pallas_t(
        _ypl, _cbpl, _crpl
    )
)


def timeit3(name, fn, iters=60):
    try:
        out = fn(yb, cbb, crb)
        _ = np.asarray(out[0][0, 0])
    except Exception as e:
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:140]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(yb, cbb, crb)
    _ = np.asarray(out[0][0, 0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:24s} {dt*1e3:8.2f} ms")
    return out


p_ops = timeit3("planes ops fusion", f_planes_ops)
p_t = timeit3("planes transposed", f_planes_t)
if p_ops is not None and p_t is not None:
    eq = all(
        bool(jnp.all(a == b)) for a, b in zip(p_ops, p_t)
    )
    print(f"planes transposed bit-equal vs ops: {eq}")
