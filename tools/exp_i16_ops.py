"""Experiment: do int16 vector ops run PACKED (2/word) on this TPU? (dev)

The fused entropy kernel spends ~184 full-array (512, 128) i32 ops per
tile on index/length arithmetic whose values all fit int16 (positions
<= 127, lens <= 27, offsets <= 3456, word indices <= 110). If Mosaic
executes i16 elementwise ops packed, those networks cost half the vreg
ops. If it widens i16 to i32 internally, there is nothing to win and the
kernel should stay i32. This measures exactly that delta on the two
networks that matter:

  cummax   6-step masked shift-max (run-length state over zigzag lanes)
  cumsum   7-step full-width prefix sum (slot bit lengths -> offsets)

Each variant runs the network R times back-to-back (data-dependent) per
grid step over G tiles, so ALU cost dominates the fixed block IO. Also
probes support/perf of pltpu.roll and take_along_axis on i16.

    python tools/exp_i16_ops.py
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

T2 = 512
G = 64
R = 8


def _shift_half(x, k, fill):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    rolled = pltpu.roll(x, k, 1)
    return jnp.where((lane & 63) >= k, rolled, fill)


def _shift_lanes(x, k, fill):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    rolled = pltpu.roll(x, k, 1)
    return jnp.where(lane >= k, rolled, fill)


def kern(z_ref, out_ref, *, dtype, net):
    z = z_ref[:].astype(dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T2, 128), 1)
    lane64 = (lane & 63).astype(dtype)
    acc = z
    for _ in range(R):
        if net == "cummax":
            cm = jnp.where((acc != 0) & (lane64 > 0), lane64, 0)
            k = 1
            while k < 64:
                cm = jnp.maximum(cm, _shift_half(cm, k, 0))
                k *= 2
            acc = cm
        elif net == "cumsum":
            cm = acc & 31
            k = 1
            while k < 128:
                cm = cm + _shift_lanes(cm, k, 0)
                k *= 2
            acc = cm
        elif net == "gather":
            idx = (acc & 127).astype(jnp.int32)
            g = jnp.take_along_axis(acc, idx, axis=1)
            acc = g + 1
    out_ref[:] = (acc[0:8, :]).astype(jnp.int32)


def run(dtype, net):
    z = jnp.asarray(
        np.random.default_rng(0).integers(-100, 100, (G * T2, 128)),
        jnp.int16,
    )
    f = pl.pallas_call(
        functools.partial(kern, dtype=dtype, net=net),
        grid=(G,),
        in_specs=[pl.BlockSpec((T2, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )
    f = jax.jit(f)
    try:
        out = f(z)
        _ = np.asarray(out)
    except Exception as e:  # noqa: BLE001 - support probe
        print(f"{net:8s} {dtype.__name__:6s}  UNSUPPORTED: {type(e).__name__}: {e}"[:200])
        return None
    t0 = time.perf_counter()
    iters = 200
    for _ in range(iters):
        out = f(z)
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    per_op = dt / (G * R) * 1e9
    print(f"{net:8s} {dtype.__name__:6s} {dt * 1e3:8.3f} ms   {per_op:7.1f} ns/tile-net")
    return dt


for net in ("cummax", "cumsum", "gather"):
    a = run(jnp.int32, net)
    b = run(jnp.int16, net)
    if a and b:
        print(f"  -> i16/i32 ratio: {b / a:.2f}\n")
