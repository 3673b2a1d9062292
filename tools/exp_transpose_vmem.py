"""Experiment: in-VMEM transpose cost for the DCT->entropy fusion (dev).

The fusion candidate needs each grid step to convert the transposed-chain
DCT result (64, T) [coeff sublanes x entry lanes] into the entropy layout
(T/2, 128) [entry-pair rows x 2x64 slot lanes]. Three candidate forms:

  t_reshape   jnp.transpose (64,T)->(T,64) then reshape (T/2,128)
  t_split     two strided (64,T/2) transposes -> lane-concat (T/2,128)
  none        baseline kernel without the conversion (floor)

Times each under a realistic register load (the arrays must live).

    python tools/exp_transpose_vmem.py
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

T = 2048
STEPS = 384  # ~ the 4:4:4 batch-8 tile count


def _kernel(x_ref, out_ref, *, form):
    xt = x_ref[:].astype(jnp.int32)          # (64, T)
    if form == "none":
        r = xt[: T // 2, :128] if False else xt
        # fold (64, T) -> (8, 128) so nothing is DCE'd
        red = xt
        while red.shape[0] > 8:
            h = red.shape[0] // 2
            red = red[:h] | red[h:]
        while red.shape[1] > 128:
            h = red.shape[1] // 2
            red = red[:, :h] | red[:, h:]
        out_ref[0:8, :] = red
        return
    if form == "t_reshape":
        z2 = jnp.transpose(xt).reshape(T // 2, 128)
    else:
        ev = jnp.transpose(xt[:, 0::2])      # (T/2, 64)
        od = jnp.transpose(xt[:, 1::2])
        z2 = jnp.concatenate([ev, od], axis=1)
    red = z2
    while red.shape[0] > 8:
        h = red.shape[0] // 2
        red = red[:h] | red[h:]
    out_ref[0:8, :] = red


def run(form):
    x = jnp.asarray(
        np.random.default_rng(0).integers(-999, 999, (64, T * STEPS)),
        jnp.int16,
    )
    f = pl.pallas_call(
        functools.partial(_kernel, form=form),
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((64, T), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )
    g = jax.jit(f)
    try:
        out = g(x)
        _ = np.asarray(out[0, 0])
    except Exception as e:  # noqa: BLE001
        print(f"{form:10s} FAILED: {str(e).splitlines()[0][:120]}")
        return
    t0 = time.perf_counter()
    iters = 100
    for _ in range(iters):
        out = g(x)
    _ = np.asarray(out[0, 0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{form:10s} {dt:7.3f} ms ({dt / STEPS * 1e3:6.2f} us/step)")


for form in ("none", "t_reshape", "t_split"):
    run(form)
