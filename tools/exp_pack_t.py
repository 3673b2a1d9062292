"""A/B alternative XLA formulations of _pack_plane_t (the (16, N) packed
transposed DCT input build) at 4:4:4 sizes — 3 full 1080p planes, batch 8.

Each variant must produce IDENTICAL (16, N) i32 output (asserted on one
plane against the production build). Timed with a sum consumer... which
XLA could elide for pure reshapes — so instead each variant's output
feeds a trivial pallas reduction kernel that forces materialization in
the exact layout.
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

from jpeg_encoder_tpu.kernels.dct_pallas import _pack_plane_t

H, W, B = 1088, 1920, 8
rng = np.random.default_rng(0)
planes = jnp.asarray(rng.integers(0, 256, (B, 3, H, W), np.uint8))


def _consume_kernel(x_ref, out_ref):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    r = x_ref[:].astype(jnp.uint32)
    while r.shape[1] > 128:
        hlf = r.shape[1] // 2
        r = r[:, :hlf] | r[:, hlf:]
    out_ref[:] = out_ref[:] | r


def consume(x):  # force materialization of (16, N) i32 in HBM layout
    n = x.shape[1]
    t = 1024
    pad = -(-n // t) * t - n
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return pl.pallas_call(
        _consume_kernel,
        grid=(x.shape[1] // t,),
        in_specs=[pl.BlockSpec((16, t), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32),
    )(x)


def v_base(plane):
    return _pack_plane_t(plane)


def v_u8_transpose_first(plane):
    """Transpose at u8 granularity via (by,8,bx,8) -> (8, 8, by, bx)."""
    hgt, wdt = plane.shape
    by, bx = hgt // 8, wdt // 8
    t = plane.reshape(by, 8, bx, 8).transpose(1, 3, 0, 2)  # (8, 8, by, bx)
    # rows: x = r // 2, y quad = r % 2 -> pack 4 consecutive y into words
    t = t.reshape(8, 2, 4, by * bx).transpose(0, 1, 3, 2)  # (8,2,N,4)
    w = jax.lax.bitcast_convert_type(
        t, jnp.int32
    )  # (8, 2, N)
    return w.reshape(16, by * bx)


def v_two_step(plane):
    """Split the big transpose: first (by,8,bx,2)->(8,by,bx,2) (moves the
    8-row dim out), then the small (…,2) minor swap."""
    hgt, wdt = plane.shape
    by, bx = hgt // 8, wdt // 8
    p32 = jax.lax.bitcast_convert_type(
        plane.reshape(hgt, wdt // 4, 4), jnp.int32
    )
    t = p32.reshape(by, 8, bx * 2).transpose(1, 0, 2)  # (8, by, 2bx)
    t = t.reshape(8, by, bx, 2).transpose(0, 3, 1, 2)  # (8, 2, by, bx)
    return t.reshape(16, by * bx)


def v_rowmajor_words(plane):
    """Keep (q, bc) minor-major: rows (x,q) but build via (8, 2, by*bx)
    with a single 3D transpose from (by, 8, bx, 2)."""
    hgt, wdt = plane.shape
    by, bx = hgt // 8, wdt // 8
    p32 = jax.lax.bitcast_convert_type(
        plane.reshape(hgt, wdt // 4, 4), jnp.int32
    )
    t = p32.reshape(by * 8, bx, 2).transpose(2, 0, 1)    # (2, 8by, bx)
    t = t.reshape(2, by, 8, bx).transpose(2, 0, 1, 3)    # (8, 2, by, bx)
    return t.reshape(16, by * bx)


def timeit(name, fn):
    @jax.jit
    def go(ps):
        def one(img3):
            return [consume(fn(img3[c])) for c in range(3)]
        return jax.vmap(one)(ps)

    out = go(planes)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    iters = 200
    for _ in range(iters):
        out = go(planes)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:22s} {dt:7.2f} ms/batch")


# correctness first (on CPU-ish small check via device): one plane
ref = np.asarray(v_base(planes[0, 0]))
for name, fn in [("u8_transpose_first", v_u8_transpose_first),
                 ("two_step", v_two_step),
                 ("rowmajor_words", v_rowmajor_words)]:
    got = np.asarray(jax.jit(fn)(planes[0, 0]))
    assert np.array_equal(ref, got), f"{name} layout mismatch"
print("variants verified identical")

timeit("base (production)", v_base)
timeit("u8_transpose_first", v_u8_transpose_first)
timeit("two_step", v_two_step)
timeit("rowmajor_words", v_rowmajor_words)
