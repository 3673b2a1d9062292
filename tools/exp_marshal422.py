"""Experiment: 4:2:2 marshal cost anomaly (dev).

profile_stages measured the scan-order marshal increment at 3.19 ms/batch
for 4:2:2 vs 0.43 (4:2:0) / 0.62 (4:4:4), despite 4:2:2 moving LESS data
than 4:4:4. Hypothesis: the (m, 2, 64) + (m, 1, 64) + (m, 1, 64) int16
concat picks a pathological layout. Candidate fix: at v == 1 the luma scan
order is the IDENTITY (superblocks are h consecutive row-major blocks), so
the kernel's paired (E/2, 128) rows can be built directly as an interleave
of clean 128-lane rows: z2 = stack([y.reshape(m, 128), cb|cr], axis=1).

    python tools/exp_marshal422.py [ratio]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from jpeg_encoder_tpu import pipeline
from jpeg_encoder_tpu.config import EncoderConfig, parse_subsampling_ratio
from jpeg_encoder_tpu.kernels import entropy_pallas
from jpeg_encoder_tpu.ops import entropy

H, W, B = 1088, 1920, 8
RATIO = parse_subsampling_ratio(sys.argv[1]) if len(sys.argv) > 1 else (4, 2, 2)
config = EncoderConfig(subsampling_ratio=RATIO)
geom = config.geometry(W, H)
cap = pipeline.default_capacity_bytes(geom, config.capacity_bytes_per_pixel)
rng = np.random.default_rng(0)
ny, nc = geom.num_luma_blocks, geom.num_chroma_blocks
m, bpm = geom.num_mcus, geom.blocks_per_mcu
hv = geom.h_factor * geom.v_factor
E = m * bpm
# Sparse-ish coefficients (realistic bit lengths for the kernel timing).
y = jnp.asarray(
    (rng.integers(-40, 40, (B, ny, 64)) * (rng.random((B, ny, 64)) < 0.25)),
    jnp.int16,
)
cb = jnp.asarray(
    (rng.integers(-40, 40, (B, nc, 64)) * (rng.random((B, nc, 64)) < 0.2)),
    jnp.int16,
)
cr = jnp.asarray(
    (rng.integers(-40, 40, (B, nc, 64)) * (rng.random((B, nc, 64)) < 0.2)),
    jnp.int16,
)


def marshal_current(yc, cbc, crc):
    z, d = entropy.marshal_scan_inputs(yc, cbc, crc, geom, None, True)
    return z.reshape(E // 2, 128), d.astype(jnp.int32).reshape(E // 2, 2)


def marshal_pairs(yc, cbc, crc):
    """v==1, h==2 only: rows alternate [Y2k|Y2k+1], [Cb_k|Cr_k]."""
    y2 = yc.reshape(m, 128)
    cc = jnp.concatenate([cbc, crc], axis=1)  # (m, 128)
    z2 = jnp.stack([y2, cc], axis=1).reshape(E // 2, 128)
    dy = yc[:, 0].astype(jnp.int32)
    dy = dy - jnp.concatenate([jnp.zeros((1,), jnp.int32), dy[:-1]])
    db = cbc[:, 0].astype(jnp.int32)
    db = db - jnp.concatenate([jnp.zeros((1,), jnp.int32), db[:-1]])
    dr = crc[:, 0].astype(jnp.int32)
    dr = dr - jnp.concatenate([jnp.zeros((1,), jnp.int32), dr[:-1]])
    d2 = jnp.stack(
        [jnp.stack([dy[0::2], dy[1::2]], 1), jnp.stack([db, dr], 1)], axis=1
    ).reshape(E // 2, 2)
    return z2, d2


def timeit(name, fn, *args, iters=100):
    f = jax.jit(jax.vmap(fn)) if fn.__name__.startswith("marshal") else jax.jit(fn)
    out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[-1]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[-1]).ravel()[0]
    print(f"{name:36s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms/batch")
    return out


za, da = timeit("marshal current", marshal_current, y, cb, cr)
if geom.v_factor == 1 and geom.h_factor == 2:
    zf, df = timeit("marshal pair-rows", marshal_pairs, y, cb, cr)
    print("z equal:", bool(jnp.all(za == zf)), " d equal:", bool(jnp.all(da == df)))

    def full(mar):
        def g(yc, cbc, crc):
            z2, d2 = mar(yc, cbc, crc)
            z = z2.reshape(E, 64)
            d = d2.reshape(E)
            _, bits = entropy_pallas.encode_entropy_fused(z, d, geom, cap)
            return bits
        def h(yy, cc_, rr):
            return jnp.sum(jax.vmap(g)(yy, cc_, rr))
        h.__name__ = "full_" + mar.__name__
        return h

    timeit("marshal current + kernel", full(marshal_current), y, cb, cr)
    timeit("marshal pair-rows + kernel", full(marshal_pairs), y, cb, cr)
