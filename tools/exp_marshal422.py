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
    z, _ = entropy.marshal_scan_inputs(
        yc, cbc, crc, geom, None, True, want_diff=False
    )
    return z.reshape(E // 2, 128)


def marshal_pairs(yc, cbc, crc):
    """v==1, h==2 only: rows alternate [Y2k|Y2k+1], [Cb_k|Cr_k]."""
    y2 = yc.reshape(m, 128)
    cc = jnp.concatenate([cbc, crc], axis=1)  # (m, 128)
    return jnp.stack([y2, cc], axis=1).reshape(E // 2, 128)


def marshal_cat2d(yc, cbc, crc):
    """Row interleave as a LANE concat + free reshape: (m, 256) row-major
    is exactly rows [y2[k], cc[k]] alternating."""
    y2 = yc.reshape(m, 128)
    return jnp.concatenate([y2, cbc, crc], axis=1).reshape(E // 2, 128)


def marshal_cat2d_i32(yc, cbc, crc):
    y2 = jax.lax.bitcast_convert_type(
        yc.reshape(m, 64, 2), jnp.int32).reshape(m, 64)
    cb2 = jax.lax.bitcast_convert_type(
        cbc.reshape(m, 32, 2), jnp.int32).reshape(m, 32)
    cr2 = jax.lax.bitcast_convert_type(
        crc.reshape(m, 32, 2), jnp.int32).reshape(m, 32)
    cat = jnp.concatenate([y2, cb2, cr2], axis=1).reshape(E // 2, 64)
    return jax.lax.bitcast_convert_type(cat, jnp.int16).reshape(E // 2, 128)


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


za = timeit("marshal current", marshal_current, y, cb, cr)
if geom.v_factor == 1 and geom.h_factor == 2:
    zf = timeit("marshal pair-rows", marshal_pairs, y, cb, cr)
    print("z equal:", bool(jnp.all(za == zf)))
    zc = timeit("marshal cat2d", marshal_cat2d, y, cb, cr)
    print("z equal:", bool(jnp.all(za == zc)))
    zi = timeit("marshal cat2d i32", marshal_cat2d_i32, y, cb, cr)
    print("z equal:", bool(jnp.all(za == zi)))

    def full(mar):
        def g(yc, cbc, crc):
            z2 = mar(yc, cbc, crc)
            z = z2.reshape(E, 64)
            _, bits = entropy_pallas.encode_entropy_fused(z, geom, cap)
            return bits
        def h(yy, cc_, rr):
            return jnp.sum(jax.vmap(g)(yy, cc_, rr))
        h.__name__ = "full_" + mar.__name__
        return h

    timeit("marshal current + kernel", full(marshal_current), y, cb, cr)
    timeit("marshal pair-rows + kernel", full(marshal_pairs), y, cb, cr)
    timeit("marshal cat2d + kernel", full(marshal_cat2d), y, cb, cr)
    timeit("marshal cat2d i32 + kernel", full(marshal_cat2d_i32), y, cb, cr)

    # ---- in-situ reproduction: marshal consuming the real DCT output ----
    from jpeg_encoder_tpu.config import DctAlgorithm
    from jpeg_encoder_tpu.ops import color, dct, sample

    imgs = jnp.asarray(rng.integers(0, 256, (B, H, W, 3)), jnp.uint8)

    def front(im):
        yp, cbp, crp = color.rgb_to_ycbcr(im)
        yp = sample.pad_plane(yp, geom)
        cbp = sample.subsample_plane(sample.pad_plane(cbp, geom), geom)
        crp = sample.subsample_plane(sample.pad_plane(crp, geom), geom)
        return dct.dct_quantize_planes(
            sample.blockify(yp), sample.blockify(cbp), sample.blockify(crp),
            DctAlgorithm.REAL_DCT, False, zigzag_out=True)

    def situ(mar, barrier):
        def g(im):
            yc, cbc, crc = front(im)
            if barrier:
                yc, cbc, crc = jax.lax.optimization_barrier((yc, cbc, crc))
            z2 = mar(yc, cbc, crc)
            _, bits = entropy_pallas.encode_entropy_fused(
                z2.reshape(E, 64), geom, cap)
            return bits
        def h(ims):
            return jnp.sum(jax.vmap(g)(ims))
        h.__name__ = f"situ_{mar.__name__}_{barrier}"
        return h

    print("--- in situ (front + marshal + kernel) ---")
    timeit("situ current", situ(marshal_current, False), imgs)
    timeit("situ current + barrier", situ(marshal_current, True), imgs)
    timeit("situ cat2d", situ(marshal_cat2d, False), imgs)
    timeit("situ cat2d + barrier", situ(marshal_cat2d, True), imgs)
