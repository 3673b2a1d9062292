"""TPU check of the Pallas packer: correctness vs XLA packer + timing (dev)."""
import os, sys, time
import jax
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from jpeg_encoder_tpu import pipeline, tables
from jpeg_encoder_tpu.config import DctAlgorithm, EncoderConfig
from jpeg_encoder_tpu.ops import color, dct, entropy, sample

H, W, BATCH = 1088, 1920, 8
config = EncoderConfig(subsampling_ratio=(4, 2, 0))
geom = config.geometry(W, H)
cap = pipeline.default_capacity_bytes(geom, 0.5)


def log(m): print(m, file=sys.stderr, flush=True)


def make_images():
    key = jax.random.key(0)
    base = jax.random.uniform(key, (BATCH, H // 8, W // 8, 3))
    img = jax.image.resize(base, (BATCH, H, W, 3), "linear")
    noise = jax.random.uniform(jax.random.key(100), (BATCH, H, W, 3)) * 0.1
    return ((img * 0.9 + noise) * 255).astype(jnp.uint8)


images = jax.jit(make_images)()
_ = np.asarray(images[0, 0, 0, 0])


def blocks(imgs):
    def one(rgb):
        y, cb, cr = color.rgb_to_ycbcr(rgb)
        y = sample.pad_plane(y, geom)
        cb = sample.subsample_plane(sample.pad_plane(cb, geom), geom)
        cr = sample.subsample_plane(sample.pad_plane(cr, geom), geom)
        f = lambda b, q: dct.dct_quantize(b, q, DctAlgorithm.REAL_DCT, False)
        return (f(sample.blockify(y), tables.Y_QUANT_TABLE),
                f(sample.blockify(cb), tables.C_QUANT_TABLE),
                f(sample.blockify(cr), tables.C_QUANT_TABLE))
    return jax.vmap(one)(imgs)


yq, cbq, crq = jax.jit(blocks)(images)
_ = np.asarray(yq[0, 0, 0])

def scan_with(packer):
    def go(yq, cbq, crq):
        def one(a, b, c):
            return entropy.encode_scan(a, b, c, geom, cap, packer=packer)
        p, bits = jax.vmap(one)(yq, cbq, crq)
        return p, bits
    return jax.jit(go)

# correctness first: compare payloads
px, bx = scan_with("xla")(yq, cbq, crq)
pp, bp = scan_with("pallas")(yq, cbq, crq)
px, bx, pp, bp = (np.asarray(v) for v in (px, bx, pp, bp))
print("bits match:", (bx == bp).all(), bx[:3], file=sys.stderr)
nb = (int(bx.max()) + 7) // 8
print("payload match:", all((px[i, :nb] == pp[i, :nb]).all() for i in range(BATCH)),
      file=sys.stderr)


def timed(name, fn, iters=6):
    _ = np.asarray(fn(yq, cbq, crq)[1][0])
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(yq, cbq, crq)
    _ = np.asarray(out[1][0])
    dt = (time.perf_counter() - t0) / iters
    log(f"{name:28s} {dt*1e3:9.2f} ms/batch  ({BATCH*H*W/dt/1e6:7.1f} Mpix/s)")


pf, bf = scan_with("fused")(yq, cbq, crq)
pf, bf = np.asarray(pf), np.asarray(bf)
print("fused bits match:", (bx == bf).all(), file=sys.stderr)
print("fused payload match:", all((px[i, :nb] == pf[i, :nb]).all() for i in range(BATCH)),
      file=sys.stderr)
timed("scan+pack XLA", scan_with("xla"))
timed("scan+pack PALLAS", scan_with("pallas"))
timed("scan+pack FUSED", scan_with("fused"))
log("done")
