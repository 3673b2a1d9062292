"""Experiment: guarded-exact RealDCT feasibility (dev).

The bit-exact ordered chain (ops/dct.real_dct_quant_ordered) costs ~192
VPU flops per coefficient and is the 2nd-largest pipeline stage (3.04 ms
at 4:2:0, 7.69 at 4:4:4 per profile_stages). Idea: compute the cheap MXU
Kronecker matmul for ALL blocks, bound |chain - matmul| soundly per
coefficient, and re-run the exact chain ONLY for blocks where a
truncation boundary falls inside the error radius (gather -> chain on a
small fixed-capacity subset -> scatter back).

Soundness sketch: both results are f32 sums of the 64 terms
t_k = (p_k * a_k) * b_k in different orders/groupings. Any f32 summation
order of n terms differs from the true sum by <= (n-1) * eps * S where
S = sum |t_k| (partial sums are bounded by S), eps = 2^-24. Term
formation adds <= 2 eps S (two roundings per term vs the fused Kron
constant), and XLA's HIGHEST f32 matmul (6-pass bf16 with exact hi/lo
splits) obeys the same n*eps*S class bound on its accumulation. S itself
comes from |p| @ |K| (one more cheap matmul) -- computed in f32, inflate
by (1 + 4 eps). Radius = C * eps * S with C = 512 (>= 4x the summed
constants above). A quantized value can differ only if some integer
multiple of q (a trunc boundary) lies within radius of the matmul
result; also guard the divide rounding with one quotient ulp.

This measures, at 1080p-batch block counts:
  - ordered chain / Kron matmul / |p|@|K| matmul times
  - risky-block fraction on photographic-statistics + noise content
    (decides the gather capacity), and validates the guard empirically:
    every block where chain != matmul quantization MUST be flagged risky.

    python tools/exp_dct_guarded.py
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

EPS = np.float32(2.0**-24)
C_GUARD = np.float32(512.0)


def make_blocks(n, rng, kind):
    if kind == "photo":
        # Smooth gradients + texture, like the corpus generator.
        base = rng.normal(128, 40, (n, 1, 1))
        gx = rng.normal(0, 3, (n, 1, 1)) * np.arange(8).reshape(1, 8, 1)
        gy = rng.normal(0, 3, (n, 1, 1)) * np.arange(8).reshape(1, 1, 8)
        tex = rng.normal(0, 6, (n, 8, 8))
        img = base + gx + gy + tex
    elif kind == "flat":
        # Adversarial for the segmented repair: exactly-constant blocks
        # hit trunc boundaries exactly (DC lands on an integer for ~half
        # the values) and CLUSTER, so per-segment risky counts spike.
        img = np.broadcast_to(
            rng.integers(0, 256, (n, 1, 1)).astype(np.float64), (n, 8, 8)
        )
    else:
        img = rng.uniform(0, 255, (n, 8, 8))
    return np.clip(img, 0, 255).astype(np.uint8).reshape(n, 64)


def risky_mask(blocks_u8, q_rows):
    """(N,) bool: block has a coefficient whose trunc cell is in doubt."""
    shifted = dct.level_shift(blocks_u8).astype(jnp.float32)
    k = jnp.asarray(dct.dct_kron_matrix())
    m = jnp.dot(shifted, k, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    s = jnp.dot(jnp.abs(shifted), jnp.abs(k),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    radius = C_GUARD * EPS * s
    qm = m / q_rows
    qr = (radius / q_rows) + 4 * EPS * jnp.abs(qm)
    t = jnp.trunc(qm)
    # Trunc boundaries: nearest integers toward/away from zero; a cell
    # change needs |qm - boundary| <= qr for boundary in {t, t +/- 1}
    # (covering the sign flip at 0 too).
    d1 = jnp.abs(qm - t)
    d2 = jnp.abs(qm - (t + jnp.sign(qm)))
    d3 = jnp.abs(qm - (t - jnp.sign(qm)))
    risky = (d1 <= qr) | (d2 <= qr) | (d3 <= qr)
    return jnp.any(risky, axis=1), jnp.trunc(qm).astype(jnp.int16)


def timeit(name, f, *args, iters=50):
    f = jax.jit(f)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    q = tables.Y_QUANT_TABLE.reshape(64).astype(np.float32)
    q_rows = jnp.asarray(q)[None, :]

    # 4:2:0 1080p batch-8 block count and 4:4:4 (2x).
    for n, tag in ((391680, "4:2:0-batch8"), (783360, "4:4:4-batch8")):
        blocks = jnp.asarray(make_blocks(n, rng, "photo"))
        print(f"--- {tag}: N={n} ---")
        timeit("ordered chain", lambda b: dct.real_dct_quant_ordered(
            b, quant=None, q_rows=q_rows), blocks)
        timeit("kron matmul HIGHEST", lambda b: dct.real_dct_quant(
            b, quant=None, q_rows=q_rows), blocks)
        timeit("matmul + risky mask", lambda b: risky_mask(b, q_rows), blocks)
        out, over = timeit(
            "guarded segmented (64/16)",
            lambda b: dct.real_dct_quant_guarded(b, None, q_rows=q_rows),
            blocks,
        )
        print(f"   overflowed: {bool(over)}")
        want = jax.jit(lambda b: dct.real_dct_quant_ordered(
            b, quant=None, q_rows=q_rows))(blocks)
        print(f"   bit-equal vs chain: "
              f"{bool(jnp.array_equal(out, want))} (must be True)")

    # Guard validation + per-segment risky statistics per content class.
    for kind in ("photo", "noise", "flat"):
        blocks = jnp.asarray(make_blocks(200_000, rng, kind))
        risky, mq = jax.jit(lambda b: risky_mask(b, q_rows))(blocks)
        exact = jax.jit(lambda b: dct.real_dct_quant_ordered(
            b, quant=None, q_rows=q_rows))(blocks)
        risky = np.asarray(risky)
        differs = np.any(np.asarray(exact) != np.asarray(mq), axis=1)
        missed = differs & ~risky
        seg_counts = risky[: (risky.size // 64) * 64].reshape(-1, 64).sum(1)
        print(f"{kind:6s}: risky {risky.mean() * 100:.3f}%  "
              f"actual-diff {differs.mean() * 100:.4f}%  "
              f"MISSED {missed.sum()} (must be 0)  "
              f"seg64 counts p50/p99/max "
              f"{np.percentile(seg_counts, 50):.0f}/"
              f"{np.percentile(seg_counts, 99):.0f}/{seg_counts.max()}")


main()
