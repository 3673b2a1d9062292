"""On-hardware bit-exactness sweep: encode on the attached device, compare
byte-for-byte with the NumPy golden model.

The pytest suite runs on CPU (tests/conftest.py forces the platform); this
tool is the hardware-side check. It matters because LIBTPU enables
xla_allow_excess_precision: FMA contraction in the DCT can flip
coefficients that sit exactly on a truncation boundary, which the flat
(N, 64) formulation of ops/dct.py avoids (an earlier (N, 8, 8) broadcast
formulation measurably did not). Run after any change to the DCT or
entropy path:

    python tools/hw_parity_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from jpeg_encoder_tpu import oracle, pipeline
from jpeg_encoder_tpu.config import DctAlgorithm, EncoderConfig
from jpeg_encoder_tpu.io import jfif


def content(rng, kind, h, w):
    if kind == 0:  # noise
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if kind == 1:  # smooth gradient + mild noise
        x = np.linspace(0, 255, w)[None, :, None]
        y = np.linspace(0, 255, h)[:, None, None]
        return (
            ((x + y) / 2 + rng.normal(0, 3, (h, w, 3))).clip(0, 255)
        ).astype(np.uint8)
    if kind == 2:  # flat
        return np.full((h, w, 3), rng.integers(0, 256), np.uint8)
    return (rng.integers(0, 2, (h, w, 3)) * 255).astype(np.uint8)  # binary


def exhaustive_color() -> int:
    """All 2^24 RGB triples through the jitted conversion vs the oracle."""
    from jpeg_encoder_tpu.ops import color
    import jax.numpy as jnp

    r, g, b = np.meshgrid(
        np.arange(256, dtype=np.uint8),
        np.arange(256, dtype=np.uint8),
        np.arange(256, dtype=np.uint8),
        indexing="ij",
    )
    allrgb = np.stack([r.ravel(), g.ravel(), b.ravel()], -1).reshape(
        4096, 4096, 3
    )
    got = [np.asarray(p) for p in jax.jit(color.rgb_to_ycbcr)(jnp.asarray(allrgb))]
    want = oracle.rgb_to_ycbcr_exact(allrgb)
    bad = sum(int((a != b).sum()) for a, b in zip(got, want))
    print(
        f"exhaustive 2^24 color on {jax.default_backend()}: "
        f"{bad} mismatched channel values"
    )
    return 1 if bad else 0


def corpus_sweep() -> int:
    """Byte-exactness on photographic-statistics content (utils/corpus.py),
    every ratio x algorithm, on the attached device."""
    from jpeg_encoder_tpu.utils import corpus

    failures = 0
    cases = 0
    for name, rgb in corpus.images(256, 384).items():
        for ratio in [(4, 4, 4), (4, 2, 2), (4, 2, 0)]:
            for alg in [DctAlgorithm.REAL_DCT, DctAlgorithm.BIN_DCT]:
                cfg = EncoderConfig(subsampling_ratio=ratio, dct_algorithm=alg)
                dev = pipeline.encode_array(rgb, cfg)
                gold = oracle.encode_oracle(rgb, cfg)
                same = dev.file_bytes == jfif.assemble(
                    gold.geom, gold.entropy_bytes
                )
                cases += 1
                if not same:
                    failures += 1
                    print(f"MISMATCH: {name} ratio={ratio} alg={alg.value}")
    print(
        f"corpus parity sweep on {jax.default_backend()}: "
        f"{cases - failures}/{cases} byte-identical"
    )
    return 1 if failures else 0


def main() -> int:
    if "--color" in sys.argv:
        return exhaustive_color()
    if "--corpus" in sys.argv:
        return corpus_sweep()
    rng = np.random.default_rng(123)
    # Cycle geometries across cases: MCU-aligned, odd dims (pad + the
    # partial-block chroma-mean quirk), the width%(8h)==1 misalignment,
    # and a tall sliver — all on real hardware, not just the CPU suite.
    # The diagonal stride (i + i//4) de-confounds geometry from content
    # kind (the innermost loop), so every content class hits several
    # geometries across the sweep.
    dims = [(96, 160), (89, 157), (96, 129), (130, 17)]
    cases = []
    for ratio in [(4, 4, 4), (4, 2, 2), (4, 2, 0)]:
        for alg in [DctAlgorithm.REAL_DCT, DctAlgorithm.BIN_DCT]:
            for kind in range(4):
                cases.append((ratio, alg, kind))

    failures = 0
    for i, (ratio, alg, kind) in enumerate(cases):
        cfg = EncoderConfig(subsampling_ratio=ratio, dct_algorithm=alg)
        h, w = dims[(i + i // len(dims)) % len(dims)]
        rgb = content(rng, kind, h, w)
        dev = pipeline.encode_array(rgb, cfg)
        gold = oracle.encode_oracle(rgb, cfg)
        same = dev.file_bytes == jfif.assemble(gold.geom, gold.entropy_bytes)
        if not same:
            failures += 1
            print(f"MISMATCH: ratio={ratio} alg={alg.value} kind={kind}")
    print(
        f"hw parity sweep on {jax.default_backend()}: "
        f"{len(cases) - failures}/{len(cases)} byte-identical"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
