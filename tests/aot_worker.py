"""Subprocess worker for tests/test_aot.py: one single-device CPU encode.

The AOT executable cache declines multi-device CPU processes (see
utils/aot_cache.get_or_build), so the virtual 8-device test mesh can't
exercise the load path in-process — each worker run is a fresh
single-device CPU process instead, exactly the shape of a cold CLI start.

Usage: python tests/aot_worker.py CACHE_DIR OUT_FILE
Writes the encoded JPEG bytes to OUT_FILE.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jpeg_encoder_tpu import pipeline  # noqa: E402
from jpeg_encoder_tpu.config import EncoderConfig  # noqa: E402
from jpeg_encoder_tpu.utils import aot_cache  # noqa: E402


def main() -> int:
    cache_dir, out_file = sys.argv[1], sys.argv[2]
    aot_cache.enable(cache_dir)
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    result = pipeline.encode_array(rgb, EncoderConfig())
    with open(out_file, "wb") as f:
        f.write(result.file_bytes)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
