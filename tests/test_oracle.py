"""Oracle self-checks: the golden model reproduces the reference's anchors.

The only numeric test vector the reference ships is the Wikipedia JPEG
article's 8x8 DCT example (dct_quant.rs:247-250) with a mean-abs-error <= 1
assertion; both oracle DCT variants must pass it. The remaining tests pin
structural invariants of the oracle (decode round-trips are covered in
test_pipeline.py via an independent decoder).
"""

import numpy as np
import pytest

from jpeg_encoder_tpu import oracle, tables
from jpeg_encoder_tpu.config import DctAlgorithm, EncoderConfig

WIKI_BLOCK = np.array(
    [
        [52, 55, 61, 66, 70, 61, 64, 73],
        [63, 59, 55, 90, 109, 85, 69, 72],
        [62, 59, 68, 113, 144, 104, 66, 73],
        [63, 58, 71, 122, 154, 106, 70, 69],
        [67, 61, 68, 104, 126, 88, 68, 70],
        [79, 65, 60, 70, 77, 68, 58, 75],
        [85, 71, 64, 59, 55, 61, 65, 83],
        [87, 79, 69, 68, 65, 76, 78, 94],
    ],
    dtype=np.uint8,
)

WIKI_EXPECTED = np.array(
    [
        [-26, -3, -6, 2, 2, -1, 0, 0],
        [0, -2, -4, 1, 1, 0, 0, 0],
        [-3, 1, 5, -1, -1, 0, 0, 0],
        [-3, 1, 2, -1, 0, 0, 0, 0],
        [1, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ],
    dtype=np.int16,
)


def test_real_dct_wikipedia_block():
    got = oracle.real_dct_quant_exact(WIKI_BLOCK[None], tables.Y_QUANT_TABLE)[0]
    assert np.abs(got - WIKI_EXPECTED).mean() <= 1.0
    # Truncation semantics: exact DC is -415.37/16 = -25.96 -> trunc -> -25.
    assert got[0, 0] == -25


def test_bin_dct_wikipedia_block():
    got = oracle.bin_dct_quant_exact(WIKI_BLOCK[None], tables.Y_QUANT_TABLE)[0]
    # The reference's binDCT skips de-scaling, so only the reference's own
    # loose tolerance applies.
    assert np.abs(got - WIKI_EXPECTED).mean() <= 1.0


def test_color_conversion_range_and_truncation():
    rgb = np.zeros((1, 1, 3), dtype=np.uint8)
    y, cb, cr = oracle.rgb_to_ycbcr_exact(rgb)
    assert (y.item(), cb.item(), cr.item()) == (0, 128, 128)
    rgb = np.full((1, 1, 3), 255, dtype=np.uint8)
    y, cb, cr = oracle.rgb_to_ycbcr_exact(rgb)
    assert y.item() == 255 and cb.item() in (127, 128) and cr.item() in (127, 128)


def test_subsample_push_order_quirk():
    """width % (8h) == 1 misaligns the chroma assembly; emulate faithfully."""
    geom = EncoderConfig(subsampling_ratio=(4, 2, 0)).geometry(17, 16)
    # padded plane: 32 wide (multiple of 16), chroma plane: 8 wide.
    assert geom.padded_width == 32 and geom.chroma_width == 8
    plane = np.arange(32 * 16, dtype=np.int64) % 251
    plane = plane.astype(np.uint8)
    got = oracle.subsample_plane(plane.reshape(16, 32), geom)
    # Push-order semantics: averages flattened from the (8, 16) grid, first
    # chroma_h * chroma_w taken row-major.
    windows = plane.reshape(16, 32).reshape(8, 2, 16, 2).astype(np.int64)
    averages = windows.sum(axis=(1, 3)) // 4
    expected = averages.reshape(-1)[: 8 * 8].reshape(8, 8).astype(np.uint8)
    assert np.array_equal(got, expected)
    # ... and it differs from the naive aligned reshape, proving the quirk.
    naive = averages[:8, :8].astype(np.uint8)
    assert not np.array_equal(got, naive)


def test_entropy_known_tiny_stream():
    """Hand-computed bitstream for a trivially simple coefficient block."""
    geom = EncoderConfig(subsampling_ratio=(4, 4, 4)).geometry(8, 8)
    zeros = np.zeros((1, 8, 8), dtype=np.int16)
    payload, bits = oracle.entropy_encode(zeros, zeros, zeros, geom)
    # Y: DC cat 0 = '00' + EOB '1010' = 6 bits.
    # Cb: DC cat 0 = '00' + EOB '00' = 4 bits. Cr identical.
    assert bits == 6 + 4 + 4
    expected = "00" + "1010" + "0000" + "0000"
    value = int(expected.ljust(16, "0"), 2)
    assert payload == value.to_bytes(2, "big")


def test_entropy_dc_prediction_chain():
    """DC predictors persist across MCUs per component."""
    geom = EncoderConfig(subsampling_ratio=(4, 4, 4)).geometry(16, 8)
    y = np.zeros((2, 8, 8), dtype=np.int16)
    y[0, 0, 0] = 5
    y[1, 0, 0] = 5  # same DC -> second diff is 0
    c = np.zeros((2, 8, 8), dtype=np.int16)
    payload, bits = oracle.entropy_encode(y, c, c, geom)
    # Block 1: DC diff 5 -> cat 3 ('100' + '101'), EOB '1010' -> 10 bits
    # Cb/Cr: '00' + '00' each -> 8 bits
    # Block 2: DC diff 0 -> '00' + EOB '1010' -> 6 bits, chroma 8 bits
    assert bits == 10 + 8 + 6 + 8


@pytest.mark.parametrize("ratio", [(4, 4, 4), (4, 2, 2), (4, 2, 0)])
@pytest.mark.parametrize("algorithm", [DctAlgorithm.REAL_DCT, DctAlgorithm.BIN_DCT])
def test_oracle_end_to_end_decodes(ratio, algorithm, rng):
    """Oracle output must be decodable by an independent decoder (PIL)."""
    from PIL import Image
    import io as _io

    from jpeg_encoder_tpu.io import jfif

    rgb = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    config = EncoderConfig(subsampling_ratio=ratio, dct_algorithm=algorithm)
    result = oracle.encode_oracle(rgb, config)
    file_bytes = jfif.assemble(result.geom, result.entropy_bytes)
    img = Image.open(_io.BytesIO(file_bytes))
    img.load()  # force full decode; raises on a corrupt scan
    assert img.size == (40, 24)
