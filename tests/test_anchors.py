"""Independent mathematical anchors for the oracle and the pipeline.

Every byte-identity test in this suite ultimately compares against
oracle.py — a NumPy re-derivation of the Rust reference
(dct_quant.rs:189-234, entropy_coding.rs:16-227, colorspace.rs:5-15).
A systematic misreading of the Rust there would propagate invisibly
through all of them. These tests anchor the math to witnesses that share
no code with the oracle:

* scipy's DCT-II (`scipy.fft.dctn`): the JPEG forward transform with the
  T.81 normalization IS the orthonormal 2-D DCT-II, so the oracle's f32
  sequential accumulation must agree to within f32 rounding.
* PIL's JPEG decoder + scipy's inverse DCT: dequantizing the pipeline's
  quantized coefficients and running an independent IDCT must reproduce
  what an independent decoder shows on screen.
"""

import numpy as np
import pytest

scipy_fft = pytest.importorskip("scipy.fft")

from jpeg_encoder_tpu import oracle, pipeline, tables
from jpeg_encoder_tpu.config import EncoderConfig
from jpeg_encoder_tpu.utils import corpus


def test_oracle_realdct_matches_scipy_dctn(rng):
    """real_dct_quant_exact against scipy.fft.dctn (type II, ortho norm).

    With an all-ones quant table the oracle returns trunc(F(u, v)). The
    T.81 0.25 * alpha_u * alpha_v scaling equals scipy's orthonormal
    2-D DCT-II exactly, so |oracle - scipy| must stay below 1 (f32
    sequential sum vs f64 pairwise sum, both on |values| <= ~2048).
    A transposed basis, wrong alpha, wrong scan order, or off-by-one in
    the cosine argument (the plausible misreadings of dct_quant.rs) all
    produce errors of tens to hundreds.
    """
    blocks = rng.integers(0, 256, size=(64, 8, 8), dtype=np.uint8)
    ones = np.ones((8, 8), dtype=np.uint8)
    got = oracle.real_dct_quant_exact(blocks, ones).astype(np.float64)

    shifted = blocks.astype(np.float64) - 128.0
    want = scipy_fft.dctn(shifted, type=2, norm="ortho", axes=(1, 2))

    # got = trunc(f32 approximation of want): within 1 ULP-of-trunc (the
    # 0.01 slack covers want landing an epsilon past an integer).
    assert np.max(np.abs(got - np.trunc(want))) <= 1.0
    # And the pre-truncation agreement is tight, not a fluke of trunc.
    assert np.max(np.abs(got - want)) <= 1.01


def test_oracle_realdct_quantization_matches_scipy(rng):
    """Same anchor through the Annex-K luma quant table: the full
    quantize-and-truncate path agrees with trunc(scipy DCT / Q) within
    one quantization step."""
    blocks = rng.integers(0, 256, size=(64, 8, 8), dtype=np.uint8)
    q = tables.Y_QUANT_TABLE
    got = oracle.real_dct_quant_exact(blocks, q).astype(np.float64)

    shifted = blocks.astype(np.float64) - 128.0
    f = scipy_fft.dctn(shifted, type=2, norm="ortho", axes=(1, 2))
    want = np.trunc(f / q.astype(np.float64)[None])
    assert np.max(np.abs(got - want)) <= 1.0
    # f32-vs-f64 ties are rare: almost all coefficients must agree exactly.
    assert np.mean(got == want) > 0.99


def test_pipeline_coefficients_reconstruct_pil_decode():
    """Coefficient-level round trip through two independent witnesses.

    Encode a photographic corpus image (4:4:4 RealDCT: no subsampling, so
    every plane maps 1:1 to decoded pixels), then rebuild the luma plane
    from the PIPELINE's quantized coefficients with scipy's inverse DCT
    and compare against what PIL's decoder (libjpeg lineage — independent
    IDCT, independent Huffman/scan parsing) shows for the same file. If
    the pipeline's coefficients, scan layout, or container were
    systematically wrong in a way the oracle shares, PIL would disagree
    here."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    rgb = corpus.landscape(h=64, w=96)
    config = EncoderConfig(subsampling_ratio=(4, 4, 4))
    result, (y_c, _, _) = pipeline.encode_array(
        rgb, config, return_coeffs=True
    )

    img = PIL_Image.open(io.BytesIO(result.file_bytes))
    pil_y = np.asarray(img.convert("YCbCr"))[:, :, 0].astype(np.float64)

    # Dequantize + scipy IDCT + level unshift = our claim of the decoded
    # luma plane.
    geom = result.geom
    q = tables.Y_QUANT_TABLE.astype(np.float64)
    blocks = y_c.astype(np.float64).reshape(-1, 8, 8) * q[None]
    rec = scipy_fft.idctn(blocks, type=2, norm="ortho", axes=(1, 2)) + 128.0
    by = geom.padded_height // 8
    bx = geom.padded_width // 8
    plane = (
        rec.reshape(by, bx, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(by * 8, bx * 8)[: rgb.shape[0], : rgb.shape[1]]
    )
    plane = np.clip(np.round(plane), 0, 255)

    # PIL's integer IDCT vs scipy's float IDCT: small per-pixel slack, no
    # structural disagreement.
    diff = np.abs(plane - pil_y)
    assert np.max(diff) <= 3.0
    assert np.mean(diff) <= 0.75
