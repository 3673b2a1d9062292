"""Pallas kernel parity: fused DCT kernels vs the ops/oracle formulations.

On the CPU test backend the kernels run in interpret mode; the same code
compiles for TPU (exercised by bench.py and the driver's compile check).
"""

import numpy as np
import pytest

from jpeg_encoder_tpu import oracle, pipeline, tables
from jpeg_encoder_tpu.config import DctAlgorithm, EncoderConfig
from jpeg_encoder_tpu.io import jfif
from jpeg_encoder_tpu.kernels import dct_pallas
from jpeg_encoder_tpu.ops import dct, sample


@pytest.mark.parametrize("is_luma", [True, False])
def test_realdct_kernel_matches_ordered_ops(is_luma, rng):
    blocks = rng.integers(0, 256, size=(70, 64), dtype=np.uint8)
    quant = tables.Y_QUANT_TABLE if is_luma else tables.C_QUANT_TABLE
    want = np.asarray(
        dct.dct_quantize(blocks, quant, DctAlgorithm.REAL_DCT, False)
    )
    got_zz = np.asarray(
        dct_pallas.real_dct_quant_zigzag_pallas(blocks, is_luma, interpret=True)
    )
    got = got_zz[:, np.argsort(tables.ZIGZAG_ORDER)]
    assert np.array_equal(got, want.astype(np.int32))


@pytest.mark.parametrize("is_luma", [True, False])
def test_bindct_kernel_matches_ops(is_luma, rng):
    blocks = rng.integers(0, 256, size=(70, 64), dtype=np.uint8)
    quant = tables.Y_QUANT_TABLE if is_luma else tables.C_QUANT_TABLE
    want = np.asarray(
        dct.dct_quantize(blocks, quant, DctAlgorithm.BIN_DCT, False)
    )
    got_zz = np.asarray(
        dct_pallas.bin_dct_quant_zigzag_pallas(blocks, is_luma, interpret=True)
    )
    got = got_zz[:, np.argsort(tables.ZIGZAG_ORDER)]
    assert np.array_equal(got, want.astype(np.int32))


@pytest.mark.parametrize(
    "algorithm", [DctAlgorithm.REAL_DCT, DctAlgorithm.BIN_DCT]
)
def test_legacy_kernels_match_oracle_coefficients(algorithm, rng):
    """The retired per-plane kernels stay a live verification tier: their
    zigzag coefficients must equal the golden model's on every plane (the
    production path no longer dispatches them — pipeline.encode_core runs
    the transposed 3-plane kernels only)."""
    rgb = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    config = EncoderConfig(
        subsampling_ratio=(4, 2, 0), dct_algorithm=algorithm
    )
    geom = config.geometry(40, 24)
    golden = oracle.encode_oracle(rgb, config)
    y, cb, cr = oracle.build_padded_planes(rgb, geom)
    cb = oracle.subsample_plane(cb, geom)
    cr = oracle.subsample_plane(cr, geom)
    if algorithm == DctAlgorithm.REAL_DCT:
        kernel = dct_pallas.real_dct_quant_zigzag_pallas
    else:
        kernel = dct_pallas.bin_dct_quant_zigzag_pallas
    inv_zz = np.argsort(tables.ZIGZAG_ORDER)
    for golden_coeffs, plane, is_luma in (
        (golden.y_coeffs, y, True),
        (golden.cb_coeffs, cb, False),
        (golden.cr_coeffs, cr, False),
    ):
        blocks = np.asarray(sample.blockify(np.asarray(plane)))
        got = np.asarray(kernel(blocks, is_luma, interpret=True))[:, inv_zz]
        assert np.array_equal(
            got.astype(np.int16), golden_coeffs.reshape(-1, 64)
        )


@pytest.mark.parametrize("transposed", ["kernel", "xla"])
def test_transposed_chain_dct_matches_reference_kernel(transposed, rng):
    """Both transposed-chain forms must be bit-identical to the (N, 64)
    Pallas RealDCT (itself oracle-verified): same per-lane arithmetic in
    the reference association order, only the layout differs."""
    import jax.numpy as jnp

    blocks = rng.integers(0, 256, (700, 64), dtype=np.uint8)
    for is_luma in (True, False):
        want = dct_pallas.real_dct_quant_zigzag_pallas(
            jnp.asarray(blocks), is_luma, interpret=True
        )
        got = dct_pallas.real_dct_quant_zigzag_pallas_t(
            jnp.asarray(blocks), is_luma, interpret=True,
            transposed=transposed,
        )
        assert np.array_equal(np.asarray(want), np.asarray(got))


def test_transposed_planes_dct_matches_ops_fusion(rng):
    """The 3-plane transposed-chain kernel must be bit-identical to
    ops/dct.dct_quantize_planes (the shipping RealDCT default path),
    including the per-lane luma/chroma quant select."""
    import jax.numpy as jnp

    yp = jnp.asarray(rng.integers(0, 256, (240, 160), dtype=np.uint8))
    cbp = jnp.asarray(rng.integers(0, 256, (120, 80), dtype=np.uint8))
    crp = jnp.asarray(rng.integers(0, 256, (120, 80), dtype=np.uint8))
    want = dct.dct_quantize_planes(
        sample.blockify(yp), sample.blockify(cbp), sample.blockify(crp),
        DctAlgorithm.REAL_DCT, zigzag_out=True,
    )[:3]
    got = dct_pallas.real_dct_quant_planes_zigzag_pallas_t(
        yp, cbp, crp, interpret=True
    )
    for w, g in zip(want, got):
        assert w.dtype == g.dtype == jnp.int16
        assert np.array_equal(np.asarray(w), np.asarray(g))


def test_transposed_planes_fast_dct_matches_ops_fast(rng):
    """The MXU matmul body behind --fast-dct (fast=True) must match the
    XLA Kronecker-matmul fast path (ops/dct.real_dct_quant): same matrix,
    same HIGHEST-precision contraction, same trunc-divide — the layouts
    are the only difference. Exact on the CPU backend; the hardware MXU
    may round ties differently from the exact path (the documented
    --fast-dct contract), which is why the assertion also admits a +-1
    quantized-coefficient tolerance rather than requiring bit identity."""
    import jax.numpy as jnp

    for shapes in (((240, 160), (120, 80)), ((80, 80), (80, 80))):
        yp = jnp.asarray(rng.integers(0, 256, shapes[0], dtype=np.uint8))
        cbp = jnp.asarray(rng.integers(0, 256, shapes[1], dtype=np.uint8))
        crp = jnp.asarray(rng.integers(0, 256, shapes[1], dtype=np.uint8))
        want = dct.dct_quantize_planes(
            sample.blockify(yp), sample.blockify(cbp), sample.blockify(crp),
            DctAlgorithm.REAL_DCT, fast_dct=True, zigzag_out=True,
        )[:3]
        got = dct_pallas.real_dct_quant_planes_zigzag_pallas_t(
            yp, cbp, crp, interpret=True, fast=True
        )
        for w, g in zip(want, got):
            assert g.dtype == jnp.int16
            d = np.abs(
                np.asarray(w, np.int32) - np.asarray(g, np.int32)
            )
            assert d.max() <= 1 and (d > 0).mean() < 1e-3


def test_transposed_planes_fast_dct_output_forms_agree(rng):
    """Both output forms of the fast kernel run the identical matmul, so
    they must be bit-identical to each other at either geometry."""
    import jax.numpy as jnp

    for shapes in (((240, 160), (120, 80)), ((80, 80), (80, 80))):
        yp = jnp.asarray(rng.integers(0, 256, shapes[0], dtype=np.uint8))
        cbp = jnp.asarray(rng.integers(0, 256, shapes[1], dtype=np.uint8))
        crp = jnp.asarray(rng.integers(0, 256, shapes[1], dtype=np.uint8))
        rows = dct_pallas.real_dct_quant_planes_zigzag_pallas_t(
            yp, cbp, crp, interpret=True, fast=True, out_rows=True
        )
        cols = dct_pallas.real_dct_quant_planes_zigzag_pallas_t(
            yp, cbp, crp, interpret=True, fast=True, out_rows=False
        )
        for r, c in zip(rows, cols):
            assert np.array_equal(np.asarray(r), np.asarray(c))


def test_transposed_planes_output_forms_agree(rng):
    """The kernels pick their output form by geometry (in-kernel
    transposed rows when chroma is subsampled, cols + XLA .T at 4:4:4);
    both forms must be bit-identical for either kernel at either
    geometry."""
    import jax.numpy as jnp

    for shapes in (((240, 160), (120, 80)), ((80, 80), (80, 80))):
        yp = jnp.asarray(rng.integers(0, 256, shapes[0], dtype=np.uint8))
        cbp = jnp.asarray(rng.integers(0, 256, shapes[1], dtype=np.uint8))
        crp = jnp.asarray(rng.integers(0, 256, shapes[1], dtype=np.uint8))
        for fn in (
            dct_pallas.real_dct_quant_planes_zigzag_pallas_t,
            dct_pallas.bin_dct_quant_planes_zigzag_pallas_t,
        ):
            rows = fn(yp, cbp, crp, interpret=True, out_rows=True)
            cols = fn(yp, cbp, crp, interpret=True, out_rows=False)
            for r, c in zip(rows, cols):
                assert np.array_equal(np.asarray(r), np.asarray(c))


@pytest.mark.slow
def test_transposed_dct_config_end_to_end(rng):
    """EncoderConfig(transposed_dct=True) must produce byte-identical files
    to the default path (any geometry, with and without quality scaling)."""
    for q in (None, 80):
        rgb = rng.integers(0, 256, size=(33, 49, 3), dtype=np.uint8)
        base = pipeline.encode_array(rgb, EncoderConfig(quality=q))
        t = pipeline.encode_array(
            rgb, EncoderConfig(quality=q, transposed_dct=True)
        )
        assert base.file_bytes == t.file_bytes


def test_transposed_planes_bindct_matches_ops(rng):
    """The 3-plane transposed binDCT kernel (register-resident lifting)
    must be bit-identical to ops/dct.dct_quantize_planes on the
    bug-parity binDCT path, including the per-lane quant select and the
    zigzag assembly order."""
    import jax.numpy as jnp

    yp = jnp.asarray(rng.integers(0, 256, (240, 160), dtype=np.uint8))
    cbp = jnp.asarray(rng.integers(0, 256, (120, 80), dtype=np.uint8))
    crp = jnp.asarray(rng.integers(0, 256, (120, 80), dtype=np.uint8))
    for q in (None, 35):
        want = dct.dct_quantize_planes(
            sample.blockify(yp), sample.blockify(cbp), sample.blockify(crp),
            DctAlgorithm.BIN_DCT, zigzag_out=True, quality=q,
        )[:3]
        got = dct_pallas.bin_dct_quant_planes_zigzag_pallas_t(
            yp, cbp, crp, interpret=True, quality=q
        )
        for w, g in zip(want, got):
            assert np.array_equal(
                np.asarray(w).astype(np.int32), np.asarray(g).astype(np.int32)
            )


def test_transposed_planes_bindct_descale_matches_ops(rng):
    """The descale=True variant of the transposed binDCT kernel (corrected
    binDCT-C: f32 gain fold + f32 quant divide) must be bit-identical to
    ops/dct.dct_quantize_planes(bin_dct_descale=True)."""
    import jax.numpy as jnp

    yp = jnp.asarray(rng.integers(0, 256, (240, 160), dtype=np.uint8))
    cbp = jnp.asarray(rng.integers(0, 256, (120, 80), dtype=np.uint8))
    crp = jnp.asarray(rng.integers(0, 256, (120, 80), dtype=np.uint8))
    for q in (None, 35):
        want = dct.dct_quantize_planes(
            sample.blockify(yp), sample.blockify(cbp), sample.blockify(crp),
            DctAlgorithm.BIN_DCT, zigzag_out=True, quality=q,
            bin_dct_descale=True,
        )[:3]
        got = dct_pallas.bin_dct_quant_planes_zigzag_pallas_t(
            yp, cbp, crp, interpret=True, quality=q, descale=True
        )
        for w, g in zip(want, got):
            assert np.array_equal(np.asarray(w), np.asarray(g))


def test_bindct_descale_pipeline_end_to_end(rng):
    """EncoderConfig(bin_dct_descale=True) routes through the transposed
    Pallas kernel when transposed_dct=True and must stay byte-identical to
    the XLA descale path (transposed_dct=False)."""
    rgb = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    cfg = dict(
        dct_algorithm=DctAlgorithm.BIN_DCT, bin_dct_descale=True,
        subsampling_ratio=(4, 2, 0),
    )
    base = pipeline.encode_array(
        rgb, EncoderConfig(**cfg, transposed_dct=False)
    )
    t = pipeline.encode_array(rgb, EncoderConfig(**cfg, transposed_dct=True))
    assert base.file_bytes == t.file_bytes


@pytest.mark.slow
def test_transposed_dct_config_end_to_end_bindct(rng):
    """transposed_dct=True with BIN_DCT routes through the transposed
    lifting kernel and must stay byte-identical to the default path."""
    rgb = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    base = pipeline.encode_array(
        rgb, EncoderConfig(dct_algorithm=DctAlgorithm.BIN_DCT)
    )
    t = pipeline.encode_array(
        rgb,
        EncoderConfig(dct_algorithm=DctAlgorithm.BIN_DCT, transposed_dct=True),
    )
    assert base.file_bytes == t.file_bytes
