"""Device entropy coding vs the oracle: bit-exact payloads."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jpeg_encoder_tpu import oracle
from jpeg_encoder_tpu.config import EncoderConfig
from jpeg_encoder_tpu.ops import entropy


@functools.lru_cache(maxsize=64)
def _jitted_encode_scan(geom, capacity):
    return jax.jit(
        lambda y, cb, cr: entropy.encode_scan(y, cb, cr, geom, capacity)
    )


def _device_payload(y, cb, cr, geom):
    capacity = ((geom.num_scan_entries * 220) + 3) // 4 * 4
    payload, bits = _jitted_encode_scan(geom, capacity)(
        jnp.asarray(y.reshape(-1, 64)),
        jnp.asarray(cb.reshape(-1, 64)),
        jnp.asarray(cr.reshape(-1, 64)),
    )
    bits = int(bits)
    return np.asarray(payload)[: (bits + 7) // 8].tobytes(), bits


def _oracle_payload(y, cb, cr, geom):
    return oracle.entropy_encode(
        y.reshape(-1, 8, 8), cb.reshape(-1, 8, 8), cr.reshape(-1, 8, 8), geom
    )


def _check(y, cb, cr, geom):
    got, got_bits = _device_payload(y, cb, cr, geom)
    want, want_bits = _oracle_payload(y, cb, cr, geom)
    assert got_bits == want_bits
    assert got == want


def test_all_zero_blocks():
    geom = EncoderConfig(subsampling_ratio=(4, 4, 4)).geometry(16, 16)
    z = np.zeros((4, 64), np.int16)
    _check(z, z, z, geom)


def test_single_block_known_values():
    geom = EncoderConfig(subsampling_ratio=(4, 4, 4)).geometry(8, 8)
    y = np.zeros((1, 64), np.int16)
    y[0, :8] = [-26, -3, 1, -2, 0, 0, 5, 0]  # natural-order row 0
    c = np.zeros((1, 64), np.int16)
    _check(y, c, c, geom)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("ratio", [(4, 4, 4), (4, 2, 2), (4, 2, 0)])
def test_random_small_coefficients(ratio, seed):
    """Dense small coefficients: exercises DC chains and short runs."""
    rng = np.random.default_rng(seed)
    geom = EncoderConfig(subsampling_ratio=ratio).geometry(32, 48)
    y = rng.integers(-4, 5, size=(geom.num_luma_blocks, 64)).astype(np.int16)
    cb = rng.integers(-4, 5, size=(geom.num_chroma_blocks, 64)).astype(np.int16)
    cr = rng.integers(-4, 5, size=(geom.num_chroma_blocks, 64)).astype(np.int16)
    _check(y, cb, cr, geom)


@pytest.mark.parametrize("ratio", [(4, 4, 4), (4, 2, 2), (4, 2, 0)])
def test_sparse_coefficients_long_runs(ratio):
    """Sparse coefficients: exercises ZRL insertion (runs >= 16, 32, 48)."""
    rng = np.random.default_rng(7)
    geom = EncoderConfig(subsampling_ratio=ratio).geometry(40, 24)
    def sparse(n):
        coeffs = np.zeros((n, 64), np.int16)
        mask = rng.random((n, 64)) < 0.04
        coeffs[mask] = rng.integers(-100, 101, size=int(mask.sum()))
        return coeffs
    _check(sparse(geom.num_luma_blocks),
           sparse(geom.num_chroma_blocks),
           sparse(geom.num_chroma_blocks), geom)


def test_exactly_16_zero_run_then_nonzero():
    """Z == 16 must emit one ZRL then a zero-run-0 symbol."""
    geom = EncoderConfig(subsampling_ratio=(4, 4, 4)).geometry(8, 8)
    from jpeg_encoder_tpu import tables
    y = np.zeros((1, 64), np.int16)
    zz_coeffs = np.zeros(64, np.int16)
    zz_coeffs[17] = 3  # zigzag position 17: preceded by 16 zeros
    y[0, tables.ZIGZAG_ORDER] = zz_coeffs
    c = np.zeros((1, 64), np.int16)
    _check(y, c, c, geom)


def test_trailing_run_of_exactly_48_zeros_no_zrl():
    """Trailing zeros emit only EOB, never ZRL."""
    geom = EncoderConfig(subsampling_ratio=(4, 4, 4)).geometry(8, 8)
    from jpeg_encoder_tpu import tables
    y = np.zeros((1, 64), np.int16)
    zz_coeffs = np.zeros(64, np.int16)
    zz_coeffs[15] = -7
    y[0, tables.ZIGZAG_ORDER] = zz_coeffs
    c = np.zeros((1, 64), np.int16)
    _check(y, c, c, geom)


def test_last_zigzag_coefficient_nonzero_no_eob():
    geom = EncoderConfig(subsampling_ratio=(4, 4, 4)).geometry(8, 8)
    from jpeg_encoder_tpu import tables
    y = np.zeros((1, 64), np.int16)
    zz_coeffs = np.zeros(64, np.int16)
    zz_coeffs[63] = 1  # run of 62 zeros (3 ZRLs + run 14), then no EOB
    y[0, tables.ZIGZAG_ORDER] = zz_coeffs
    c = np.zeros((1, 64), np.int16)
    _check(y, c, c, geom)


def test_negative_dc_and_amplitudes():
    geom = EncoderConfig(subsampling_ratio=(4, 4, 4)).geometry(16, 8)
    y = np.zeros((2, 64), np.int16)
    y[0, 0] = -1024  # DC category 11 boundary
    y[1, 0] = 1023   # diff = 2047, category 11
    c = np.zeros((2, 64), np.int16)
    _check(y, c, c, geom)


def test_quirk_width_17_mcu_alignment():
    """width % 16 == 1 at 4:2:0: luma superblock grid > chroma grid."""
    rng = np.random.default_rng(3)
    geom = EncoderConfig(subsampling_ratio=(4, 2, 0)).geometry(17, 16)
    y = rng.integers(-6, 7, size=(geom.num_luma_blocks, 64)).astype(np.int16)
    cb = rng.integers(-6, 7, size=(geom.num_chroma_blocks, 64)).astype(np.int16)
    cr = rng.integers(-6, 7, size=(geom.num_chroma_blocks, 64)).astype(np.int16)
    _check(y, cb, cr, geom)


def test_pack_bits_word_boundary_spans():
    """Codes that straddle u32 word boundaries pack correctly."""
    # 5 slots of 27 bits: offsets 0, 27, 54, 81, 108 — spans everywhere.
    bits = jnp.asarray(
        np.array([0x7FFFFFF, 0x5555555, 0x2AAAAAA, 0x7FFFFFF, 0x1234567],
                 dtype=np.uint32)
    )
    lens = jnp.asarray(np.full(5, 27, dtype=np.int32))
    payload, total = entropy.pack_bits(bits, lens, 32)
    assert int(total) == 135
    got = np.asarray(payload)
    stream = "".join(
        format(v, "027b")
        for v in (0x7FFFFFF, 0x5555555, 0x2AAAAAA, 0x7FFFFFF, 0x1234567)
    )
    expected = np.frombuffer(
        int(stream.ljust(32 * 8, "0"), 2).to_bytes(32, "big"), dtype=np.uint8
    )
    assert np.array_equal(got, expected)


def test_pallas_packer_matches_xla(rng):
    """The sequential Pallas assembly kernel (interpret mode on CPU) must
    produce the identical payload to the gather-based XLA packer."""
    import jax.numpy as jnp

    from jpeg_encoder_tpu.config import EncoderConfig

    geom = EncoderConfig(subsampling_ratio=(4, 2, 0)).geometry(48, 32)
    y = rng.integers(-80, 80, (geom.num_luma_blocks, 64)).astype(np.int16)
    cb = rng.integers(-40, 40, (geom.num_chroma_blocks, 64)).astype(np.int16)
    cr = rng.integers(-40, 40, (geom.num_chroma_blocks, 64)).astype(np.int16)
    for a in (y, cb, cr):
        a[:, 20:] = np.where(rng.random(a[:, 20:].shape) < 0.9, 0, a[:, 20:])
    cap = 1 << 14
    p1, b1 = entropy.encode_scan(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), geom, cap,
        packer="xla",
    )
    p2, b2 = entropy.encode_scan(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), geom, cap,
        packer="pallas_interpret",
    )
    assert int(b1) == int(b2)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))


@pytest.mark.parametrize("ratio", [(4, 4, 4), (4, 2, 2), (4, 2, 0)])
def test_fused_entropy_kernel_matches_xla(ratio, rng):
    """The fused entropy kernel (interpret mode on CPU) must produce the
    identical payload and bit count to the XLA symbolize+pack path."""
    import jax.numpy as jnp

    from jpeg_encoder_tpu.config import EncoderConfig

    geom = EncoderConfig(subsampling_ratio=ratio).geometry(48, 32)
    y = rng.integers(-1000, 1000, (geom.num_luma_blocks, 64)).astype(np.int16)
    cb = rng.integers(-100, 100, (geom.num_chroma_blocks, 64)).astype(np.int16)
    cr = rng.integers(-100, 100, (geom.num_chroma_blocks, 64)).astype(np.int16)
    for a in (y, cb, cr):
        a[:, 10:] = np.where(rng.random(a[:, 10:].shape) < 0.85, 0, a[:, 10:])
    cap = 1 << 14
    p1, b1 = entropy.encode_scan(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), geom, cap,
        packer="xla",
    )
    p2, b2 = entropy.encode_scan(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), geom, cap,
        packer="fused_interpret",
    )
    assert int(b1) == int(b2)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))


def test_fused_entropy_kernel_respects_init_dc(rng):
    """Cross-shard DC chaining (init_dc) must flow through the fused path."""
    import jax.numpy as jnp

    from jpeg_encoder_tpu.config import EncoderConfig

    geom = EncoderConfig(subsampling_ratio=(4, 4, 4)).geometry(16, 16)
    y = rng.integers(-50, 50, (geom.num_luma_blocks, 64)).astype(np.int16)
    cb = rng.integers(-50, 50, (geom.num_chroma_blocks, 64)).astype(np.int16)
    cr = rng.integers(-50, 50, (geom.num_chroma_blocks, 64)).astype(np.int16)
    init = jnp.asarray([7, -3, 11], jnp.int32)
    cap = 1 << 12
    p1, b1 = entropy.encode_scan(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), geom, cap,
        init_dc=init, packer="xla",
    )
    p2, b2 = entropy.encode_scan(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), geom, cap,
        init_dc=init, packer="fused_interpret",
    )
    assert int(b1) == int(b2)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))


def test_fused_kernel_under_vmap(rng):
    """Batching the fused kernel with vmap must equal per-image encodes
    (guards the grid-axis/program_id assumptions the kernel relies on)."""
    import jax
    import jax.numpy as jnp

    from jpeg_encoder_tpu.config import EncoderConfig

    geom = EncoderConfig(subsampling_ratio=(4, 4, 4)).geometry(16, 16)
    batch_y = rng.integers(-60, 60, (2, geom.num_luma_blocks, 64)).astype(np.int16)
    batch_cb = rng.integers(-60, 60, (2, geom.num_chroma_blocks, 64)).astype(np.int16)
    batch_cr = rng.integers(-60, 60, (2, geom.num_chroma_blocks, 64)).astype(np.int16)
    cap = 1 << 12

    def one(a, b, c):
        return entropy.encode_scan(a, b, c, geom, cap, packer="fused_interpret")

    pv, bv = jax.vmap(one)(
        jnp.asarray(batch_y), jnp.asarray(batch_cb), jnp.asarray(batch_cr)
    )
    for i in range(2):
        p1, b1 = one(
            jnp.asarray(batch_y[i]), jnp.asarray(batch_cb[i]),
            jnp.asarray(batch_cr[i]),
        )
        assert int(bv[i]) == int(b1)
        assert np.array_equal(np.asarray(pv[i]), np.asarray(p1))


def test_fused_kernel_fallback_assembly_identical(rng):
    """The sequential fallback assembly (tiles denser than the matmul row
    window) must be byte-identical to the matmul path."""
    import jax.numpy as jnp

    from jpeg_encoder_tpu.config import EncoderConfig
    from jpeg_encoder_tpu.kernels import entropy_pallas

    geom = EncoderConfig(subsampling_ratio=(4, 2, 0)).geometry(64, 32)
    e = geom.num_scan_entries
    z = rng.integers(-200, 200, (e, 64)).astype(np.int16)
    z[:, 6:] = np.where(rng.random(z[:, 6:].shape) < 0.8, 0, z[:, 6:])
    cap = 1 << 14
    w1, b1 = entropy_pallas.encode_entropy_fused(
        jnp.asarray(z), geom, cap, interpret=True)
    w2, b2 = entropy_pallas.encode_entropy_fused(
        jnp.asarray(z), geom, cap, interpret=True, force_fallback=True)
    assert int(b1) == int(b2)
    assert np.array_equal(np.asarray(w1), np.asarray(w2))


@pytest.mark.parametrize("ratio", [(4, 4, 4), (4, 2, 2), (4, 2, 0)])
def test_fused_kernel_dc_modes_identical(ratio, rng):
    """dc_in_kernel=True (raw DC, kernel differences) and =False (XLA
    merges precomputed diffs into slot 0) must be byte-identical — the
    pipeline picks per ratio on emission-quality grounds only."""
    import jax.numpy as jnp

    from jpeg_encoder_tpu.config import EncoderConfig
    from jpeg_encoder_tpu.kernels import entropy_pallas
    from jpeg_encoder_tpu.ops import entropy

    geom = EncoderConfig(subsampling_ratio=ratio).geometry(80, 48)
    y = rng.integers(-300, 300, (geom.num_luma_blocks, 64)).astype(np.int16)
    cb = rng.integers(-300, 300, (geom.num_chroma_blocks, 64)).astype(np.int16)
    cr = rng.integers(-300, 300, (geom.num_chroma_blocks, 64)).astype(np.int16)
    init = jnp.asarray([7, -3, 11], jnp.int32)
    z, diff = entropy.marshal_scan_inputs(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), geom, init,
        coeffs_zigzagged=True, want_diff=True,
    )
    cap = 1 << 15
    w1, b1 = entropy_pallas.encode_entropy_fused(
        z, geom, cap, init_dc=init, interpret=True, dc_in_kernel=True)
    w2, b2 = entropy_pallas.encode_entropy_fused(
        z, geom, cap, interpret=True, dc_in_kernel=False, dc_diff=diff)
    assert int(b1) == int(b2)
    assert np.array_equal(np.asarray(w1), np.asarray(w2))


def test_fused_kernel_runtime_fallback_trigger(rng):
    """A dense scan must TRIP the runtime density check (rows_loc shrunk so
    real content overflows the matmul window) and still produce the exact
    bytes of the default path — covering the in-kernel branch select, not
    just the force_fallback compile-time variant."""
    import jax.numpy as jnp

    from jpeg_encoder_tpu.config import EncoderConfig
    from jpeg_encoder_tpu.kernels import entropy_pallas

    geom = EncoderConfig(subsampling_ratio=(4, 2, 0)).geometry(64, 32)
    e = geom.num_scan_entries
    # Dense coefficients: every slot nonzero -> hundreds of bits/entry,
    # far above the 8 * 4096 bits a rows_loc=8 window holds per tile.
    z = rng.integers(1, 200, (e, 64)).astype(np.int16)
    cap = 1 << 16
    w1, b1 = entropy_pallas.encode_entropy_fused(
        jnp.asarray(z), geom, cap, interpret=True)
    w2, b2 = entropy_pallas.encode_entropy_fused(
        jnp.asarray(z), geom, cap, interpret=True, rows_loc=8)
    assert int(b1) == int(b2)
    assert np.array_equal(np.asarray(w1), np.asarray(w2))


@pytest.mark.parametrize("ratio", [(4, 2, 0), (4, 4, 4)])
def test_fused_kernel_live_entries_masking(ratio, rng):
    """live_entries (uneven MCU-band sharding) must mask the dead scan
    suffix in the fused kernel exactly like the XLA packer: identical
    payload/bits, and insensitive to the garbage in the dead entries."""
    import jax.numpy as jnp

    from jpeg_encoder_tpu.config import EncoderConfig

    geom = EncoderConfig(subsampling_ratio=ratio).geometry(48, 48)
    y = rng.integers(-300, 300, (geom.num_luma_blocks, 64)).astype(np.int16)
    cb = rng.integers(-80, 80, (geom.num_chroma_blocks, 64)).astype(np.int16)
    cr = rng.integers(-80, 80, (geom.num_chroma_blocks, 64)).astype(np.int16)
    for a in (y, cb, cr):
        a[:, 8:] = np.where(rng.random(a[:, 8:].shape) < 0.85, 0, a[:, 8:])
    cap = 1 << 14
    # One full MCU row dead at the end (entries are MCU-major, so the dead
    # suffix is exactly the last row's entries).
    live = jnp.asarray(
        (geom.mcu_rows - 1) * geom.mcu_cols * geom.blocks_per_mcu, jnp.int32
    )
    args = (jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), geom, cap)
    p_xla, b_xla = entropy.encode_scan(*args, packer="xla", live_entries=live)
    p_fused, b_fused = entropy.encode_scan(
        *args, packer="fused_interpret", live_entries=live
    )
    assert int(b_xla) == int(b_fused)
    assert np.array_equal(np.asarray(p_xla), np.asarray(p_fused))

    # Different garbage in the dead suffix must not change a single byte.
    y2, cb2, cr2 = y.copy(), cb.copy(), cr.copy()
    last_mcu_luma = geom.h_factor * geom.v_factor * geom.mcu_cols
    y2[-last_mcu_luma:] = rng.integers(-999, 999, (last_mcu_luma, 64))
    cb2[-geom.mcu_cols:] = rng.integers(-999, 999, (geom.mcu_cols, 64))
    cr2[-geom.mcu_cols:] = rng.integers(-999, 999, (geom.mcu_cols, 64))
    p3, b3 = entropy.encode_scan(
        jnp.asarray(y2), jnp.asarray(cb2), jnp.asarray(cr2), geom, cap,
        packer="fused_interpret", live_entries=live,
    )
    assert int(b3) == int(b_fused)
    assert np.array_equal(np.asarray(p3), np.asarray(p_fused))
