"""Table constants and canonical Huffman code generation."""

import numpy as np

from jpeg_encoder_tpu import tables


def test_zigzag_is_permutation():
    assert sorted(tables.ZIGZAG_ORDER.tolist()) == list(range(64))
    # Spot-check the standard scan (huffman_tables.rs:97-101).
    assert tables.ZIGZAG_ORDER[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert tables.ZIGZAG_ORDER[-3:].tolist() == [55, 62, 63]
    inv = tables.ZIGZAG_INVERSE
    assert np.array_equal(tables.ZIGZAG_ORDER[inv], np.arange(64))


def test_quant_tables_spot_values():
    assert tables.Y_QUANT_TABLE[0, 0] == 16
    assert tables.Y_QUANT_TABLE[7, 7] == 99
    assert tables.C_QUANT_TABLE[0, 0] == 17
    assert (tables.C_QUANT_TABLE[4:] == 99).all()


def test_huffman_bits_sum_matches_symbol_counts():
    for spec in (
        tables.Y_DC_HUFFMAN,
        tables.C_DC_HUFFMAN,
        tables.Y_AC_HUFFMAN,
        tables.C_AC_HUFFMAN,
    ):
        assert sum(spec.bits) == len(spec.symbols)


def test_canonical_codes_are_prefix_free():
    for spec in (
        tables.Y_DC_HUFFMAN,
        tables.C_DC_HUFFMAN,
        tables.Y_AC_HUFFMAN,
        tables.C_AC_HUFFMAN,
    ):
        codes = spec.codes_by_order
        lengths = spec.lengths_by_order
        seen = set()
        for code, length in zip(codes.tolist(), lengths.tolist()):
            assert code < (1 << length)
            bits = format(code, f"0{length}b")
            for prefix_len in range(1, len(bits) + 1):
                assert bits[:prefix_len] not in seen or prefix_len == len(bits)
            assert bits not in seen
            seen.add(bits)
        # no code is a prefix of another
        as_list = sorted(seen)
        for a, b in zip(as_list, as_list[1:]):
            assert not b.startswith(a)


def test_known_canonical_codes():
    # JPEG Annex K: Y DC category 0 -> code 00 (2 bits); category 2 -> 011.
    code, length = tables.Y_DC_HUFFMAN.encode_symbol(0)
    assert (code, length) == (0b00, 2)
    code, length = tables.Y_DC_HUFFMAN.encode_symbol(2)
    assert (code, length) == (0b011, 3)
    # Y AC EOB (0x00) -> 1010 (4 bits); ZRL (0xF0) -> 11111111001 (11 bits).
    assert tables.Y_AC_HUFFMAN.encode_symbol(0x00) == (0b1010, 4)
    assert tables.Y_AC_HUFFMAN.encode_symbol(0xF0) == (0b11111111001, 11)
    # Chroma AC EOB -> 00 (2 bits).
    assert tables.C_AC_HUFFMAN.encode_symbol(0x00) == (0b00, 2)


def test_luts_roundtrip():
    spec = tables.Y_AC_HUFFMAN
    for symbol in spec.symbols:
        code, length = spec.encode_symbol(symbol)
        assert spec.code_lut[symbol] == code
        assert spec.length_lut[symbol] == length
