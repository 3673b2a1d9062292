"""Native host runtime vs the NumPy reference implementations.

The C++ library (native/host_runtime.cpp) is built on demand by
native.load(); these tests assert byte-identical behavior between the two
paths. If the toolchain is unavailable the suite skips (the NumPy path is
covered by the rest of the suite either way).
"""

import numpy as np
import pytest

from jpeg_encoder_tpu import native
from jpeg_encoder_tpu.io import bmp, jfif
from jpeg_encoder_tpu.utils import bits


pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native host runtime unavailable"
)


def _numpy_only(monkeypatch):
    monkeypatch.setattr(native, "load", lambda: None)


def test_bmp_decode_matches_numpy(rng, monkeypatch):
    rgb = rng.integers(0, 256, size=(33, 51, 3), dtype=np.uint8)
    data = bmp.encode(rgb)
    via_native = bmp.decode(data)
    _numpy_only(monkeypatch)
    via_numpy = bmp.decode(data)
    assert np.array_equal(via_native, via_numpy)
    assert np.array_equal(via_native, rgb)


def test_bmp_encode_matches_numpy(rng, monkeypatch):
    rgb = rng.integers(0, 256, size=(21, 13, 3), dtype=np.uint8)
    via_native = bmp.encode(rgb)
    _numpy_only(monkeypatch)
    via_numpy = bmp.encode(rgb)
    assert via_native == via_numpy


def test_bmp_decode_error_paths():
    with pytest.raises(ValueError, match="magic"):
        bmp.decode(b"XX" + b"\0" * 60)
    with pytest.raises(ValueError, match="24-bit"):
        bad = bytearray(bmp.encode(np.zeros((4, 4, 3), np.uint8)))
        bad[28] = 32
        bmp.decode(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        bmp.decode(bmp.encode(np.zeros((16, 16, 3), np.uint8))[:-10])


def test_batch_loader(tmp_path, rng):
    paths = []
    want = []
    for i in range(7):
        rgb = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
        p = tmp_path / f"img{i}.bmp"
        bmp.write(p, rgb)
        paths.append(p)
        want.append(rgb)
    got = bmp.read_batch(paths, num_threads=3)
    assert np.array_equal(got, np.stack(want))


def test_batch_loader_rejects_mixed_dims(tmp_path, rng):
    a = tmp_path / "a.bmp"
    b = tmp_path / "b.bmp"
    bmp.write(a, rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8))
    bmp.write(b, rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        bmp.read_batch([a, b])


def test_stuff_bytes_matches_numpy(rng, monkeypatch):
    payload = rng.integers(0, 256, size=4096, dtype=np.uint8)
    payload[rng.integers(0, 4096, 300)] = 0xFF  # force plenty of escapes
    via_native = jfif.stuff_bytes(payload)
    _numpy_only(monkeypatch)
    via_numpy = jfif.stuff_bytes(payload)
    assert via_native == via_numpy


def test_stuff_bytes_edge_cases():
    assert jfif.stuff_bytes(np.array([], np.uint8)) == b""
    assert jfif.stuff_bytes(np.array([0xFF], np.uint8)) == b"\xff\x00"
    assert jfif.stuff_bytes(np.array([0xFF, 0xFF], np.uint8)) == (
        b"\xff\x00\xff\x00"
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_splice_matches_numpy(seed, monkeypatch):
    rng = np.random.default_rng(seed)
    chunks = []
    for _ in range(6):
        nbits = int(rng.integers(0, 200))
        nbytes = (nbits + 7) // 8
        arr = rng.integers(0, 256, size=max(nbytes, 1), dtype=np.uint8)
        if nbits % 8:
            arr[nbytes - 1] &= (0xFF << (8 - nbits % 8)) & 0xFF
        chunks.append((arr[:nbytes], nbits))
    via_native = bits.splice_bitstreams(chunks)
    _numpy_only(monkeypatch)
    via_numpy = bits.splice_bitstreams(chunks)
    assert via_native == via_numpy


def test_native_optimal_huffman_matches_python_fuzz(rng):
    """The C++ K.2 table construction must equal the Python spec exactly
    (same merge tie-breaking, K.3 fold, reserved-code removal, symbol
    order) over heavy-tailed fuzzed histograms."""
    from jpeg_encoder_tpu import native, tables

    if native.load() is None:
        pytest.skip("native runtime unavailable")
    for trial in range(80):
        n_active = int(rng.integers(1, 257))
        freq = np.zeros(256, np.int64)
        idx = rng.choice(256, n_active, replace=False)
        freq[idx] = np.maximum(
            1, (rng.pareto(0.3, n_active) * 10).astype(np.int64)
        )
        got = tables.optimal_spec(freq)       # native path
        want = tables._optimal_spec_py(freq)  # Python spec
        assert got.bits == want.bits, trial
        assert got.symbols == want.symbols, trial
