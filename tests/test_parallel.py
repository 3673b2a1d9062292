"""Sharded encode paths on a virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from jpeg_encoder_tpu import oracle, pipeline
from jpeg_encoder_tpu.config import DctAlgorithm, EncoderConfig
from jpeg_encoder_tpu.io import jfif
from jpeg_encoder_tpu.parallel import batch, mesh as mesh_lib, tiled
from jpeg_encoder_tpu.utils.bits import splice_bitstreams


@pytest.fixture(scope="module")
def mesh8():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_lib.data_mesh(8)


def test_splice_bitstreams_basic():
    # "10110" + "01" + "111111111" = 10110011 11111111 (16 bits)
    a = np.frombuffer(int("10110000", 2).to_bytes(1, "big"), np.uint8)
    b = np.frombuffer(int("01000000", 2).to_bytes(1, "big"), np.uint8)
    c = np.frombuffer(int("1111111110000000", 2).to_bytes(2, "big"), np.uint8)
    out, bits = splice_bitstreams([(a, 5), (b, 2), (c, 9)])
    assert bits == 16
    assert out == bytes([0b10110011, 0b11111111])


def test_splice_bitstreams_random_vs_bitjoin(rng):
    chunks = []
    stream = ""
    for _ in range(17):
        nbits = int(rng.integers(0, 40))
        bits = "".join(rng.choice(["0", "1"], size=nbits))
        stream += bits
        nbytes = (nbits + 7) // 8
        arr = (
            np.frombuffer(
                int(bits.ljust(nbytes * 8, "0") or "0", 2).to_bytes(
                    max(nbytes, 1), "big"
                ),
                np.uint8,
            )
            if nbits
            else np.zeros(0, np.uint8)
        )
        chunks.append((arr[:nbytes], nbits))
    out, total = splice_bitstreams(chunks)
    assert total == len(stream)
    expected_bytes = (len(stream) + 7) // 8
    expected = (
        int(stream.ljust(expected_bytes * 8, "0"), 2).to_bytes(expected_bytes, "big")
        if stream
        else b""
    )
    assert out == expected


def test_batch_encode_matches_single(mesh8, rng):
    images = rng.integers(0, 256, size=(11, 24, 32, 3), dtype=np.uint8)
    config = EncoderConfig(subsampling_ratio=(4, 2, 0))
    files = batch.encode_batch(images, config, mesh8)
    assert len(files) == 11
    for i in (0, 5, 10):
        single = pipeline.encode_array(images[i], config)
        assert files[i] == single.file_bytes


@pytest.mark.parametrize("ratio", [(4, 4, 4), (4, 2, 2), (4, 2, 0)])
def test_tiled_encode_matches_single(mesh8, ratio, rng):
    config = EncoderConfig(subsampling_ratio=ratio)
    # 8 mesh devices need mcu_rows % 8 == 0: height 128 gives 16/8 MCU rows.
    height = 128
    rgb = rng.integers(0, 256, size=(height, 48, 3), dtype=np.uint8)
    result = tiled.encode_tiled(rgb, config, mesh8)
    single = pipeline.encode_array(rgb, config)
    assert result.bit_length == single.bit_length
    assert result.file_bytes == single.file_bytes


def test_tiled_encode_unpadded_height(mesh8, rng):
    """Original height not a multiple of the band split (121 -> pad 128)."""
    config = EncoderConfig(subsampling_ratio=(4, 2, 0))
    rgb = rng.integers(0, 256, size=(121, 32, 3), dtype=np.uint8)
    result = tiled.encode_tiled(rgb, config, mesh8)
    single = pipeline.encode_array(rgb, config)
    assert result.file_bytes == single.file_bytes
    # And the golden model agrees end to end.
    golden = oracle.encode_oracle(rgb, config)
    assert result.file_bytes == jfif.assemble(golden.geom, golden.entropy_bytes)


def test_tiled_rejects_quirk_width(mesh8, rng):
    config = EncoderConfig(subsampling_ratio=(4, 2, 0))
    rgb = rng.integers(0, 256, size=(128, 17, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="quirk"):
        tiled.encode_tiled(rgb, config, mesh8)


def test_tiled_rejects_indivisible_rows(mesh8, rng):
    config = EncoderConfig(subsampling_ratio=(4, 2, 0))
    rgb = rng.integers(0, 256, size=(48, 32, 3), dtype=np.uint8)  # 3 MCU rows
    with pytest.raises(ValueError, match="divide"):
        tiled.encode_tiled(rgb, config, mesh8)


def test_encode_dataset_manifest_and_resume(tmp_path, rng):
    """Multi-host dataset sharding, degenerate single-process case: outputs,
    manifest bookkeeping, and resume-skip must all work."""
    from jpeg_encoder_tpu.config import EncoderConfig
    from jpeg_encoder_tpu.io import bmp
    from jpeg_encoder_tpu.parallel import multihost

    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()
    paths = []
    for i in range(5):
        rgb = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
        p = src / f"img{i}.bmp"
        bmp.write(p, rgb)
        paths.append(p)
    # One differently-sized image exercises the dimension grouping.
    odd = src / "odd.bmp"
    bmp.write(odd, rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8))
    paths.append(odd)

    config = EncoderConfig(subsampling_ratio=(4, 2, 0))
    res = multihost.encode_dataset(paths, str(out), config)
    assert res.encoded == 6 and res.skipped == 0
    for p in paths:
        assert (out / (p.stem + ".jpeg")).exists()
    summary = multihost.global_summary(res)
    assert summary["encoded"] == 6 and summary["processes"] == 1

    # Resume: everything already recorded -> all skipped.
    res2 = multihost.encode_dataset(paths, str(out), config)
    assert res2.encoded == 0 and res2.skipped == 6

    # Deleting one output forces just that file to re-encode.
    (out / "img3.jpeg").unlink()
    res3 = multihost.encode_dataset(paths, str(out), config)
    assert res3.encoded == 1 and res3.skipped == 5

    # Outputs are the standard pipeline bytes.
    from jpeg_encoder_tpu import pipeline

    want = pipeline.encode_array(bmp.read(paths[0]), config).file_bytes
    assert (out / "img0.jpeg").read_bytes() == want
