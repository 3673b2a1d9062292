"""CLI behavior: flags, defaults, validation (arguments.rs parity)."""

import numpy as np
import pytest

from jpeg_encoder_tpu import cli
from jpeg_encoder_tpu.io import bmp


def test_default_output_path():
    assert cli.default_output_path("photo.bmp") == "photo.jpeg"
    assert cli.default_output_path("/a/b/c.bmp") == "/a/b/c.jpeg"


def test_rejects_non_bmp_input(capsys):
    assert cli.main(["-i", "photo.png"]) == 2
    assert "must be a .bmp" in capsys.readouterr().err


def test_rejects_bad_ratio(tmp_path, capsys, rng):
    path = tmp_path / "x.bmp"
    bmp.write(path, rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8))
    assert cli.main(["-i", str(path), "-s", "4:1:1"]) == 2
    assert "ratio" in capsys.readouterr().err
    assert cli.main(["-i", str(path), "-s", "nonsense"]) == 2


def test_rejects_bad_algorithm(tmp_path, rng):
    path = tmp_path / "x.bmp"
    bmp.write(path, rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8))
    with pytest.raises(SystemExit):
        cli.main(["-i", str(path), "-d", "quantum-dct"])


def test_single_image_encode(tmp_path, rng, capsys):
    rgb = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    path = tmp_path / "img.bmp"
    bmp.write(path, rgb)
    assert cli.main(["-i", str(path), "-s", "4:2:0", "--timing"]) == 0
    out = tmp_path / "img.jpeg"
    assert out.exists()
    data = out.read_bytes()
    assert data.startswith(b"\xff\xd8") and data.endswith(b"\xff\xd9")
    stdout = capsys.readouterr().out
    assert "megapixels_per_second" in stdout
    # Reference-parity stage banners, in order (main.rs:16-67).
    banners = [
        "Loading bmp...",
        "Loaded!",
        "Chrominance downsampling...",
        "Done!",
        "Performing Discrete Cosine Transform + Quantization...",
        "Done!",
        "Entropy encoding...",
        "Done!",
        "Creating file",
        "Done!",
    ]
    pos = 0
    for banner in banners:
        found = stdout.find(banner, pos)
        assert found >= 0, f"missing banner {banner!r} after offset {pos}"
        pos = found + len(banner)


def test_batch_glob_encode(tmp_path, rng):
    for i in range(3):
        bmp.write(
            tmp_path / f"img{i}.bmp",
            rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8),
        )
    out_dir = tmp_path / "out"
    assert cli.main(
        ["-i", str(tmp_path / "*.bmp"), "-o", str(out_dir)]
    ) == 0
    for i in range(3):
        assert (out_dir / f"img{i}.jpeg").exists()


def test_tile_bands_matches_single_device(tmp_path, rng):
    """--tile-bands --devices N shards MCU bands over the mesh and must be
    byte-identical to the plain single-device encode (SURVEY §5 mesh flag)."""
    rgb = rng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8)
    path = tmp_path / "big.bmp"
    bmp.write(path, rgb)
    plain = tmp_path / "plain.jpeg"
    tiled = tmp_path / "tiled.jpeg"
    assert cli.main(["-i", str(path), "-o", str(plain)]) == 0
    assert cli.main(
        ["-i", str(path), "-o", str(tiled), "--tile-bands", "--devices", "2"]
    ) == 0
    assert tiled.read_bytes() == plain.read_bytes()


def test_dataset_mode_single_process(tmp_path, rng, capsys):
    """--dataset DIR is the CLI surface of parallel/multihost: it encodes
    everything locally in a single-process run, writes a manifest, prints
    a summary JSON line, and resumes (skips) on a rerun."""
    import json

    from jpeg_encoder_tpu import pipeline
    from jpeg_encoder_tpu.config import EncoderConfig

    src = tmp_path / "src"
    src.mkdir()
    images = {}
    for i in range(3):
        rgb = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
        bmp.write(src / f"img{i}.bmp", rgb)
        images[f"img{i}"] = rgb
    out = tmp_path / "out"
    assert cli.main(
        ["--dataset", str(src), "-o", str(out), "-s", "4:2:0", "--timing"]
    ) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["process_count"] == 1
    assert line["encoded"] == 3 and line["skipped"] == 0
    assert line["summary"]["encoded"] == 3
    assert "seconds" in line
    assert (out / "manifest-00000.json").exists()
    config = EncoderConfig(subsampling_ratio=(4, 2, 0))
    for name, rgb in images.items():
        got = (out / f"{name}.jpeg").read_bytes()
        assert got == pipeline.encode_array(rgb, config).file_bytes, name

    # Rerun: the manifest marks everything done -> all skipped.
    assert cli.main(["--dataset", str(src), "-o", str(out)]) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["encoded"] == 0 and line["skipped"] == 3

    # --no-resume forces re-encoding.
    assert cli.main(
        ["--dataset", str(src), "-o", str(out), "--no-resume"]
    ) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["encoded"] == 3 and line["skipped"] == 0


def test_dataset_mode_empty_dir(tmp_path, capsys):
    empty = tmp_path / "empty"
    empty.mkdir()
    assert cli.main(["--dataset", str(empty), "-o", str(tmp_path)]) == 1
    assert "no .bmp files" in capsys.readouterr().err


def test_requires_image_or_dataset(capsys):
    assert cli.main([]) == 2
    assert "--image or --dataset" in capsys.readouterr().err


def test_batch_devices_flag(tmp_path, rng):
    for i in range(4):
        bmp.write(
            tmp_path / f"d{i}.bmp",
            rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8),
        )
    out_dir = tmp_path / "out"
    assert cli.main(
        ["-i", str(tmp_path / "d*.bmp"), "-o", str(out_dir), "--devices", "2"]
    ) == 0
    for i in range(4):
        assert (out_dir / f"d{i}.jpeg").exists()


def test_restart_interval_flag(tmp_path, rng):
    from PIL import Image

    rgb = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    path = tmp_path / "img.bmp"
    bmp.write(path, rgb)
    plain = tmp_path / "plain.jpeg"
    marked = tmp_path / "marked.jpeg"
    assert cli.main(["-i", str(path), "-o", str(plain)]) == 0
    assert cli.main(
        ["-i", str(path), "-o", str(marked), "--restart-interval", "1"]
    ) == 0
    data = marked.read_bytes()
    assert b"\xff\xdd\x00\x04\x00\x01" in data  # DRI, interval 1
    assert b"\xff\xd0" in data  # at least one RST0
    a = np.asarray(Image.open(plain).convert("RGB"))
    b = np.asarray(Image.open(marked).convert("RGB"))
    assert np.array_equal(a, b)


def test_restart_interval_with_tile_bands(tmp_path, rng):
    """Band-tiled restart framing equals the single-device restart file."""
    rgb = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    path = tmp_path / "img.bmp"
    bmp.write(path, rgb)
    single = tmp_path / "single.jpeg"
    tiled = tmp_path / "tiled.jpeg"
    assert cli.main(
        ["-i", str(path), "-o", str(single), "--restart-interval", "2"]
    ) == 0
    assert cli.main(
        ["-i", str(path), "-o", str(tiled), "--tile-bands",
         "--restart-interval", "2"]
    ) == 0
    assert tiled.read_bytes() == single.read_bytes()


def test_dataset_mode_with_restart_interval(tmp_path, rng):
    """--dataset composes with --restart-interval (rides encode_batch)."""
    from jpeg_encoder_tpu import pipeline
    from jpeg_encoder_tpu.config import EncoderConfig

    src = tmp_path / "src"
    src.mkdir()
    rgb = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    bmp.write(src / "img.bmp", rgb)
    out = tmp_path / "out"
    assert cli.main(
        ["--dataset", str(src), "-o", str(out), "--restart-interval", "1"]
    ) == 0
    got = (out / "img.jpeg").read_bytes()
    cfg = EncoderConfig(restart_interval=1)
    assert got == pipeline.encode_array(rgb, cfg).file_bytes
    assert b"\xff\xdd" in got
