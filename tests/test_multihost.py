"""Real 2-process multi-host integration test (BASELINE config 5 seam).

Spawns two OS processes that rendezvous through a localhost coordinator
(`jax.distributed.initialize`), split a shared BMP directory by
process_index striding, encode their shares on their own local CPU
devices, and aggregate the final summary with a cross-process allgather.
This is the only test where parallel/multihost.py runs with
process_count == 2 — the in-suite test (test_parallel.py) covers only the
single-process degenerate case.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from jpeg_encoder_tpu import pipeline
from jpeg_encoder_tpu.config import EncoderConfig
from jpeg_encoder_tpu.io import bmp

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_encode_dataset(tmp_path, rng):
    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()
    images = {}
    for i in range(6):
        rgb = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
        bmp.write(src / f"img{i}.bmp", rgb)
        images[f"img{i}"] = rgb

    env = dict(os.environ)
    # Two virtual CPU devices per process: the local mesh is a real
    # (2-device) mesh, not the trivial one.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    env.pop("PYTHONPATH", None)

    coordinator = f"localhost:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, str(i), "2",
             str(src), str(out)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=os.path.dirname(os.path.dirname(_WORKER)),
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=570) for p in procs]
    for p, (stdout, stderr) in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker {p.args[3]} failed (rc={p.returncode}):\n"
            f"--- stdout ---\n{stdout}\n--- stderr ---\n{stderr}"
        )

    results = {}
    for i in range(2):
        with open(out / f"result-{i}.json") as f:
            results[i] = json.load(f)

    # Both processes saw the 2-process world and split the work 3/3
    # (6 files striped by process_index).
    for i in range(2):
        r = results[i]
        assert r["process_count"] == 2
        assert r["global_devices"] == 4 and r["local_devices"] == 2
        assert r["encoded"] == 3 and r["skipped"] == 0
        # The cross-process allgather aggregated both shares.
        assert r["summary"]["processes"] == 2
        assert r["summary"]["encoded"] == 6
        assert os.path.exists(out / f"manifest-{i:05d}.json")

    # Per-process manifests record disjoint strided shares.
    manifests = [
        json.load(open(out / f"manifest-{i:05d}.json"))["files"]
        for i in range(2)
    ]
    assert sorted(manifests[0]) == ["img0.jpeg", "img2.jpeg", "img4.jpeg"]
    assert sorted(manifests[1]) == ["img1.jpeg", "img3.jpeg", "img5.jpeg"]

    # Outputs are byte-identical to the single-process pipeline.
    config = EncoderConfig(subsampling_ratio=(4, 2, 0))
    for name, rgb in images.items():
        got = (out / f"{name}.jpeg").read_bytes()
        assert got == pipeline.encode_array(rgb, config).file_bytes, name

    # Phase 2 (in the workers): one image's MCU bands sharded over the
    # GLOBAL 4-device mesh spanning both processes — each worker asserted
    # byte-identity against its local single-device encode; here we check
    # both processes agree with the in-suite encode of the same seed.
    big = np.random.default_rng(123).integers(
        0, 256, size=(288, 32, 3), dtype=np.uint8
    )
    want = pipeline.encode_array(big, config)
    for i in range(2):
        assert results[i]["tiled_bytes"] == len(want.file_bytes)
        assert results[i]["tiled_bits"] == int(want.bit_length)

    # Phase 3 (in the workers): restart-framed cross-host band encode.
    want_r = pipeline.encode_array(
        big, EncoderConfig(subsampling_ratio=(4, 2, 0), restart_interval=5)
    )
    for i in range(2):
        assert results[i]["tiled_restart_bytes"] == len(want_r.file_bytes)
