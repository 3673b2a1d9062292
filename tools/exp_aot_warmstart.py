"""Cold-start anatomy: can a serialized executable beat the ~20-56 s warm start?

Round-3 finding (BASELINE.md): with the persistent compilation cache the
compile is skipped, yet a cold process still pays ~20-56 s before the first
encode returns. The open question is whether that residue is (a) work we
can move off the critical path — tracing/lowering, cache lookup, executable
deserialization — or (b) pure tunnel transport (loading the executable onto
the remote chip + the first execution RTT), which no client-side artifact
can remove. This tool isolates the phases. Each mode runs in a FRESH
process (python tools/exp_aot_warmstart.py <mode>):

  produce : trace+lower+compile the config-1 program (512x512, 4:2:0,
            real-dct — BASELINE config 1), serialize the COMPILED
            executable via jax.experimental.serialize_executable into
            .jax_cache/aot_c1.pkl, report per-phase seconds.
  consume : deserialize_and_load the artifact (no trace, no lower, no
            compile-cache lookup) and run twice. The deserialize+load
            phase is the executable-transfer floor; call1 minus call2 is
            the first-execution RTT.
  cached  : the production path (pipeline.compiled_encoder with the warm
            persistent cache) for comparison, same phase split.

All phase timings print as one JSON line; device timings use the
fetch-a-scalar convention (bench.py: block_until_ready is not trusted on
this platform).
"""

import json
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")

MODE = sys.argv[1] if len(sys.argv) > 1 else "cached"
ART = "/root/repo/.jax_cache/aot_c1.pkl"
H = W = 512

phases: dict[str, float] = {}
_t = time.perf_counter()


def mark(name: str) -> None:
    global _t
    now = time.perf_counter()
    phases[name] = round(now - _t, 3)
    _t = now


import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

dev = jax.devices()[0]
mark("import_and_backend_init")

rng = np.random.default_rng(7)
rgb_host = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
rgb = jax.device_put(jnp.asarray(rgb_host), dev)
rgb.block_until_ready()
mark("input_transfer")

from jpeg_encoder_tpu import pipeline  # noqa: E402
from jpeg_encoder_tpu.config import EncoderConfig  # noqa: E402

config = EncoderConfig()
geom = config.geometry(W, H)
capacity = pipeline.default_capacity_bytes(
    geom, config.capacity_bytes_per_pixel
)
mark("package_import")


def timed_call(fn, tag):
    out = fn(rgb)
    total = int(np.asarray(out["total_bits"]))  # scalar fetch = real barrier
    mark(tag)
    return total


if MODE == "produce":
    from jax.experimental import serialize_executable as se

    jitted = pipeline.compiled_encoder(
        geom, config.dct_algorithm, capacity
    )
    lowered = jitted.lower(rgb)
    mark("trace_and_lower")
    compiled = lowered.compile()
    mark("compile")  # cache-hit load if .jax_cache is warm
    payload, in_tree, out_tree = se.serialize(compiled)
    with open(ART, "wb") as f:
        pickle.dump((payload, in_tree, out_tree), f)
    mark("serialize_and_write")
    timed_call(compiled, "call1")
    timed_call(compiled, "call2")
    phases["artifact_bytes"] = os.path.getsize(ART)
elif MODE == "consume":
    from jax.experimental import serialize_executable as se

    with open(ART, "rb") as f:
        payload, in_tree, out_tree = pickle.load(f)
    mark("read_artifact")
    compiled = se.deserialize_and_load(payload, in_tree, out_tree)
    mark("deserialize_and_load")
    timed_call(compiled, "call1")
    timed_call(compiled, "call2")
elif MODE == "cached":
    jitted = pipeline.compiled_encoder(
        geom, config.dct_algorithm, capacity
    )
    timed_call(jitted, "call1")  # trace+lower+cachehit+load+run
    timed_call(jitted, "call2")
else:
    raise SystemExit(f"unknown mode {MODE}")

phases["mode"] = MODE
phases["total_s"] = round(sum(v for v in phases.values()
                              if isinstance(v, float)), 3)
print(json.dumps(phases))
