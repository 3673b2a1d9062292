"""Pallas bitstream assembly: OR per-entry packed words into one output buffer.

NOTE: the hot path now uses kernels/entropy_pallas.py, which fuses
symbolization and per-entry packing with this same assembly scheme in one
kernel. This standalone kernel remains as the middle verification tier
(ops/entropy.encode_scan packer="pallas"): XLA symbolization + Pallas
assembly, byte-identical to both the XLA and fused paths.

The XLA packer's output-centric assembly (ops/entropy.pack_entries level 2)
costs one searchsorted plus ~10 gather rounds over every capacity word —
gathers serialize on TPU, and profiling showed this stage dominating the
whole encode. This kernel exploits the one TPU property XLA cannot express:
grid steps execute *sequentially* on a core, so read-modify-write of a
VMEM-resident output at dynamic offsets is race-free. Each entry's
(ENTRY_WORDS,) packed buffer is bit-shifted, placed at its lane offset with
a dynamic circular roll, and OR'd into a (rows, 128) output via a
sublane-dynamic two-row window — no gathers, no scatters, cost proportional
to entries instead of capacity.

Layout notes (all verified against Mosaic's lowering rules):
- the output lives as (num_words/128 + 1, 128) u32 so the dynamic-start
  window slices the *sublane* dimension (cheap) and lane placement uses
  pltpu.roll (jnp.roll semantics: element i -> i + shift);
- the out block has a constant index map, staying resident in VMEM across
  all grid steps; it is zeroed in-kernel at step 0 (out blocks start
  undefined — input/output aliasing does NOT populate them);
- pl.program_id(0) still addresses this kernel's grid axis under vmap
  (verified), so batching the encode pipeline over images works;
- every operand keeps its last two block dims (8/128-divisible or
  full-dim) so the vmap-inserted squeezed batch dim stays legal.

The output block (capacity words) is VMEM-resident, so capacity is bounded
by MAX_VMEM_CAPACITY; the content-estimate capacity ladder
(pipeline.default_capacity_bytes) keeps real encodes far below that, and
ops/entropy.pack_entries remains the fallback for oversized buffers and
non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Entries per grid step: one (TILE, ENTRY_WORDS) u32 input block each step.
TILE = 256

# VMEM budget for the resident output buffer (bytes). Above this the caller
# must use the XLA fallback packer.
MAX_VMEM_CAPACITY = 10 * 1024 * 1024


def _assemble_kernel(ew_ref, offs_ref, out_ref, *, tile, ew):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(i, _):
        off = offs_ref[i, 0]
        q = off >> 5          # word offset in the flat output stream
        s = (off & 31).astype(jnp.uint32)
        r = q >> 7            # output row
        l = q & 127           # lane within the row
        words = ew_ref[i, :].reshape(1, ew)
        w128 = jnp.pad(words, ((0, 0), (0, 128 - ew)))
        # Bit-align: word k contributes its top bits to flat word q+k and
        # spills the rest into q+k+1 (roll by one lane).
        spill = jnp.where(s == 0, jnp.uint32(0), w128 << (32 - s))
        c = (w128 >> s) | pltpu.roll(spill, 1, 1)
        # Lane placement: flat position q+k = (row r, lane l+k), wrapping
        # into row r+1. A circular roll by l puts lanes >= l in row r and
        # the wrapped lanes < l in row r+1 (c is zero past ew+1 <= 128).
        rolled = pltpu.roll(c, l, 1)
        contrib = jnp.concatenate(
            [jnp.where(lane >= l, rolled, 0), jnp.where(lane < l, rolled, 0)],
            axis=0,
        )  # (2, 128)
        cur = out_ref[pl.ds(r, 2), :]
        out_ref[pl.ds(r, 2), :] = cur | contrib
        return 0

    jax.lax.fori_loop(0, tile, body, 0, unroll=False)


def assemble_bitstream_pallas(
    entry_words: jnp.ndarray,  # (E, EW) u32
    offsets: jnp.ndarray,      # (E,) i32 global bit offset of each entry
    capacity_bytes: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """OR every entry stream into a (capacity_bytes//4,) u32 word buffer.

    Entries whose windows would run past the buffer are clamped to its tail
    (their bits mix into the final words — harmless garbage, because the
    caller detects total_bits > capacity and retries with a bigger buffer).
    """
    assert capacity_bytes % 4 == 0
    num_entries, ew = entry_words.shape
    assert ew + 1 <= 128
    num_words = capacity_bytes // 4
    rows = num_words // 128 + 2  # +2: spill row and 8-row slice headroom
    rows = -(-rows // 8) * 8

    padded_e = -(-num_entries // TILE) * TILE
    if padded_e != num_entries:
        pad = padded_e - num_entries
        entry_words = jnp.concatenate(
            [entry_words, jnp.zeros((pad, ew), jnp.uint32)]
        )
        offsets = jnp.concatenate(
            [offsets, jnp.zeros((pad,), offsets.dtype)]
        )
    # Clamp so every two-row window stays in bounds.
    max_off = (num_words - ew - 1) * 32
    offsets = jnp.minimum(offsets, max_off).astype(jnp.int32)

    kernel = functools.partial(_assemble_kernel, tile=TILE, ew=ew)
    out = pl.pallas_call(
        kernel,
        grid=(padded_e // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, ew), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
        interpret=interpret,
    )(entry_words, offsets.reshape(-1, 1))
    return out.reshape(-1)[:num_words]
