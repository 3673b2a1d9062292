"""Fused Pallas entropy kernel: coeffs -> packed JPEG bitstream, one pass.

Replaces the XLA symbolization + two-level packing chain (ops/entropy.py)
for the TPU hot path. Everything after the DCT happens inside one kernel,
tile by tile, with no HBM intermediates:

1. run-length symbolization of zigzag coefficients — cummax/cumsum over the
   64-lane axis done as log-step shift networks (pltpu.roll + masks), bit
   lengths via the f32 exponent trick (|coeff| < 2^24 so the conversion is
   exact; no clz needed);
2. Huffman (code, length) lookup via the TPU's per-sublane lane gather
   (jnp.take_along_axis lowers to tpu.dynamic_gather): the packed
   (len<<20|code) tables live in vregs as (1, 128) rows and each 256-entry
   AC table costs two gathers + a select (symbol high bit picks the half);
   luma/chroma resolve with one more select;
3. per-entry slot packing — exclusive cumsum over the 65 slot lanes, then
   the masked-OR sweep into (TILE, ENTRY_WORDS) buffers, all in VMEM;
4. sequential assembly into a VMEM-resident output (same scheme as
   kernels/pack_pallas.py: bit shift, dynamic lane roll, sublane-dynamic
   two-row RMW), with the running global bit offset carried across grid
   steps in SMEM scratch.

Scan-order marshalling (reshape/transpose), zigzag, and DC differences stay
in XLA (pure layout work), in ops/entropy.encode_scan's `fused` packer path.

Reference semantics (entropy_coding.rs:16-227) are preserved exactly; the
kernel is asserted byte-identical to the XLA path in tests (interpret mode)
and on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg_encoder_tpu import tables

TILE = 512          # entries per grid step
ENTRY_WORDS = 56    # worst-case words per entry (65 slots * 27 bits)
MAX_VMEM_CAPACITY = 16 * 1024 * 1024


def _packed(table_id: int, sym: int, kind: str) -> int:
    if kind == "ac":
        len_lut, code_lut = tables.AC_LEN_LUT, tables.AC_CODE_LUT
    else:
        len_lut, code_lut = tables.DC_LEN_LUT, tables.DC_CODE_LUT
    return (int(len_lut[table_id][sym]) << 20) | int(code_lut[table_id][sym])


@functools.cache
def _lut_rows() -> np.ndarray:
    """(8, 128) i32: packed (len<<20|code) tables laid out as vreg rows.

    Rows 0/1: luma AC symbols 0..127 / 128..255; rows 2/3: chroma AC;
    row 4: luma DC categories 0..11 (zero-padded); row 5: chroma DC.
    Symbols stay < 256 because inputs are int16 (bit length <= 15).
    """
    rows = np.zeros((8, 128), np.int32)
    for sym in range(256):
        rows[sym >> 7, sym & 127] = _packed(0, sym, "ac")
        rows[2 + (sym >> 7), sym & 127] = _packed(1, sym, "ac")
    for bl in range(12):
        rows[4, bl] = _packed(0, bl, "dc")
        rows[5, bl] = _packed(1, bl, "dc")
    return rows


def _gather_row(lut_ref, row, idx128):
    """Per-lane lookup of idx128 (T, 128) in lut row `row` (128 entries)."""
    t = idx128.shape[0]
    tbl = jnp.broadcast_to(lut_ref[row : row + 1, :], (t, 128))
    return jnp.take_along_axis(tbl, idx128, axis=1)


def _gather_lut(sym, is_luma, lut_ref, dc: bool):
    """(T, W) symbols -> packed (len<<20|code), luma/chroma per entry."""
    t, w = sym.shape
    idx = sym & 127
    if w < 128:
        idx = jnp.pad(idx, ((0, 0), (0, 128 - w)))
    else:
        assert w == 128
    if dc:
        y = _gather_row(lut_ref, 4, idx)[:, :w]
        c = _gather_row(lut_ref, 5, idx)[:, :w]
    else:
        hi_half = sym >= 128
        y = jnp.where(
            hi_half,
            _gather_row(lut_ref, 1, idx)[:, :w],
            _gather_row(lut_ref, 0, idx)[:, :w],
        )
        c = jnp.where(
            hi_half,
            _gather_row(lut_ref, 3, idx)[:, :w],
            _gather_row(lut_ref, 2, idx)[:, :w],
        )
    return jnp.where(is_luma, y, c)


def _lane_iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _shift_lanes(x, k, fill):
    """Shift values toward higher lane indices by k (axis 1), filling with
    `fill` — i.e. out[:, j] = x[:, j-k] for j >= k."""
    rolled = pltpu.roll(x, k, 1)
    return jnp.where(_lane_iota(x.shape, 1) >= k, rolled, fill)


def _cummax_lanes(x, width):
    """Inclusive cummax along axis 1 (values >= 0), log-step network."""
    k = 1
    while k < width:
        x = jnp.maximum(x, _shift_lanes(x, k, 0))
        k *= 2
    return x


def _cumsum_lanes(x, width):
    """Inclusive cumsum along axis 1, log-step network."""
    k = 1
    while k < width:
        x = x + _shift_lanes(x, k, 0)
        k *= 2
    return x


def _bit_length_f32(av):
    """Magnitude category of av = |v| (exact for av < 2^24): exponent + 1."""
    f = av.astype(jnp.float32)
    e = (pltpu.bitcast(f, jnp.int32) >> 23) - 127
    return jnp.where(av == 0, 0, e + 1)


def _entropy_kernel(
    z_ref, dcdiff_ref, lut_ref,
    out_ref, bits_ref,
    c0s, c1s, rloc, carry, acc2,
    *, tile, num_entries, blocks_per_mcu, hv, num_words, lut_scalars,
    n_chains,
):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        if n_chains > 1:
            acc2[:] = jnp.zeros_like(acc2)
        carry[0] = 0

    t = tile
    z = z_ref[:].astype(jnp.int32)   # (T, 64) zigzag order; i16 in HBM
    entry_idx = pid * t + _lane_iota((t, 1), 0)
    valid = entry_idx < num_entries
    is_luma = (entry_idx % blocks_per_mcu) < hv        # (T, 1) bool
    lane64 = _lane_iota((t, 64), 1)

    # ---- DC slot ----
    diff = dcdiff_ref[:]             # (T, 1)
    dc_bl = _bit_length_f32(jnp.abs(diff))
    dc_ampl = jnp.where(diff < 0, diff + (1 << dc_bl) - 1, diff) & (
        (1 << dc_bl) - 1
    )
    dc_cl = _gather_lut(dc_bl, is_luma, lut_ref, dc=True)  # (T, 1)
    dc_bits = ((dc_cl & 0xFFFFF) << dc_bl) | dc_ampl
    dc_len = (dc_cl >> 20) + dc_bl

    # ---- AC lanes ----
    nz_marker = jnp.where((z != 0) & (lane64 > 0), lane64, 0)
    cm = _cummax_lanes(nz_marker, 64)
    run_base = _shift_lanes(cm, 1, 0)
    last_nz = jnp.max(nz_marker, axis=1, keepdims=True)

    is_nonzero = (z != 0) & (lane64 > 0)
    run_dist = lane64 - run_base
    zeros_before = run_dist - 1

    ac_bl = _bit_length_f32(jnp.abs(z))
    ac_sym = ((zeros_before & 15) << 4) | ac_bl
    ac_ampl = jnp.where(z < 0, z + (1 << ac_bl) - 1, z) & ((1 << ac_bl) - 1)
    nz_cl = _gather_lut(ac_sym, is_luma, lut_ref, dc=False)  # (T, 64)
    nz_len = (nz_cl >> 20) + ac_bl
    nz_bits = ((nz_cl & 0xFFFFF) << ac_bl) | ac_ampl

    zrl_y, zrl_c, eob_y, eob_c = lut_scalars
    is_zero_lane = (z == 0) & (lane64 > 0)
    zrl_here = is_zero_lane & (lane64 <= last_nz) & (run_dist % 16 == 0)
    zrl_cl = jnp.where(is_luma, zrl_y, zrl_c)
    ac_bits = jnp.where(
        is_nonzero, nz_bits, jnp.where(zrl_here, zrl_cl & 0xFFFFF, 0)
    )
    ac_len = jnp.where(
        is_nonzero, nz_len, jnp.where(zrl_here, zrl_cl >> 20, 0)
    )

    eob_cl = jnp.where(is_luma, eob_y, eob_c)
    eob_needed = z[:, 63:64] == 0
    eob_bits = jnp.where(eob_needed, eob_cl & 0xFFFFF, 0)
    eob_len = jnp.where(eob_needed, eob_cl >> 20, 0)

    # ---- slots (T, 65), padded to (T, 128) for the lane networks ----
    slot_bits = jnp.concatenate(
        [dc_bits, ac_bits[:, 1:], eob_bits], axis=1
    ).astype(jnp.uint32)
    slot_lens = jnp.concatenate([dc_len, ac_len[:, 1:], eob_len], axis=1)
    slot_lens = jnp.where(valid, slot_lens, 0)  # padding entries emit nothing
    pad = 128 - 65
    slot_bits = jnp.pad(slot_bits, ((0, 0), (0, pad)))
    slot_lens = jnp.pad(slot_lens, ((0, 0), (0, pad)))

    incl = _cumsum_lanes(slot_lens, 128)
    local_off = incl - slot_lens                       # exclusive
    entry_bits = incl[:, 64:65]                        # (T, 1)

    # ---- per-entry buffers: masked-OR sweep over the 65 slots ----
    start = local_off & 31
    end = start + slot_lens
    shift_hi = jnp.clip(32 - end, 0, 31).astype(jnp.uint32)
    hi = jnp.where(
        end <= 32,
        slot_bits << shift_hi,
        slot_bits >> jnp.clip(end - 32, 0, 31).astype(jnp.uint32),
    )
    lo = jnp.where(
        end > 32,
        slot_bits << jnp.clip(64 - end, 0, 31).astype(jnp.uint32),
        jnp.uint32(0),
    )
    word_idx = local_off >> 5

    # Word index is a unit-step staircase over slots (slot lengths < 32),
    # so each output word's contributions form one contiguous slot segment.
    # A segmented OR-scan collapses each segment to its last slot; a 7-step
    # per-lane binary search over the (sorted) word_idx row finds that last
    # slot for each output word; one per-sublane gather (take_along_axis ->
    # tpu.dynamic_gather) pulls the word values out. Spills (lo) need no
    # scan at all: only a segment's LAST slot can cross its word boundary,
    # so the same gather indices read them, landing one word later (lane
    # shift at the end).
    def seg_or(vals):
        s_acc = vals
        k = 1
        while k < 128:
            wk = _shift_lanes(word_idx, k, -1)
            s_acc = jnp.where(
                word_idx == wk, s_acc | _shift_lanes(s_acc, k, 0), s_acc
            )
            k *= 2
        return s_acc

    s_hi = seg_or(hi)
    colw = _lane_iota((t, ENTRY_WORDS), 1)
    # Binary search: idx[w] = max{s <= 64 : word_idx[s] <= w} (word_idx[0]
    # is 0, so s = 0 is always a valid lower bound). Lanes past the last
    # slot read as +inf so candidates stay inside the real 65 slots.
    wi = jnp.where(_lane_iota((t, 128), 1) > 64, 0x7FFF, word_idx)
    colw128 = jnp.pad(colw, ((0, 0), (0, 128 - ENTRY_WORDS)))
    idx128 = jnp.zeros((t, 128), jnp.int32)
    for step in (64, 32, 16, 8, 4, 2, 1):
        cand = idx128 + step
        v = jnp.take_along_axis(wi, cand, axis=1)
        idx128 = jnp.where(v <= colw128, cand, idx128)
    w_last = word_idx[:, 64:65]
    g_hi = jnp.take_along_axis(s_hi, idx128, axis=1)[:, :ENTRY_WORDS]
    g_lo = jnp.take_along_axis(lo, idx128, axis=1)[:, :ENTRY_WORDS]
    live = colw <= w_last
    acc = jnp.where(live, g_hi, 0)
    acc_lo = jnp.where(live, g_lo, 0)
    ew = acc | _shift_lanes(acc_lo, 1, jnp.uint32(0))   # (T, ENTRY_WORDS)

    # ---- tile-local exclusive offsets + global carry ----
    eb_sub = entry_bits  # (T, 1): cumsum along sublanes via transpose trick
    incl_e = _cumsum_lanes(eb_sub.reshape(1, t), t).reshape(t, 1)
    excl_e = incl_e - eb_sub
    base = carry[0]
    offs_val = base + excl_e
    carry[0] = base + incl_e[t - 1, 0]
    bits_ref[0, 0] = carry[0]
    # Clamp windows into bounds (overflow is detected via total_bits).
    max_off = (num_words - ENTRY_WORDS - 1) * 32
    offw = jnp.minimum(offs_val, max_off)

    # ---- wide contribution prep ----
    # Align every entry's buffer to the absolute word grid (shift right by
    # offs&31 bits — per-sublane shift amounts broadcast over lanes), then
    # rotate each row to its lane position ((offs>>5) mod 128) with a
    # per-sublane lane gather (a per-row dynamic roll, which pltpu.roll
    # cannot do), and split into the two 128-word output rows the entry
    # covers. Everything the old code computed per entry inside the
    # assembly loop happens here as a handful of (T, 128) vector ops.
    sbit = (offw & 31).astype(jnp.uint32)
    ew64 = jnp.pad(ew, ((0, 0), (0, 64 - ENTRY_WORDS)))
    spill = jnp.where(sbit == 0, jnp.uint32(0), ew64 << (32 - sbit))
    sh = (ew64 >> sbit) | _shift_lanes(spill, 1, jnp.uint32(0))
    sh128 = jnp.pad(sh, ((0, 0), (0, 64)))
    q = offw >> 5
    lpos = q & 127
    lane = _lane_iota((t, 128), 1)
    gidx = (lane - lpos) & 127
    rolled = jnp.take_along_axis(sh128, gidx, axis=1)
    c0s[:] = jnp.where(lane >= lpos, rolled, 0)
    c1s[:] = jnp.where(lane < lpos, rolled, 0)
    rloc[:] = q >> 7

    # ---- sequential assembly into the resident output ----
    # Only the read-modify-OR into the (dynamically addressed) output rows
    # is sequential now, and those RMWs round-robin across up to n_chains
    # INDEPENDENT accumulators (out_ref and row-bands of acc2) so the
    # scheduler can interleave their dependency chains. Every bit of the
    # stream is written by exactly one entry, so OR-ing the accumulators at
    # the end reproduces the single-stream result exactly.
    nrows = out_ref.shape[0]

    def rmw(target, band, e):
        r = band * nrows + rloc[e, 0]
        contrib = jnp.concatenate(
            [c0s[pl.ds(e, 1), :], c1s[pl.ds(e, 1), :]], axis=0
        )
        cur = target[pl.ds(r, 2), :]
        target[pl.ds(r, 2), :] = cur | contrib

    if n_chains == 1:
        def body(i, _):
            rmw(out_ref, 0, i)
            return 0

        jax.lax.fori_loop(0, t, body, 0, unroll=False)
    else:
        def body(i, _):
            rmw(out_ref, 0, n_chains * i)
            for k in range(1, n_chains):
                rmw(acc2, k - 1, n_chains * i + k)
            return 0

        jax.lax.fori_loop(0, t // n_chains, body, 0, unroll=False)

        @pl.when(pid == pl.num_programs(0) - 1)
        def _():
            merged = out_ref[:]
            for k in range(n_chains - 1):
                merged = merged | acc2[k * nrows : (k + 1) * nrows, :]
            out_ref[:] = merged


@functools.cache
def _lut_scalars():
    def packed(len_lut, code_lut, sym):
        return int(
            (int(len_lut[sym]) << 20) | int(code_lut[sym])
        )

    return (
        packed(tables.AC_LEN_LUT[0], tables.AC_CODE_LUT[0], 0xF0),
        packed(tables.AC_LEN_LUT[1], tables.AC_CODE_LUT[1], 0xF0),
        packed(tables.AC_LEN_LUT[0], tables.AC_CODE_LUT[0], 0x00),
        packed(tables.AC_LEN_LUT[1], tables.AC_CODE_LUT[1], 0x00),
    )


def encode_entropy_fused(
    z: jnp.ndarray,        # (E, 64) i32 zigzag coeffs in scan-entry order
    dc_diff: jnp.ndarray,  # (E,) i32 DC differences in scan-entry order
    geom,
    capacity_bytes: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused device entropy coding: returns (u32 words flat bytes, total_bits)."""
    assert capacity_bytes % 4 == 0
    num_entries = z.shape[0]
    num_words = capacity_bytes // 4
    rows = -(-(num_words // 128 + 2) // 8) * 8
    # Extra accumulators (independent RMW dependency chains) trade VMEM
    # for merge-loop latency (measured ~70 ms/batch of serial RMW latency
    # at one chain, amortized to a few ms at 16-32); spend a ~32 MB
    # accumulator budget against the 100 MB compiler VMEM ceiling.
    n_chains = min(32, max(1, (32 * (1 << 20)) // capacity_bytes))

    padded_e = -(-num_entries // TILE) * TILE
    if padded_e != num_entries:
        pad = padded_e - num_entries
        z = jnp.concatenate([z, jnp.zeros((pad, 64), z.dtype)])
        dc_diff = jnp.concatenate([dc_diff, jnp.zeros((pad,), dc_diff.dtype)])

    kernel = functools.partial(
        _entropy_kernel,
        tile=TILE,
        num_entries=num_entries,
        blocks_per_mcu=geom.blocks_per_mcu,
        hv=geom.h_factor * geom.v_factor,
        num_words=num_words,
        lut_scalars=_lut_scalars(),
        n_chains=n_chains,
    )
    out, bits = pl.pallas_call(
        kernel,
        grid=(padded_e // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE, 128), jnp.uint32),
            pltpu.VMEM((TILE, 128), jnp.uint32),
            pltpu.VMEM((TILE, 1), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((max(n_chains - 1, 1) * rows, 128), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        z,
        dc_diff.astype(jnp.int32).reshape(-1, 1),
        jnp.asarray(_lut_rows()),
    )
    return out.reshape(-1)[:num_words], bits[0, 0]
