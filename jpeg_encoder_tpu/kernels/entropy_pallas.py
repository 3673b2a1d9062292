"""Fused Pallas entropy kernel: coeffs -> packed JPEG bitstream, one pass.

Replaces the XLA symbolization + two-level packing chain (ops/entropy.py)
for the TPU hot path. Everything after the DCT happens inside one kernel,
tile by tile, with no HBM intermediates.

Layout: TWO scan entries per 128-lane row (entry A in lanes 0..63, B in
64..127 — the (E, 64) coefficient array reshapes to (E/2, 128) for free in
HBM). Symbolization runs half-aware (shifts masked at the lane-64
boundary, run lengths are per-entry); packing treats the row as one
contiguous 128-slot sequence. Either way every lane network does the
same work in half the vector registers a one-entry-per-row layout needs.

1. run-length symbolization of zigzag coefficients — cummax/cumsum over
   each 64-lane half as log-step shift networks (pltpu.roll + masks), bit
   lengths via the f32 exponent trick (|coeff| < 2^24 so the conversion is
   exact; no clz needed). The EOB is slot 63: zigzag position 63 either
   emits its nonzero coefficient (then the block has no EOB) or, when
   zero, the EOB code — the same 64 slots cover both (entropy_coding.rs:
   105-124 emission order is preserved exactly).
2. Huffman (code, length) lookup via the TPU's per-sublane lane gather
   (jnp.take_along_axis lowers to tpu.dynamic_gather). DC lookups ride
   the SAME gathers: DC category bl is stuffed into the AC tables at the
   unused symbols (bl+1)<<4 (r=1..12, s=0 — baseline JPEG defines no AC
   codes there), so one pair of gathers serves every slot. Luma/chroma
   resolve by selecting the table ROW before the gather — sound ONLY
   when every pair is luma/chroma-homogeneous (4:2:0/4:2:2); mixed-pair
   ratios (4:4:4) gather all four rows and select after.
3. pair slot packing — entry B's bits follow A's contiguously in the
   stream, so the row is ONE 128-slot sequence: a full-width exclusive
   cumsum gives pair-relative offsets (an MXU triangular matmul), and the
   pair's sub-word stream phase (its absolute bit offset mod 32) is
   FOLDED INTO those offsets up front (one broadcast add), so the packed
   words land directly on the absolute word grid — no post-hoc variable
   alignment shift exists. The word index per slot is a unit-step
   staircase, so each output word's contributions form one contiguous
   slot segment whose bit ranges are DISJOINT — its OR is a SUM, i.e. a
   difference of prefix sums (more triangular matmuls, in exact 8-bit
   chunks). Spills ride the same prefix sum shifted one slot forward (a
   segment's spill starts at bit 0 of the next word, exactly where that
   word's first slot leaves off); a 7-step per-lane binary search + one
   gather reads the pair's <= 111 words out.
4. assembly into a VMEM-resident output: a per-sublane lane gather
   rotates the aligned pair buffer to its lane position, and the two
   128-word output rows a pair can span split by lane (<= 111 aligned
   words from any start lane never reach word 256). Then the same
   disjointness (every output
   bit is written by exactly one pair, so OR == SUM) turns the scatter
   into MATMULS: one-hot (rows_loc, T2) row-assignment matrices times
   the 8-bit chunks of the aligned contributions assemble the tile's
   whole contiguous row window, committed with a single dynamic
   read-modify-OR. The running global bit offset is carried across grid
   steps in SMEM scratch; a tile denser than the static window falls
   back to a sequential per-pair RMW loop (byte-identical).

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

TILE = int(__import__("os").environ.get("JPEG_TPU_ENTROPY_TILE", "2048"))
# entries per grid step (TILE // 2 kernel rows); env knob is for dev A/B
# sweeps (tools/bench_cell.py) — production uses the default.
ENTRY_WORDS = 56    # worst-case words per entry (64 slots * 27 bits, +spill)
# The VMEM-resident output block plus the chain accumulators are the only
# capacity-proportional allocations. n_chains scales inversely with the
# buffer (a ~32 MB accumulator budget), so output block + accumulators
# stay under the 100 MB compiler VMEM ceiling up to 64 MB buffers —
# worst-case 4K retry capacities (~44 MB) keep the fused path.
MAX_VMEM_CAPACITY = 64 * 1024 * 1024


def _packed(table_id: int, sym: int, kind: str) -> int:
    if kind == "ac":
        len_lut, code_lut = tables.AC_LEN_LUT, tables.AC_CODE_LUT
    else:
        len_lut, code_lut = tables.DC_LEN_LUT, tables.DC_CODE_LUT
    return (int(len_lut[table_id][sym]) << 20) | int(code_lut[table_id][sym])


@functools.cache
def _lut_rows() -> np.ndarray:
    """(8, 128) i32: packed (len<<20|code) tables laid out as vreg rows.

    Rows 0/1: luma AC symbols 0..127 / 128..255; rows 2/3: chroma AC.
    DC categories bl = 0..11 are stuffed into the unused AC symbols
    (bl+1)<<4 (zero-run r=1..12 with size s=0: baseline JPEG defines no
    AC codes there), so the DC lookup shares the AC gathers.
    """
    rows = np.zeros((8, 128), np.int32)
    for sym in range(256):
        rows[sym >> 7, sym & 127] = _packed(0, sym, "ac")
        rows[2 + (sym >> 7), sym & 127] = _packed(1, sym, "ac")
    for bl in range(12):
        sym = (bl + 1) << 4
        assert tables.AC_LEN_LUT[0][sym] == 0 and tables.AC_LEN_LUT[1][sym] == 0
        rows[sym >> 7, sym & 127] = _packed(0, bl, "dc")
        rows[2 + (sym >> 7), sym & 127] = _packed(1, bl, "dc")
    return rows


def _lane_iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _shift_half(x, k, fill):
    """Shift values toward higher lanes by k WITHIN each 64-lane half:
    out[:, j] = x[:, j-k] when (j & 63) >= k, else `fill`."""
    rolled = pltpu.roll(x, k, 1)
    return jnp.where((_lane_iota(x.shape, 1) & 63) >= k, rolled, fill)


def _shift_lanes(x, k, fill):
    """Full-width lane shift: out[:, j] = x[:, j-k] for j >= k."""
    rolled = pltpu.roll(x, k, 1)
    return jnp.where(_lane_iota(x.shape, 1) >= k, rolled, fill)


def _bit_length_f32(av):
    """Magnitude category of av = |v| (exact for av < 2^24): exponent + 1."""
    f = av.astype(jnp.float32)
    e = (pltpu.bitcast(f, jnp.int32) >> 23) - 127
    return jnp.where(av == 0, 0, e + 1)


def _entropy_kernel(
    z_ref, lut_ref, scal_ref, live_ref, init_ref,
    out_ref, bits_ref,
    c0s, c1s, rloc, carry, dc_carry,
    *, tile, num_entries, blocks_per_mcu, hv, num_words,
    rows_loc, force_fallback, dc_in_kernel,
):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        carry[0] = 0

    t2 = tile // 2
    z = z_ref[:].astype(jnp.int32)       # (T2, 128): entries A | B
    lane = _lane_iota((t2, 128), 1)
    half = lane >= 64                    # False: entry A, True: entry B
    lane64 = lane & 63                   # zigzag position within the entry
    row2 = _lane_iota((t2, 1), 0)
    entry_idx = pid * tile + 2 * row2 + half.astype(jnp.int32)
    # Live-entry mask: entries at index >= live emit nothing. Covers both
    # the TILE padding suffix (live == num_entries) and uneven MCU-band
    # sharding, where the trailing band's dead-row entries carry arbitrary
    # coefficients (parallel/tiled.py). Dead entries are always a scan
    # suffix, so the carry/total-bits accounting needs no other change.
    valid = entry_idx < jnp.minimum(num_entries, live_ref[0, 0])
    is_luma = (entry_idx % blocks_per_mcu) < hv      # (T2, 128) bool

    # ---- DC differences, in-kernel (dc_in_kernel=True) ----
    # Slot 0 of every entry holds its RAW DC (the scan never emits it).
    # The previous same-component entry sits a STATIC distance back in
    # scan order: 1 for a luma block after another in its MCU,
    # bpm - hv + 1 for an MCU's first luma block (previous MCU's last
    # luma), bpm for chroma (entropy_coding.rs:38-44 predictor chains).
    # With two entries per row those lookbacks are static row slices of
    # the tile's DC columns, extended by an 8-row carry of the previous
    # tile's DCs (the grid is sequential); the first entries of the scan
    # take their component's init predictor instead.
    # Everything stays FULL-WIDTH (t2, 128): only lanes 0 and 64 carry DC
    # values, but narrow (t2, 1) column slices of z pick up nonzero lane
    # offsets in their vector layout and Mosaic cannot concatenate those
    # along sublanes ("offset mismatch on non-concat dimension"); masked
    # full rows keep every operand at the canonical {0,0} layout.
    bpm = blocks_per_mcu
    if dc_in_kernel:
        dcs = jnp.where(lane64 == 0, z, 0)  # lane 0: A's raw DC, 64: B's
        ext = jnp.concatenate([dc_carry[:], dcs], axis=0)  # (t2 + 8, 128)
        swap = pltpu.roll(ext, 64, 1)        # A <-> B columns

        def back(src, s):                    # value s ROWS back, same lane
            return src[8 - s : 8 - s + t2, :]

        def prev_full(d):                    # prev DC at distance d
            if d % 2 == 0:
                return back(ext, d // 2)
            # Odd distances cross columns: entry A's predecessor is a B
            # entry (d+1)//2 rows back; B's is an A entry (d-1)//2 back.
            return jnp.where(
                half, back(swap, (d - 1) // 2), back(swap, (d + 1) // 2)
            )

        d_first = bpm - hv + 1               # MCU's first luma block
        dists = sorted({1, d_first, bpm} if hv > 1 else {d_first})
        prevs = {d: prev_full(d) for d in dists}

        pos = entry_idx % bpm
        init = jnp.where(
            pos < hv, init_ref[0, 0],
            jnp.where(pos == hv, init_ref[0, 1], init_ref[0, 2]),
        )
        if hv > 1:
            d = jnp.where(pos >= hv, bpm, jnp.where(pos == 0, d_first, 1))
            sel = jnp.where(
                pos >= hv, prevs[bpm],
                jnp.where(pos == 0, prevs[d_first], prevs[1]),
            )
        else:
            d = d_first
            sel = prevs[d_first]
        # Entries before their chain's first predecessor take the init
        # predictor; dc_carry is never read on the first tile because
        # those rows always satisfy entry_idx < d (no zero-init needed).
        prev = jnp.where(entry_idx < d, init, sel)
        z = jnp.where(lane64 == 0, z - prev, z)
        dc_carry[:] = dcs[t2 - 8 :, :]

    # ---- run-length state per half ----
    nz_marker = jnp.where((z != 0) & (lane64 > 0), lane64, 0)
    cm = nz_marker
    k = 1
    while k < 64:
        cm = jnp.maximum(cm, _shift_half(cm, k, 0))
        k *= 2
    run_base = _shift_half(cm, 1, 0)     # previous nonzero position
    last_idx = jnp.where(half, 127, 63)
    last_nz = jnp.take_along_axis(cm, last_idx, axis=1)

    is_nonzero = (z != 0) & (lane64 > 0)
    run_dist = lane64 - run_base
    zeros_before = run_dist - 1

    # ---- symbols: AC, DC (lane 0), EOB (lane 63, zero coefficient) ----
    # Lane 0 / 64 of each row holds the entry's DC DIFFERENCE (the caller
    # merges it into the coefficient rows), so the AC bit-length/amplitude
    # formulas cover the DC slot verbatim — no separate DC input or network.
    ac_bl = _bit_length_f32(jnp.abs(z))
    ac_sym = ((zeros_before & 15) << 4) | ac_bl
    ac_ampl = jnp.where(z < 0, z + (1 << ac_bl) - 1, z) & ((1 << ac_bl) - 1)

    is_dc = lane64 == 0
    sym = jnp.where(is_dc, (ac_bl + 1) << 4, ac_sym)

    # ---- Huffman gathers for every slot ----
    def bc(row):
        return jnp.broadcast_to(lut_ref[row : row + 1, :], (t2, 128))

    idx = sym & 127
    hi_sym = sym >= 128
    if blocks_per_mcu % 2 == 0 and hv % 2 == 0:
        # Entry pairs never mix luma and chroma (pairs cannot straddle an
        # MCU when blocks_per_mcu is even, and an even h*v pairs luma
        # blocks with luma blocks), so is_luma is constant per kernel row
        # and the table ROW can be selected before the gather: two gathers
        # serve all slots. NOTE the select must NOT happen after indexing
        # per lane — a gathered lane's luma-ness is the looking-up lane's,
        # not the table lane's — which is why the mixed-pair path below
        # gathers all four rows first.
        row_lo = jnp.where(is_luma, bc(0), bc(2))
        row_hi = jnp.where(is_luma, bc(1), bc(3))
        g_lo_tbl = jnp.take_along_axis(row_lo, idx, axis=1)
        g_hi_tbl = jnp.take_along_axis(row_hi, idx, axis=1)
        cl = jnp.where(hi_sym, g_hi_tbl, g_lo_tbl)   # (len<<20 | code)
    else:
        y_cl = jnp.where(
            hi_sym,
            jnp.take_along_axis(bc(1), idx, axis=1),
            jnp.take_along_axis(bc(0), idx, axis=1),
        )
        c_cl = jnp.where(
            hi_sym,
            jnp.take_along_axis(bc(3), idx, axis=1),
            jnp.take_along_axis(bc(2), idx, axis=1),
        )
        cl = jnp.where(is_luma, y_cl, c_cl)

    coded_bits = ((cl & 0xFFFFF) << ac_bl) | ac_ampl
    coded_len = (cl >> 20) + ac_bl

    # ZRL/EOB packed codes ride SMEM (traced, so per-image optimized
    # tables reuse the same compiled kernel; Annex-K passes its constants
    # through the same slots).
    zrl_y = scal_ref[0, 0]
    zrl_c = scal_ref[0, 1]
    eob_y = scal_ref[0, 2]
    eob_c = scal_ref[0, 3]
    zrl_here = (
        (z == 0) & (lane64 > 0) & (lane64 <= last_nz) & (run_dist % 16 == 0)
    )
    zrl_cl = jnp.where(is_luma, zrl_y, zrl_c)
    eob_here = (lane64 == 63) & (z == 0)
    eob_cl = jnp.where(is_luma, eob_y, eob_c)

    emit = is_dc | is_nonzero
    slot_bits = jnp.where(
        emit,
        coded_bits,
        jnp.where(
            zrl_here, zrl_cl & 0xFFFFF, jnp.where(eob_here, eob_cl & 0xFFFFF, 0)
        ),
    ).astype(jnp.uint32)
    slot_lens = jnp.where(
        emit,
        coded_len,
        jnp.where(zrl_here, zrl_cl >> 20, jnp.where(eob_here, eob_cl >> 20, 0)),
    )
    # Padding entries emit nothing. Masking the BITS too is load-bearing
    # for the prefix-sum packer: a zero-length slot with nonzero bits
    # would otherwise leak into its word's segment sum. (Real len-0 slots
    # always have zero bits; padding DC/EOB slots only happened to — their
    # code values vanish under the <<31 alignment — so make it explicit.)
    slot_bits = jnp.where(valid, slot_bits, jnp.uint32(0))
    slot_lens = jnp.where(valid, slot_lens, 0)

    # ---- pair-local bit prefix + tile-local offsets + global carry ----
    # Entry B's bits follow entry A's contiguously in the final stream, so
    # the whole ROW is one 128-slot sequence and its inclusive prefix sum
    # is ONE MXU matmul against an upper-triangular ones matrix (the VPU
    # shift network this replaces was 7 roll+mask+add steps). Exact:
    # slot lengths <= 31 are bf16-representable integers and every f32
    # partial sum <= 128 * 31 is far below 2^24.
    ii = _lane_iota((128, 128), 0)
    tri = (ii <= _lane_iota((128, 128), 1)).astype(jnp.bfloat16)
    incl = jnp.dot(
        slot_lens.astype(jnp.bfloat16), tri,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    pair_bits = incl[:, 127:128]         # (T2, 1)

    # Tile-local pair-offset scan in a compact (g128, 128) layout with
    # pair p at [p % g128, p // g128] (reshape + transpose — the only
    # reshape direction Mosaic supports here). Consecutive pairs run down
    # the SUBLANES of each column, so the full scan is a 3-step sublane
    # scan (8 vregs/step) plus a 7-step lane scan of the column totals
    # (ONE vreg/step) — replacing the 10-step log-scan on the narrow
    # (t2, 1) column (128 vregs/step), the kernel's single most expensive
    # section (full kernel 9.0 -> 8.2 ms/batch at 4:4:4;
    # tools/exp_kernel_sections.py SCANFORM=repeat). Expansion back to a
    # full (t2, 128) broadcast: pltpu.repeat tiles the (g128, 128) block
    # 128x down the sublanes — rep[r] = off8[r % g128] — and one static
    # per-row lane gather picks lane r // g128, i.e. exactly pair r.
    base = carry[0]
    g128 = t2 // 128
    gshift = g128.bit_length() - 1
    assert g128 == 1 << gshift
    mt = pair_bits.reshape(128, g128).T        # (g128, 128): pair j*g + g'
    incl8 = mt
    rr8 = _lane_iota((g128, 128), 0)
    k = 1
    while k < g128:                            # sublane scan down columns
        incl8 = incl8 + jnp.where(rr8 >= k, pltpu.roll(incl8, k, 0), 0)
        k *= 2
    col_tot = incl8[g128 - 1 : g128, :]        # (1, 128) per-column total
    ex = _shift_lanes(col_tot, 1, 0)           # exclusive lane prefix of
    k = 1                                      # the column totals
    while k < 128:
        ex = ex + _shift_lanes(ex, k, 0)
        k *= 2
    incl8 = incl8 + ex                         # (g128, 128) inclusive
    carry[0] = base + incl8[g128 - 1, 127]
    bits_ref[0, 0] = carry[0]
    # Clamp windows into bounds (overflow is detected via total_bits).
    max_off = (num_words - 2 * ENTRY_WORDS - 1) * 32
    off8 = jnp.minimum(base + incl8 - mt, max_off)
    rep = pltpu.repeat(off8, 128, 0)           # (t2, 128): row r = p%g128
    idxm = _lane_iota((t2, 128), 0) >> gshift  # lane r // g128 = pair r
    off_b = jnp.take_along_axis(rep, idxm, axis=1)  # (t2, 128) broadcast
    off_col = off_b[:, 0:1]                    # (t2, 1) narrow view

    # ---- slot codes -> ALIGNED pair word buffer (<= 111 of 128 lanes) ----
    # The pair's sub-word phase (off_b & 31) is FOLDED INTO the slot
    # offsets before packing — one broadcast add — so the packed words
    # come out already aligned to the absolute 32-bit word grid and no
    # post-hoc alignment shift exists. (The previous form packed at phase
    # 0 and realigned with two variable-amount shifts, which Mosaic lowers
    # to ~20-op conditional-shift networks each: +2.7 ms/batch at 4:4:4,
    # the kernel's single largest section — tools/exp_kernel_sections.py.)
    sbit = off_b & 31
    local_off = incl - slot_lens + sbit  # aligned exclusive offsets
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
    word_idx = local_off >> 5            # unit-step staircase over the pair

    # Within one output word, slot contributions occupy DISJOINT bit
    # ranges, so the word's value (an OR over its slot segment) equals the
    # segment SUM — and a segment sum is a difference of prefix sums. The
    # spill of a segment's last slot starts at bit 0 of the NEXT word,
    # exactly where that word's first slot leaves off, so shifting spills
    # one slot forward folds them into the same prefix sum (u32 wraparound
    # keeps the differences exact). Only the final slot's spill escapes
    # (no slot follows to carry it); it is patched in at word w_last + 1.
    contrib = hi + _shift_lanes(lo, 1, jnp.uint32(0))
    # u32 inclusive prefix sum over the 128 slot lanes as four 8-bit-chunk
    # MXU matmuls against the same triangular matrix (each chunk <= 255 is
    # bf16-exact; per-chunk partial sums <= 128 * 255 < 2^24 are f32-exact;
    # the shifted recombination is exact mod 2^32, which is all the
    # difference-of-prefix-sums packing needs). Measured faster than the
    # 7-step roll/add network it replaces (tools/exp_kernel_sections.py).
    cs = jnp.zeros_like(contrib)
    for kk in range(4):
        ck = ((contrib >> (8 * kk)) & 0xFF).astype(jnp.int32).astype(
            jnp.bfloat16
        )
        csk = jnp.dot(ck, tri, preferred_element_type=jnp.float32)
        cs = cs + (csk.astype(jnp.int32).astype(jnp.uint32) << (8 * kk))
    # Binary search: sidx[w] = max{s <= 127 : word_idx[s] <= w}
    # (word_idx[0] = sbit >> 5 = 0, so s = 0 is always a valid lower bound).
    colw = lane
    sidx = jnp.zeros((t2, 128), jnp.int32)
    for step in (64, 32, 16, 8, 4, 2, 1):
        cand = sidx + step               # <= 127 by construction
        v = jnp.take_along_axis(word_idx, cand, axis=1)
        sidx = jnp.where(v <= colw, cand, sidx)
    w_last = word_idx[:, 127:128]
    g_cs = jnp.take_along_axis(cs, sidx, axis=1)
    live = colw <= w_last
    ew = jnp.where(live, g_cs - _shift_lanes(g_cs, 1, jnp.uint32(0)), 0)
    lo_last = lo[:, 127:128]
    ew = ew | jnp.where(colw == w_last + 1, lo_last, 0)  # aligned (T2, 128)

    # ---- wide contribution prep ----
    # Rotate the (already grid-aligned) pair buffer to its output lane
    # position with a per-sublane lane gather (a per-row dynamic roll) and
    # split it into the two 128-word output rows it can span: a pair
    # occupies <= 111 aligned words (31 phase bits + 128 slots * 27 bits,
    # + spill), so from any start lane <= 127 it ends before word 256 —
    # two rows, never three.
    q_a = off_col >> 5
    r_a = q_a >> 7                       # (T2, 1) first output row of pair
    l_a = q_a & 127
    w_rel = (lane - l_a) & 127
    rot = jnp.take_along_axis(ew, w_rel, axis=1)
    c0 = jnp.where(lane >= l_a, rot, 0)
    c1 = jnp.where(lane < l_a, rot, 0)

    # ---- assembly: one-hot MXU scatter into the tile's row window ----
    # Every bit of the stream is written by exactly one pair, so the OR
    # over pairs contributing to an output word equals its SUM — and a sum
    # over pairs is a matmul. The tile's pairs land in a contiguous row
    # window [r_first, r_first + rows_loc): two one-hot (rows_loc, T2)
    # matrices (A0 for each pair's first row r_a, A1 for its second) times
    # the 8-bit chunks of c0/c1 assemble the whole tile in 8 small MXU
    # matmuls — chunk sums stay <= 255 (each output bit is set at most
    # once), so bf16 inputs and f32 accumulation are exact. One dynamic
    # (rows_loc, 128) read-modify-OR commits the window; sequential grid
    # steps make the window overlap at tile boundaries safe. Tiles denser
    # than rows_loc rows (~128 bits/entry average at the TILE-scaled
    # default rows_loc = TILE/32; real content runs 10-60) take the
    # sequential per-pair RMW fallback — byte-identical, just slower.
    nrows = out_ref.shape[0]
    r_first = jnp.minimum(base >> 12, nrows - rows_loc)  # 4096 bits per row
    fits = ((carry[0] - 1) >> 12) - r_first <= rows_loc - 2

    def matmul_assembly():
        # Column-form one-hots: (t2, rows_loc) built straight from the
        # (t2, 1) pair rows — no (1, t2) lane-major offset form exists in
        # the repeat-scan layout — consumed by a dim-0-contracting
        # dot_general (same MXU work, transposed operand order).
        r_rel_c = (off_col >> 12) - r_first        # (T2, 1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (t2, rows_loc), 1)
        a0 = (jj == r_rel_c).astype(jnp.bfloat16)  # (T2, rows_loc)
        a1 = (jj == r_rel_c + 1).astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))
        acc_loc = jnp.zeros((rows_loc, 128), jnp.uint32)
        for kk in range(4):
            c0k = ((c0 >> (8 * kk)) & 0xFF).astype(jnp.int32).astype(
                jnp.bfloat16
            )
            c1k = ((c1 >> (8 * kk)) & 0xFF).astype(jnp.int32).astype(
                jnp.bfloat16
            )
            s = jax.lax.dot_general(
                a0, c0k, dn, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                a1, c1k, dn, preferred_element_type=jnp.float32
            )
            acc_loc = acc_loc | (
                s.astype(jnp.int32).astype(jnp.uint32) << (8 * kk)
            )
        cur = out_ref[pl.ds(r_first, rows_loc), :]
        out_ref[pl.ds(r_first, rows_loc), :] = cur | acc_loc

    def fallback_assembly():
        c0s[:] = c0
        c1s[:] = c1
        rloc[:] = r_a

        def body(p, _):
            r = rloc[p, 0]
            cur = out_ref[pl.ds(r, 2), :]
            out_ref[pl.ds(r, 2), :] = cur | jnp.concatenate(
                [c0s[pl.ds(p, 1), :], c1s[pl.ds(p, 1), :]], axis=0
            )
            return 0

        jax.lax.fori_loop(0, t2, body, 0, unroll=False)

    if force_fallback:
        fallback_assembly()
    else:
        pl.when(fits)(matmul_assembly)
        pl.when(jnp.logical_not(fits))(fallback_assembly)


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


def custom_lut_operands(
    dc_lut: jnp.ndarray, ac_lut: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """TRACED (2, 256) packed (len<<20|code) tables -> kernel operands.

    Builds the same stuffed (8, 128) row layout as _lut_rows — AC symbols
    split at 128 per table, DC categories stuffed at the baseline-unused
    AC symbols (bl+1)<<4 — plus the (1, 4) ZRL/EOB scalar block, from
    traced arrays, so ONE compiled kernel serves every per-image
    optimized table set. The stuffing slots are guaranteed free for any
    table built from real scan statistics (the symbolization never emits
    (r, 0) symbols for r in 1..14 except ZRL=0xF0;
    pipeline.optimal_specs_and_luts asserts it).
    """
    rows4 = jnp.concatenate(
        [ac_lut[0].reshape(2, 128), ac_lut[1].reshape(2, 128)]
    ).astype(jnp.int32)
    for bl in range(12):
        sym = (bl + 1) << 4
        r, lane = sym >> 7, sym & 127
        rows4 = rows4.at[r, lane].set(dc_lut[0, bl])
        rows4 = rows4.at[2 + r, lane].set(dc_lut[1, bl])
    rows8 = jnp.concatenate([rows4, jnp.zeros((4, 128), jnp.int32)])
    scal = jnp.stack(
        [ac_lut[0, 0xF0], ac_lut[1, 0xF0], ac_lut[0, 0x00], ac_lut[1, 0x00]]
    ).astype(jnp.int32).reshape(1, 4)
    return rows8, scal


def encode_entropy_fused(
    z: jnp.ndarray,        # (E, 64) zigzag coeffs in scan-entry order
    geom,
    capacity_bytes: int,
    init_dc: jnp.ndarray | None = None,  # (3,) i32 initial DC predictors
    interpret: bool = False,
    live_entries: jnp.ndarray | None = None,
    dc_in_kernel: bool = True,
    dc_diff: jnp.ndarray | None = None,  # (E,) i32, dc_in_kernel=False only
    rows_loc: int | None = None,
    force_fallback: bool = False,
    tile: int | None = None,
    luts: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused device entropy coding: returns (u32 words flat bytes, total_bits).

    luts = (dc, ac) TRACED (2, 256) packed tables overrides the Annex-K
    constants (per-image optimized Huffman): the stuffed row layout and
    ZRL/EOB scalars are rebuilt from them in XLA (custom_lut_operands)
    and flow through the kernel's existing operand slots, so the same
    compiled kernel serves every table set.

    dc_in_kernel=True (default): slot 0 of each entry holds the RAW DC
    coefficient and the kernel computes the running-predictor differences
    itself (static scan-order lookbacks; init_dc seeds the three component
    predictors, as the MCU-band-sharded path needs). dc_in_kernel=False:
    the caller passes dc_diff and the differences are merged into slot 0
    here, in XLA. The modes are byte-identical; the split exists because
    XLA's chain-fusion emission flips between good and catastrophic
    windowing depending on this exact program structure, per ratio
    (measured 4:2:2: XLA merge 935 vs in-kernel 738 Mpix/s; 4:2:0/4:4:4
    the other way: 1510/753 vs 1384/706 — tools/chip_session.log).
    live_entries (traced scalar, default: all) masks the scan suffix at
    index >= live_entries to emit zero bits — uneven MCU-band sharding's
    dead-row entries (parallel/tiled.py) ride the fused path with it.
    rows_loc sets the per-tile output row window of the matmul assembly
    (tiles denser than that take the sequential fallback; tests shrink it
    to force the fallback on real content); force_fallback compiles the
    fallback alone (byte-identity coverage). tile overrides the grid
    step's entry count (default: the module TILE) — small restart
    intervals pass the smallest legal size covering their entries so
    per-interval padding shrinks from TILE-sized to near-exact.
    """
    assert capacity_bytes % 4 == 0
    if tile is None:
        tile = TILE
    # The two-level offset scan reshapes t2 = tile/2 as (128, t2/128).T,
    # so t2/128 must be a whole power of two: tile in 256, 512, 1024, ...
    if tile < 256 or tile % 256 or (tile // 256) & (tile // 256 - 1):
        raise ValueError(
            f"entropy tile must be 256 * a power of two, got {tile}"
        )
    if rows_loc is None:
        # Keep the matmul-assembly fast path's density threshold at
        # ~128 bits/entry average per tile (rows_loc * 4096 bits over
        # tile entries) as the tile scales; none of the corpus content
        # classes reach it (architecture 4:4:4 peaks ~59 bits/entry).
        rows_loc = max(64, tile // 32)
    num_entries = z.shape[0]
    num_words = capacity_bytes // 4
    # Data rows + the matmul window's slack (a tile whose pairs start on
    # the last data row still commits a full rows_loc-row window).
    rows = -(-(num_words // 128 + rows_loc + 1) // 8) * 8

    if not dc_in_kernel:
        # Merge the DC difference into slot 0 of each entry (slot 0 is the
        # raw DC, which the scan never emits): the kernel's AC formulas
        # then cover the DC slot verbatim. int16 is safe: valid scans have
        # |DC diff| <= 2047 (pipeline.validate_scan_ranges).
        assert dc_diff is not None
        z = jnp.concatenate(
            [dc_diff.astype(z.dtype)[:, None], z[:, 1:]], axis=1
        )
    padded_e = -(-num_entries // tile) * tile
    if padded_e != num_entries:
        pad = padded_e - num_entries
        z = jnp.concatenate([z, jnp.zeros((pad, 64), z.dtype)])
    # Two entries per kernel row: row-major (E, 64) and (E/2, 128) are the
    # same HBM bytes, so this reshape is free.
    z2 = z.reshape(padded_e // 2, 128)
    if live_entries is None:
        live_entries = num_entries
    live2 = jnp.asarray(live_entries, jnp.int32).reshape(1, 1)
    if init_dc is None:
        init_dc = jnp.zeros((3,), jnp.int32)
    init2 = jnp.asarray(init_dc, jnp.int32).reshape(1, 3)

    if luts is None:
        lut_rows = jnp.asarray(_lut_rows())
        scal = jnp.asarray(_lut_scalars(), jnp.int32).reshape(1, 4)
    else:
        lut_rows, scal = custom_lut_operands(*luts)

    kernel = functools.partial(
        _entropy_kernel,
        tile=tile,
        num_entries=num_entries,
        blocks_per_mcu=geom.blocks_per_mcu,
        hv=geom.h_factor * geom.v_factor,
        num_words=num_words,
        rows_loc=rows_loc,
        force_fallback=force_fallback,
        dc_in_kernel=dc_in_kernel,
    )
    t2 = tile // 2
    out, bits = pl.pallas_call(
        kernel,
        grid=(padded_e // tile,),
        in_specs=[
            pl.BlockSpec((t2, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
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
            # Fallback-assembly staging (the sequential loop needs the
            # contribution rows addressable) + per-pair row locations.
            pltpu.VMEM((t2, 128), jnp.uint32),
            pltpu.VMEM((t2, 128), jnp.uint32),
            pltpu.VMEM((t2, 1), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            # Previous tile's last 8 rows of raw DCs (full-width, lanes 0
            # and 64 live) for the cross-tile DC-difference lookbacks.
            pltpu.VMEM((8, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(z2, lut_rows, scal, live2, init2)
    return out.reshape(-1)[:num_words], bits[0, 0]
