"""Experiment: fused entropy kernel section cost map (dev).

Times truncated variants of the fused kernel (a derived copy of
kernels/entropy_pallas._entropy_kernel with a `stage` knob) to attribute
the per-entry cost to its sections:

  load     tile read + i32 widen only (the per-stage floor)
  dc       + in-kernel DC differencing (static scan-order lookbacks)
  sym      + run-length state, bit lengths, amplitudes, symbols
  gather   + Huffman gathers + slot bits/lens
  prep_off + pair-bit MXU cumsum + tile-offset scan + carry
  pack_pre + phase-folded slot offsets + word staircase + contribs
  pack_cs  + chunked-MXU u32 prefix sum over slot contributions
  pack     + 7-step binary search + segment-difference word extraction
  prep_rot + per-pair rotation gather + row split
  prep     + one-hot row-assignment build
  full     + matmul scatter + window RMW (the production kernel)

Each truncated stage writes an OR-reduction of its live arrays into
out_ref[0:8] so nothing is DCE'd; the reduction cost (~2% of a stage) is
accepted noise. Numbers are NOT correctness-relevant; the production kernel
is untouched.

    python tools/exp_kernel_sections.py [ratio]
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg_encoder_tpu import pipeline
from jpeg_encoder_tpu.config import EncoderConfig, parse_subsampling_ratio
from jpeg_encoder_tpu.kernels import entropy_pallas as ep

H, W, B = 1088, 1920, 8
RATIO = parse_subsampling_ratio(sys.argv[1]) if len(sys.argv) > 1 else (4, 2, 0)
config = EncoderConfig(subsampling_ratio=RATIO)
geom = config.geometry(W, H)
cap = pipeline.default_capacity_bytes(geom, config.capacity_bytes_per_pixel)

TILE = ep.TILE
ROWS_LOC = 64


def _kernel(
    z_ref, lut_ref, live_ref, init_ref, out_ref, bits_ref,
    c0s, c1s, rloc, carry, dc_carry,
    *, tile, num_entries, blocks_per_mcu, hv, num_words, lut_scalars,
    stage,
):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        carry[0] = 0

    t2 = tile // 2
    z = z_ref[:].astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (t2, 128), 1)
    half = lane >= 64
    lane64 = lane & 63
    row2 = jax.lax.broadcasted_iota(jnp.int32, (t2, 1), 0)
    entry_idx = pid * tile + 2 * row2 + half.astype(jnp.int32)
    valid = entry_idx < jnp.minimum(num_entries, live_ref[0, 0])
    is_luma = (entry_idx % blocks_per_mcu) < hv

    def finish(*arrs):
        red = jnp.zeros((8, 128), jnp.uint32)
        for a in arrs:
            if a.dtype != jnp.uint32:
                # Mosaic has no f32->u32 vector cast; route through i32.
                a = a.astype(jnp.int32).astype(jnp.uint32)
            r = a
            while r.shape[0] > 8:
                hlf = r.shape[0] // 2
                r = r[:hlf] | r[hlf:]
            while r.shape[1] > 128:
                hlf = r.shape[1] // 2
                r = r[:, :hlf] | r[:, hlf:]
            # Lane dims in (1, 128) don't broadcast against the (8, 128)
            # accumulator (e.g. ONEHOT=col's (t2, ROWS_LOC=64) one-hots):
            # halve down to 1 so the OR broadcasts.
            while 1 < r.shape[1] < 128 and r.shape[1] % 2 == 0:
                hlf = r.shape[1] // 2
                r = r[:, :hlf] | r[:, hlf:]
            red = red | r
        out_ref[0:8, :] = out_ref[0:8, :] | red
        bits_ref[0, 0] = 0

    if stage == "load16":
        # Tile read WITHOUT the i16 -> i32 widen: bitcast pairs of i16
        # lanes to i32 (free relabeling) and fold. Separates the cast
        # cost from the DMA + grid overhead floor.
        z16 = pltpu.bitcast(z_ref[:], jnp.int32)   # (T2, 64) i32
        finish(z16)
        return

    if stage == "load":
        finish(z)
        return

    # ---- in-kernel DC differencing (mirrors production) ----
    bpm = blocks_per_mcu
    dcs = jnp.where(lane64 == 0, z, 0)
    ext = jnp.concatenate([dc_carry[:], dcs], axis=0)
    swap = pltpu.roll(ext, 64, 1)

    def back(src, s):
        return src[8 - s : 8 - s + t2, :]

    def prev_full(d):
        if d % 2 == 0:
            return back(ext, d // 2)
        return jnp.where(
            half, back(swap, (d - 1) // 2), back(swap, (d + 1) // 2)
        )

    d_first = bpm - hv + 1
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
    prev = jnp.where(entry_idx < d, init, sel)
    z = jnp.where(lane64 == 0, z - prev, z)
    dc_carry[:] = dcs[t2 - 8 :, :]

    if stage == "dc":
        finish(z)
        return

    nz_marker = jnp.where((z != 0) & (lane64 > 0), lane64, 0)
    cm = nz_marker
    k = 1
    while k < 64:
        cm = jnp.maximum(cm, ep._shift_half(cm, k, 0))
        k *= 2
    run_base = ep._shift_half(cm, 1, 0)
    last_idx = jnp.where(half, 127, 63)
    last_nz = jnp.take_along_axis(cm, last_idx, axis=1)

    is_nonzero = (z != 0) & (lane64 > 0)
    run_dist = lane64 - run_base
    zeros_before = run_dist - 1

    ac_bl = ep._bit_length_f32(jnp.abs(z))
    ac_sym = ((zeros_before & 15) << 4) | ac_bl
    ac_ampl = jnp.where(z < 0, z + (1 << ac_bl) - 1, z) & ((1 << ac_bl) - 1)
    is_dc = lane64 == 0
    sym = jnp.where(is_dc, (ac_bl + 1) << 4, ac_sym)

    if stage == "sym":
        finish(sym, ac_ampl, run_dist, last_nz)
        return

    def bc(row):
        return jnp.broadcast_to(lut_ref[row : row + 1, :], (t2, 128))

    idx = sym & 127
    hi_sym = sym >= 128
    if blocks_per_mcu % 2 == 0 and hv % 2 == 0:
        row_lo = jnp.where(is_luma, bc(0), bc(2))
        row_hi = jnp.where(is_luma, bc(1), bc(3))
        g_lo_tbl = jnp.take_along_axis(row_lo, idx, axis=1)
        g_hi_tbl = jnp.take_along_axis(row_hi, idx, axis=1)
        cl = jnp.where(hi_sym, g_hi_tbl, g_lo_tbl)
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

    zrl_y, zrl_c, eob_y, eob_c = lut_scalars
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
    slot_bits = jnp.where(valid, slot_bits, jnp.uint32(0))
    slot_lens = jnp.where(valid, slot_lens, 0)

    if stage == "gather":
        finish(slot_bits, slot_lens)
        return

    ii = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    tri = (ii <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)).astype(
        jnp.bfloat16
    )
    incl = jnp.dot(
        slot_lens.astype(jnp.bfloat16), tri,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    pair_bits = incl[:, 127:128]

    import os as _os
    scanform = _os.environ.get("SCANFORM", "sublane")  # production form
    onehot = _os.environ.get("ONEHOT", "row")  # row (prod) | col (no relayout)
    base = carry[0]
    max_off = (num_words - 2 * ep.ENTRY_WORDS - 1) * 32
    if scanform == "repeat":
        # PRODUCTION form (kernels/entropy_pallas.py): strided compact
        # layout pair p at [p % g128, p // g128] via reshape(128, g).T —
        # consecutive pairs run down the SUBLANES of each column, so the
        # scan is a short sublane scan plus a 1-vreg lane scan of column
        # totals; expansion back is pltpu.repeat (tile semantics:
        # rep[r] = off8[r % g128]) + a per-row static lane gather picking
        # lane r // g128 = exactly pair r. (An earlier draft used the
        # row-major reshape + `idxm = r & 127`, which resolves to pair
        # (r % g)*128 + (r & 127) under tile-repeat — wrong pair.)
        g128 = t2 // 128
        gshift = g128.bit_length() - 1
        mt = pair_bits.reshape(128, g128).T        # (g128, 128)
        incl8 = mt
        rr8 = jax.lax.broadcasted_iota(jnp.int32, (g128, 128), 0)
        k = 1
        while k < g128:
            incl8 = incl8 + jnp.where(
                rr8 >= k, pltpu.roll(incl8, k, 0), 0
            )
            k *= 2
        col_tot = incl8[g128 - 1 : g128, :]
        ex = ep._shift_lanes(col_tot, 1, 0)
        k = 1
        while k < 128:
            ex = ex + ep._shift_lanes(ex, k, 0)
            k *= 2
        incl8 = incl8 + ex
        carry[0] = base + incl8[g128 - 1, 127]
        off8 = jnp.minimum(base + incl8 - mt, max_off)
        rep = pltpu.repeat(off8, 128, 0)           # (t2, 128)
        idxm = jax.lax.broadcasted_iota(jnp.int32, (t2, 128), 0) >> gshift
        off_p = jnp.take_along_axis(rep, idxm, axis=1)  # (t2,128) bcast
        incl_p = off_p                            # for stage probes only
        off_row = None                            # forces ONEHOT=col path
    elif scanform == "lane":
        pb_row = pair_bits.reshape(1, t2)
        incl_row = pb_row
        k = 1
        while k < t2:
            incl_row = incl_row + ep._shift_lanes(incl_row, k, 0)
            k *= 2
        incl_p = incl_row.reshape(t2, 1)
        carry[0] = base + incl_p[t2 - 1, 0]
        off_p = jnp.minimum(base + incl_p - pair_bits, max_off)
        off_row = jnp.minimum(base + incl_row - pb_row, max_off)
    else:
        if scanform == "sublane":
            incl_p = pair_bits
            rr = jax.lax.broadcasted_iota(jnp.int32, (t2, 1), 0)
            k = 1
            while k < t2:
                incl_p = incl_p + jnp.where(
                    rr >= k, pltpu.roll(incl_p, k, 0), 0
                )
                k *= 2
        elif scanform == "mxu":
            # (t2, 1) -> (t2//128, 128) row-major, intra-row prefix via
            # two 8-bit-chunk tri matmuls, cross-row offsets via a tiny
            # sublane scan on the row totals.
            g = pair_bits.reshape(t2 // 128, 128)
            tri_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            tri2 = (tri_i <= jax.lax.broadcasted_iota(
                jnp.int32, (128, 128), 1)).astype(jnp.bfloat16)
            pref = jnp.zeros_like(g)
            for kk in range(2):
                ck = ((g >> (8 * kk)) & 0xFF).astype(jnp.bfloat16)
                pk = jnp.dot(ck, tri2, preferred_element_type=jnp.float32)
                pref = pref + (pk.astype(jnp.int32) << (8 * kk))
            rows_tot = pref[:, 127:128]              # (t2/128, 1)
            rr = jax.lax.broadcasted_iota(
                jnp.int32, (t2 // 128, 1), 0)
            s = rows_tot
            k = 1
            while k < t2 // 128:
                s = s + jnp.where(rr >= k, pltpu.roll(s, k, 0), 0)
                k *= 2
            incl_p = (pref + (s - rows_tot)).reshape(t2, 1)
        else:
            raise ValueError(scanform)
        carry[0] = base + incl_p[t2 - 1, 0]
        exc = incl_p - pair_bits
        off_p = jnp.minimum(base + exc, max_off)
        if onehot == "col":
            off_row = None
        else:
            off_row = jnp.minimum(base + exc.reshape(1, t2), max_off)
    bits_ref[0, 0] = carry[0]

    if stage == "prep_off":
        finish(off_p, incl, *(() if off_row is None else (off_row,)))
        return

    sbit = off_p & 31
    local_off = incl - slot_lens + sbit
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

    contrib = hi + ep._shift_lanes(lo, 1, jnp.uint32(0))
    if stage == "pack_pre":
        finish(contrib, word_idx, pair_bits)
        return

    cs = jnp.zeros_like(contrib)
    for kk in range(4):
        ck = ((contrib >> (8 * kk)) & 0xFF).astype(jnp.int32).astype(
            jnp.bfloat16
        )
        csk = jnp.dot(ck, tri, preferred_element_type=jnp.float32)
        cs = cs + (csk.astype(jnp.int32).astype(jnp.uint32) << (8 * kk))
    if stage == "pack_cs":
        finish(cs, word_idx, pair_bits)
        return

    colw = lane
    sidx = jnp.zeros((t2, 128), jnp.int32)
    for step in (64, 32, 16, 8, 4, 2, 1):
        cand = sidx + step
        v = jnp.take_along_axis(word_idx, cand, axis=1)
        sidx = jnp.where(v <= colw, cand, sidx)
    w_last = word_idx[:, 127:128]
    g_cs = jnp.take_along_axis(cs, sidx, axis=1)
    live = colw <= w_last
    ew = jnp.where(live, g_cs - ep._shift_lanes(g_cs, 1, jnp.uint32(0)), 0)
    lo_last = lo[:, 127:128]
    ew = ew | jnp.where(colw == w_last + 1, lo_last, 0)

    if stage == "pack":
        finish(ew, pair_bits)
        return

    q_a = off_p[:, 0:1] >> 5
    r_a = q_a >> 7
    l_a = q_a & 127
    w_rel = (lane - l_a) & 127
    rot = jnp.take_along_axis(ew, w_rel, axis=1)
    c0 = jnp.where(lane >= l_a, rot, 0)
    c1 = jnp.where(lane < l_a, rot, 0)
    if stage == "prep_rot":
        finish(c0, c1)
        return

    nrows = out_ref.shape[0]
    r_first = jnp.minimum(base >> 12, nrows - ROWS_LOC)
    if onehot == "col":
        # Column-form one-hots: (t2, ROWS_LOC) built straight from the
        # (t2, 1) pair offsets — no (t2,1)->(1,t2) relayout anywhere —
        # consumed by a dim-0-contracting dot_general (transposed matmul).
        r_rel_c = (off_p[:, 0:1] >> 12) - r_first    # (t2, 1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (t2, ROWS_LOC), 1)
        a0 = (jj == r_rel_c).astype(jnp.bfloat16)    # (t2, ROWS_LOC)
        a1 = (jj == r_rel_c + 1).astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))
    else:
        r_rel = (off_row >> 12) - r_first
        ii_r = jax.lax.broadcasted_iota(jnp.int32, (ROWS_LOC, t2), 0)
        a0 = (ii_r == r_rel).astype(jnp.bfloat16)
        a1 = (ii_r == r_rel + 1).astype(jnp.bfloat16)
        dn = None

    if stage == "prep":
        finish(c0, c1, a0.astype(jnp.float32), a1.astype(jnp.float32))
        return

    acc_loc = jnp.zeros((ROWS_LOC, 128), jnp.uint32)
    for kk in range(4):
        c0k = ((c0 >> (8 * kk)) & 0xFF).astype(jnp.int32).astype(jnp.bfloat16)
        c1k = ((c1 >> (8 * kk)) & 0xFF).astype(jnp.int32).astype(jnp.bfloat16)
        if dn is not None:
            s = jax.lax.dot_general(
                a0, c0k, dn, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                a1, c1k, dn, preferred_element_type=jnp.float32
            )
        else:
            s = jnp.dot(a0, c0k, preferred_element_type=jnp.float32) + (
                jnp.dot(a1, c1k, preferred_element_type=jnp.float32)
            )
        acc_loc = acc_loc | (s.astype(jnp.int32).astype(jnp.uint32) << (8 * kk))
    cur = out_ref[pl.ds(r_first, ROWS_LOC), :]
    out_ref[pl.ds(r_first, ROWS_LOC), :] = cur | acc_loc


def run_stage(z, stage):
    num_entries = geom.num_mcus * geom.blocks_per_mcu
    num_words = cap // 4
    rows = -(-(num_words // 128 + ROWS_LOC + 1) // 8) * 8
    padded_e = -(-num_entries // TILE) * TILE
    if padded_e != num_entries:
        pad = padded_e - num_entries
        z = jnp.concatenate([z, jnp.zeros((pad, 64), z.dtype)])
    z2 = z.reshape(padded_e // 2, 128)
    live2 = jnp.full((1, 1), num_entries, jnp.int32)
    init2 = jnp.zeros((1, 3), jnp.int32)
    kernel = functools.partial(
        _kernel,
        tile=TILE,
        num_entries=num_entries,
        blocks_per_mcu=geom.blocks_per_mcu,
        hv=geom.h_factor * geom.v_factor,
        num_words=num_words,
        lut_scalars=ep._lut_scalars(),
        stage=stage,
    )
    t2 = TILE // 2
    out, bits = pl.pallas_call(
        kernel,
        grid=(padded_e // TILE,),
        in_specs=[
            pl.BlockSpec((t2, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((t2, 128), jnp.uint32),
            pltpu.VMEM((t2, 128), jnp.uint32),
            pltpu.VMEM((t2, 1), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((8, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(z2, jnp.asarray(ep._lut_rows()), live2, init2)
    return out


def main():
    rng = np.random.default_rng(0)
    E = geom.num_mcus * geom.blocks_per_mcu
    z = jnp.asarray(
        (rng.integers(-40, 40, (B, E, 64)) * (rng.random((B, E, 64)) < 0.22)),
        jnp.int16,
    )
    print(f"ratio {RATIO}, E={E}, tiles/img={-(-E // TILE)}")
    prev = 0.0
    all_stages = ("load", "dc", "sym", "gather", "prep_off", "pack_pre",
                  "pack_cs", "pack", "prep_rot", "prep", "full")
    sel = os.environ.get("STAGES")
    for stage in (sel.split(",") if sel else all_stages):
        f = jax.jit(functools.partial(
            lambda zz, s: jax.vmap(lambda a: run_stage(a, s))(zz),
            s=stage,
        ))
        out = f(z)
        _ = np.asarray(out[0, 0, 0])
        t0 = time.perf_counter()
        iters = 60
        for _ in range(iters):
            out = f(z)
        _ = np.asarray(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        ns = dt * 1e6 / (B * E)
        print(f"{stage:8s} {dt:8.2f} ms/batch  (+{dt - prev:6.2f})  {ns:5.1f} ns/entry")
        prev = dt


main()
