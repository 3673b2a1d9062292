"""Experiment: fused entropy kernel section cost map (dev).

Times truncated variants of the fused kernel (a derived copy with a `stage`
knob) to attribute the ~17.5 ns/entry to its sections:

  sym      symbolization only (run-length state, bit lengths, amplitudes)
  gather   + Huffman gathers + slot bits/lens
  pack     + pair-local cumsum + word staircase + binary search (ew)
  prep     + tile offsets + alignment/rotation + quad merge (scratch writes)
  full     + sequential RMW assembly (the production kernel)

Each truncated stage writes an OR-reduction of its live arrays into
out_ref[0:8] so nothing is DCE'd; the reduction cost (~2% of a stage) is
accepted noise. Numbers are NOT correctness-relevant; the production kernel
is untouched.

    python tools/exp_kernel_sections.py [ratio]
"""
import functools
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


def _kernel(
    z_ref, dcdiff_ref, lut_ref, live_ref, out_ref, bits_ref,
    c0s, c1s, c2s, rloc, carry, acc2,
    *, tile, num_entries, blocks_per_mcu, hv, num_words, lut_scalars,
    n_chains, stage,
):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        if n_chains > 1:
            acc2[:] = jnp.zeros_like(acc2)
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
            a = a.astype(jnp.uint32) if a.dtype != jnp.uint32 else a
            r = a
            k = t2 // 8
            # log-step sublane fold to (8, 128)
            while r.shape[0] > 8:
                hlf = r.shape[0] // 2
                r = r[:hlf] | r[hlf:]
            red = red | r
        out_ref[0:8, :] = out_ref[0:8, :] | red
        bits_ref[0, 0] = 0

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

    d2 = dcdiff_ref[:]
    diff = jnp.where(half, d2[:, 1:2], d2[:, 0:1])
    dc_bl = ep._bit_length_f32(jnp.abs(diff))
    dc_ampl = jnp.where(diff < 0, diff + (1 << dc_bl) - 1, diff) & (
        (1 << dc_bl) - 1
    )
    is_dc = lane64 == 0
    sym = jnp.where(is_dc, (dc_bl + 1) << 4, ac_sym)

    if stage == "sym":
        finish(sym, ac_ampl, dc_ampl, run_dist, last_nz)
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

    ampl = jnp.where(is_dc, dc_ampl, ac_ampl)
    bl = jnp.where(is_dc, dc_bl, ac_bl)
    coded_bits = ((cl & 0xFFFFF) << bl) | ampl
    coded_len = (cl >> 20) + bl

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

    # Pair-local inclusive prefix: MXU triangular matmul (as production).
    ii = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    tri = (ii <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)).astype(
        jnp.bfloat16
    )
    incl = jnp.dot(
        slot_lens.astype(jnp.bfloat16), tri,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    local_off = incl - slot_lens
    pair_bits = incl[:, 127:128]

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
    if stage == "pack_csmm":
        # Candidate: u32 prefix sum as four 8-bit-chunk MXU matmuls
        # (each chunk < 256 is bf16-exact; f32 partials < 2^24; u32
        # wraparound on recombine keeps differences exact).
        cs = jnp.zeros_like(contrib)
        for kk in range(4):
            ck = (
                ((contrib >> (8 * kk)) & 0xFF)
                .astype(jnp.int32).astype(jnp.bfloat16)
            )
            csk = jnp.dot(ck, tri, preferred_element_type=jnp.float32)
            cs = cs + (csk.astype(jnp.int32).astype(jnp.uint32) << (8 * kk))
    else:
        cs = contrib
        k = 1
        while k < 128:
            cs = cs + ep._shift_lanes(cs, k, jnp.uint32(0))
            k *= 2
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
    acc = jnp.where(live, g_cs - ep._shift_lanes(g_cs, 1, jnp.uint32(0)), 0)
    lo_last = lo[:, 127:128]
    ew = acc | jnp.where(colw == w_last + 1, lo_last, 0)

    if stage in ("pack", "pack_csmm"):
        finish(ew, pair_bits)
        return

    incl_p = pair_bits.reshape(1, t2)
    k = 1
    while k < t2:
        incl_p = incl_p + ep._shift_lanes(incl_p, k, 0)
        k *= 2
    incl_p = incl_p.reshape(t2, 1)
    base = carry[0]
    off_p = base + incl_p - pair_bits
    carry[0] = base + incl_p[t2 - 1, 0]
    bits_ref[0, 0] = carry[0]
    max_off = (num_words - 2 * ep.ENTRY_WORDS - 1) * 32
    off_p = jnp.minimum(off_p, max_off)

    sbit = (off_p & 31).astype(jnp.uint32)
    spill = jnp.where(sbit == 0, jnp.uint32(0), ew << (32 - sbit))
    sh = (ew >> sbit) | ep._shift_lanes(spill, 1, jnp.uint32(0))
    q_a = off_p >> 5
    r_a = q_a >> 7
    l_a = q_a & 127
    w_rel = (lane - l_a) & 127
    rot = jnp.take_along_axis(sh, w_rel, axis=1)
    c0 = jnp.where(lane >= l_a, rot, 0)
    c1 = jnp.where(lane < l_a, rot, 0)
    r_next = pltpu.roll(r_a, t2 - 1, 0)
    d = r_next - r_a
    c0n = pltpu.roll(c0, t2 - 1, 0)
    c1n = pltpu.roll(c1, t2 - 1, 0)
    c0s[:] = c0 | jnp.where(d == 0, c0n, 0)
    c1s[:] = c1 | jnp.where(d == 0, c1n, jnp.where(d == 1, c0n, 0))
    c2s[:] = jnp.where(d == 1, c1n, 0)
    rloc[:] = r_a

    if stage == "prep":
        # scratch writes above are the payload; fold a token dependency.
        out_ref[0:8, :] = out_ref[0:8, :] | c0s[0:8, :]
        return

    nrows = out_ref.shape[0]

    def rmw(target, band, p):
        r = band * nrows + rloc[p, 0]
        contrib = jnp.concatenate(
            [c0s[pl.ds(p, 1), :], c1s[pl.ds(p, 1), :], c2s[pl.ds(p, 1), :]],
            axis=0,
        )
        cur = target[pl.ds(r, 3), :]
        target[pl.ds(r, 3), :] = cur | contrib

    if n_chains == 1:
        def body(i, _):
            rmw(out_ref, 0, 2 * i)
            return 0

        jax.lax.fori_loop(0, t2 // 2, body, 0, unroll=False)
    else:
        def body(i, _):
            rmw(out_ref, 0, 2 * n_chains * i)
            for k in range(1, n_chains):
                rmw(acc2, k - 1, 2 * (n_chains * i + k))
            return 0

        jax.lax.fori_loop(0, t2 // (2 * n_chains), body, 0, unroll=False)

        @pl.when(pid == pl.num_programs(0) - 1)
        def _():
            merged = out_ref[:]
            for k in range(n_chains - 1):
                merged = merged | acc2[k * nrows : (k + 1) * nrows, :]
            out_ref[:] = merged


def run_stage(z, dc_diff, stage):
    num_entries = geom.num_mcus * geom.blocks_per_mcu
    num_words = cap // 4
    rows = -(-(num_words // 128 + 3) // 8) * 8
    n_chains = min(8, max(1, (32 * (1 << 20)) // cap))
    n_chains = 1 << (n_chains.bit_length() - 1)
    padded_e = -(-num_entries // TILE) * TILE
    if padded_e != num_entries:
        pad = padded_e - num_entries
        z = jnp.concatenate([z, jnp.zeros((pad, 64), z.dtype)])
        dc_diff = jnp.concatenate([dc_diff, jnp.zeros((pad,), dc_diff.dtype)])
    z2 = z.reshape(padded_e // 2, 128)
    d2 = dc_diff.astype(jnp.int32).reshape(padded_e // 2, 2)
    live2 = jnp.full((1, 1), num_entries, jnp.int32)
    kernel = functools.partial(
        _kernel,
        tile=TILE,
        num_entries=num_entries,
        blocks_per_mcu=geom.blocks_per_mcu,
        hv=geom.h_factor * geom.v_factor,
        num_words=num_words,
        lut_scalars=ep._lut_scalars(),
        n_chains=n_chains,
        stage=stage,
    )
    t2 = TILE // 2
    out, bits = pl.pallas_call(
        kernel,
        grid=(padded_e // TILE,),
        in_specs=[
            pl.BlockSpec((t2, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t2, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
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
            pltpu.VMEM((t2, 128), jnp.uint32),
            pltpu.VMEM((t2, 1), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM(((n_chains - 1) * rows if n_chains > 1 else 8, 128),
                       jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(z2, d2, jnp.asarray(ep._lut_rows()), live2)
    return out


def main():
    rng = np.random.default_rng(0)
    E = geom.num_mcus * geom.blocks_per_mcu
    z = jnp.asarray(
        (rng.integers(-40, 40, (B, E, 64)) * (rng.random((B, E, 64)) < 0.22)),
        jnp.int16,
    )
    d = jnp.asarray(rng.integers(-60, 60, (B, E)), jnp.int32)
    print(f"ratio {RATIO}, E={E}, tiles/img={-(-E // TILE)}")
    prev = 0.0
    for stage in ("sym", "gather", "pack_pre", "pack_cs", "pack", "pack_csmm", "prep", "full"):
        f = jax.jit(functools.partial(
            lambda zz, dd, s: jax.vmap(lambda a, b: run_stage(a, b, s))(zz, dd),
            s=stage,
        ))
        out = f(z, d)
        _ = np.asarray(out[0, 0, 0])
        t0 = time.perf_counter()
        iters = 60
        for _ in range(iters):
            out = f(z, d)
        _ = np.asarray(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        ns = dt * 1e6 / (B * E)
        print(f"{stage:8s} {dt:8.2f} ms/batch  (+{dt - prev:6.2f})  {ns:5.1f} ns/entry")
        prev = dt


main()
