"""Fused Pallas kernels: level shift + DCT + quantize + zigzag, one VMEM pass.

The block batch lives in HBM as (N, 64); each grid step streams a
(TILE, 64) tile through VMEM and writes zigzag-ordered quantized
coefficients — level shift, transform, quantization division, truncation and
the zigzag permutation all fused so the tile is touched exactly once.

RealDCT kernel: the per-step cosine factors are baked into two (64, 64)
constant matrices whose *columns are pre-permuted into zigzag order*, so the
output comes out zigzag-ordered for free and the kernel body is a pure
VPU multiply-accumulate chain with the reference's exact f32 association
order (bit-identical coefficients, like ops/dct.real_dct_quant_ordered).

binDCT kernel: the 8-point lifting network runs on contiguous 8-column
groups (the block's rows); the row-direction pass reuses the same code on a
transposed-within-block lane permutation. Integer-only, bit-identical to
the reference's un-descaled binDCT-C.

Both per-plane (N, 64) kernels are RETIRED from the production dispatch
(the transposed 3-plane kernels below own the TPU path via
pipeline.dct_planes_zigzag); they remain as independent verification
tiers, exercised in interpret mode by tests/test_kernels.py — the
transposed kernels are asserted bit-identical against them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg_encoder_tpu import tables
from jpeg_encoder_tpu.ops.dct import dct_basis_f32

_F32 = np.float32
TILE = 512  # blocks per grid step: (512, 64) f32 tiles, ~128 KiB each


@functools.cache
def _realdct_constants(
    quant_key: str, quality: int | None = None
) -> tuple[np.ndarray, ...]:
    """Per-step factor rows + scale/quant rows, zigzag-permuted columns.

    a_steps[k, zz(uv)] = basis[u, x_k] and b_steps[k, zz(uv)] = basis[v, y_k]
    for step k = x_k * 8 + y_k, so the kernel's accumulator is directly in
    zigzag order. scale = (0.25 * alpha_u) * alpha_v, quant in f32.
    """
    q_luma, q_chroma = tables.scaled_quant_tables(quality)
    quant = q_luma if quant_key == "y" else q_chroma
    basis = dct_basis_f32()
    zz = tables.ZIGZAG_ORDER
    u_of = (np.arange(64) // 8)[zz]  # output column -> u
    v_of = (np.arange(64) % 8)[zz]
    x_of = np.arange(64) // 8  # step -> x
    y_of = np.arange(64) % 8
    a_steps = basis[u_of[None, :], x_of[:, None]].astype(_F32)  # (step, col)
    b_steps = basis[v_of[None, :], y_of[:, None]].astype(_F32)
    inv_sqrt2 = _F32(1.0) / _F32(np.sqrt(2.0))
    alpha = np.where(np.arange(8) == 0, inv_sqrt2, _F32(1.0)).astype(_F32)
    scale = ((_F32(0.25) * alpha[u_of]) * alpha[v_of]).astype(_F32)
    quant_zz = quant.reshape(64)[zz].astype(_F32)
    return a_steps, b_steps, scale[None, :], quant_zz[None, :]


def _realdct_kernel(x_ref, a_ref, b_ref, scale_ref, quant_ref, out_ref):
    shifted = x_ref[:].astype(jnp.float32) - 128.0
    acc = jnp.zeros_like(shifted)
    for k in range(64):
        term = shifted[:, k : k + 1] * a_ref[k : k + 1, :]
        acc = acc + term * b_ref[k : k + 1, :]
    coeffs = (scale_ref[:] * acc) / quant_ref[:]
    out_ref[:] = jnp.trunc(coeffs).astype(jnp.int32)


def real_dct_quant_zigzag_pallas(
    blocks_u8: jnp.ndarray, is_luma: bool, interpret: bool = False,
    quality: int | None = None,
) -> jnp.ndarray:
    """(N, 64) uint8 -> (N, 64) int32 quantized coefficients, zigzag order."""
    n = blocks_u8.shape[0]
    padded_n = -(-n // TILE) * TILE
    x = jnp.zeros((padded_n, 64), jnp.int32).at[:n].set(
        blocks_u8.astype(jnp.int32)
    )
    a, b, scale, quant = (
        jnp.asarray(c)
        for c in _realdct_constants("y" if is_luma else "c", quality)
    )
    out = pl.pallas_call(
        _realdct_kernel,
        grid=(padded_n // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((padded_n, 64), jnp.int32),
        interpret=interpret,
    )(x, a, b, scale, quant)
    return out[:n]


# --------------------------------------------------------------------------
# Transposed-chain RealDCT (candidate hot path, measured on hardware).
#
# The (N, 64) chain pays a LANE-extract broadcast per step
# (shifted[:, k:k+1]): a cross-lane shuffle, the dominant per-step cost of
# the ordered chain (see the perf journal's ablations). Transposed —
# coefficients in SUBLANES, blocks in LANES — step k's input is a SUBLANE
# slice xt[k:k+1, :] (native sublane broadcast) and the per-step basis
# constants become (64, 1) columns via the verified (1, 64) -> (64, 1)
# reshape idiom. Arithmetic per lane is identical to the reference
# association ((px * cos_u) * cos_v), so outputs stay bit-exact.
#
# Two forms, same chain body:
#   A (`transposed="kernel"`): (N, 64) in/out; both transposes happen
#     in-VMEM inside the kernel (needs Mosaic transpose support).
#   B (`transposed="xla"`): the kernel consumes/produces (64, N); XLA
#     transposes outside (isolates the chain speedup from transpose cost).
# --------------------------------------------------------------------------

def _realdct_chain_t(xt, a_ref, b_ref, scale_ref, quant_ref):
    """The 64-step ordered chain on a (64, T) transposed tile."""
    acc = jnp.zeros_like(xt)
    for k in range(64):
        a_col = a_ref[k : k + 1, :].reshape(64, 1)
        b_col = b_ref[k : k + 1, :].reshape(64, 1)
        acc = acc + (xt[k : k + 1, :] * a_col) * b_col
    s_col = scale_ref[0:1, :].reshape(64, 1)
    q_col = quant_ref[0:1, :].reshape(64, 1)
    return jnp.trunc((s_col * acc) / q_col).astype(jnp.int32)


def _realdct_t_kernel(x_ref, a_ref, b_ref, scale_ref, quant_ref, out_ref):
    xt = jnp.transpose(x_ref[:].astype(jnp.float32) - 128.0)  # (64, T)
    out_ref[:] = jnp.transpose(
        _realdct_chain_t(xt, a_ref, b_ref, scale_ref, quant_ref)
    )


def _realdct_tpre_kernel(x_ref, a_ref, b_ref, scale_ref, quant_ref, out_ref):
    xt = x_ref[:].astype(jnp.float32) - 128.0  # already (64, T)
    out_ref[:] = _realdct_chain_t(xt, a_ref, b_ref, scale_ref, quant_ref)


def real_dct_quant_zigzag_pallas_t(
    blocks_u8: jnp.ndarray, is_luma: bool, interpret: bool = False,
    quality: int | None = None, transposed: str = "kernel",
) -> jnp.ndarray:
    """(N, 64) uint8 -> (N, 64) int32 zigzag coeffs via the transposed chain."""
    n = blocks_u8.shape[0]
    padded_n = -(-n // TILE) * TILE
    x = jnp.zeros((padded_n, 64), jnp.int32).at[:n].set(
        blocks_u8.astype(jnp.int32)
    )
    a, b, scale, quant = (
        jnp.asarray(c)
        for c in _realdct_constants("y" if is_luma else "c", quality)
    )
    consts_specs = [
        pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if transposed == "kernel":
        out = pl.pallas_call(
            _realdct_t_kernel,
            grid=(padded_n // TILE,),
            in_specs=[
                pl.BlockSpec(
                    (TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                *consts_specs,
            ],
            out_specs=pl.BlockSpec(
                (TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((padded_n, 64), jnp.int32),
            interpret=interpret,
        )(x, a, b, scale, quant)
        return out[:n]
    assert transposed == "xla"
    xt = x.T  # (64, padded_n)
    out_t = pl.pallas_call(
        _realdct_tpre_kernel,
        grid=(padded_n // TILE,),
        in_specs=[
            pl.BlockSpec((64, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            *consts_specs,
        ],
        out_specs=pl.BlockSpec(
            (64, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((64, padded_n), jnp.int32),
        interpret=interpret,
    )(xt, a, b, scale, quant)
    return out_t.T[:n]


T_TILE = 1024  # blocks (lanes) per transposed-chain grid step


def _unpack_pixel_rows(xw, shift: int = 0):
    """(16, T) packed i32 -> 64 (1, T) i32 pixel rows, level-shifted.

    Input row r holds pixels (x = r // 2, y = 4 * (r % 2) + 0..3) of every
    block in the tile, one block per lane, four u8 pixels per i32 word
    (little-endian bytes — the _plane_pack_t layout). Unpacking is pure
    register work (shift + mask per row), which costs far less than the
    host-side relayouts it replaces (blockify + i16 pad + (N,64)->(64,N)
    transpose: 1.36 vs 0.66 ms per 1080p plane-batch for the packed
    build)."""
    rows = [None] * 64
    for r in range(16):
        w = xw[r : r + 1, :]
        x = r // 2
        for b in range(4):
            v = (w >> (8 * b)) & 0xFF
            rows[x * 8 + (r % 2) * 4 + b] = v - shift
    return rows


def _realdct_t_planes_cols_kernel(
    x_ref, at_ref, bt_ref, sq_ref, out_ref, *, tile, ny
):
    out_ref[:] = _realdct_t_planes_chain(
        x_ref, at_ref, bt_ref, sq_ref, tile=tile, ny=ny
    )


def _realdct_t_planes_rows_kernel(
    x_ref, at_ref, bt_ref, sq_ref, out_ref, *, tile, ny
):
    """Same chain, but the (64, T) result transposes in-VMEM and writes
    (T, 64) rows — the scan marshal's input layout — so no XLA relayout
    of the full coefficient array exists downstream. Measured per ratio:
    a large win where the marshal regroups rows (4:2:0 1939 -> 2098,
    4:2:2 bin 1414 -> 1631 Mpix/s) but a ~0.5 ms loss at 4:4:4, whose
    lane-concat marshal preferred the cols + XLA .T form — so the
    wrappers pick the form by geometry (tools/exp_dct_outrows,
    bench_cell r4)."""
    out_ref[:] = _realdct_t_planes_chain(
        x_ref, at_ref, bt_ref, sq_ref, tile=tile, ny=ny
    ).T


def _realdct_t_planes_chain(
    x_ref, at_ref, bt_ref, sq_ref, *, tile, ny
):
    """Transposed chain over the 3-plane concat: per-LANE quant select.

    Blocks are LANES here: step k's pixel is a (1, T) register row (the
    packed-u8 unpack) and the per-step basis constants are loop-invariant
    (64, 1) lane slices of pre-transposed (64, 64) matrices — hoisted, no
    per-step (1, 64) -> (64, 1) relayout (that relayout made the first
    transposed kernel 2.5x slower than this form; tools/exp_dct_chain_t).
    The luma/chroma quantization split (the only per-plane difference —
    see ops/dct.dct_quantize_planes) is a lane mask between the qy and qc
    columns of sq_ref; the division itself stays a real f32 `/` (the
    bit-exactness contract rules out reciprocal-multiply)."""
    pid = pl.program_id(0)
    rows = _unpack_pixel_rows(x_ref[:])
    a_cols = [at_ref[:, k : k + 1] for k in range(64)]  # loop-invariant
    b_cols = [bt_ref[:, k : k + 1] for k in range(64)]
    acc = jnp.zeros((64, tile), jnp.float32)
    for k in range(64):
        xk = rows[k].astype(jnp.float32) - 128.0
        acc = acc + (xk * a_cols[k]) * b_cols[k]
    s_col = sq_ref[:, 0:1]
    is_luma = (
        pid * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    ) < ny
    q = jnp.where(is_luma, sq_ref[:, 1:2], sq_ref[:, 2:3])
    return jnp.trunc((s_col * acc) / q).astype(jnp.int16)


def _realdct_t_planes_fast_chain(x_ref, m_ref, sq_ref, *, tile, ny):
    """MXU matmul RealDCT on the transposed 3-plane concat (--fast-dct).

    Same packed (16, T) input and (64, T) output as the ordered chain, but
    the transform is a (64, 64) x (64, T) matmul against the zigzag-row
    Kronecker basis (scale folded) instead of the 192-flop/output VPU
    chain. Precision: level-shifted pixels are integers in [-128, 127] —
    EXACT in bf16 — so only the basis matrix needs widening; a manual
    3-term bf16 split of M (m1 + m2 + m3 with f32 accumulation, ~2^-24
    relative residual) gets f32-grade accuracy from 3 MXU passes where
    Precision.HIGHEST pays 6 (Mosaic rejects HIGH, which would express
    this directly; the split matrices are built from the constant operand
    in-kernel, which Mosaic folds). Summation order still differs from
    the reference's scalar loop, so quantized coefficients may deviate
    where the quant truncation sits on a rounding boundary (~1e-5 of
    coefficients, by +-1) — the documented --fast-dct contract (cli.py),
    now at kernel speed instead of the XLA fallback that used to make
    the flag pointless on TPU (slower than the exact chain at 4:4:4:
    1204 vs 1306 Mpix/s, bench_cell r5)."""
    pid = pl.program_id(0)
    rows = _unpack_pixel_rows(x_ref[:])
    xt = (jnp.concatenate(rows, axis=0) - 128).astype(jnp.bfloat16)
    m = m_ref[:]
    m1 = m.astype(jnp.bfloat16)
    r1 = m - m1.astype(jnp.float32)
    m2 = r1.astype(jnp.bfloat16)
    m3 = (r1 - m2.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    coeffs = jnp.zeros((64, tile), jnp.float32)
    for mk in (m3, m2, m1):  # small-to-large: favorable f32 addition order
        coeffs = coeffs + jax.lax.dot_general(
            mk, xt, dn, preferred_element_type=jnp.float32
        )
    is_luma = (
        pid * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    ) < ny
    q = jnp.where(is_luma, sq_ref[:, 1:2], sq_ref[:, 2:3])
    return jnp.trunc(coeffs / q).astype(jnp.int16)


def _realdct_t_planes_fast_cols_kernel(x_ref, m_ref, sq_ref, out_ref, *,
                                       tile, ny):
    out_ref[:] = _realdct_t_planes_fast_chain(
        x_ref, m_ref, sq_ref, tile=tile, ny=ny
    )


def _realdct_t_planes_fast_rows_kernel(x_ref, m_ref, sq_ref, out_ref, *,
                                       tile, ny):
    out_ref[:] = _realdct_t_planes_fast_chain(
        x_ref, m_ref, sq_ref, tile=tile, ny=ny
    ).T


@functools.cache
def _fast_kron_zigzag() -> np.ndarray:
    """(64, 64) f32: M[zz(uv), xy] — Kronecker DCT basis with the scale
    folded and rows permuted to zigzag order, so `M @ X` yields
    zigzag-ordered coefficient rows directly (matching the chain kernels'
    output layout)."""
    from jpeg_encoder_tpu.ops.dct import dct_kron_matrix

    return np.ascontiguousarray(dct_kron_matrix()[:, tables.ZIGZAG_ORDER].T)


def _out_rows_default(y_plane, cb_plane) -> bool:
    """Pick the kernel's output form by geometry: in-kernel transposed
    (N, 64) rows when chroma is subsampled (the marshal's regroup path
    prefers row inputs), (64, N) cols + XLA .T at 4:4:4 (equal plane
    shapes), whose lane-concat marshal measured faster on the cols form.
    """
    return y_plane.shape != cb_plane.shape


def real_dct_quant_planes_zigzag_pallas_t(
    y_plane: jnp.ndarray,
    cb_plane: jnp.ndarray,
    cr_plane: jnp.ndarray,
    interpret: bool = False,
    quality: int | None = None,
    out_rows: bool | None = None,
    fast: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All three planes through ONE transposed-chain kernel.

    Padded (H, W) uint8 planes x3 -> (N, 64) int16 zigzag coefficients
    x3, bit-exact vs ops/dct.real_dct_quant_ordered. Input rides the
    packed (16, N) i32 layout (_plane_pack_t): one bitcast-i32 transpose
    per plane, unpacked in-register by the kernel — replacing the
    blockify -> i16 pad -> (N,64)->(64,N) transpose chain, whose layout
    ops cost 2x the packed build and dominated the pipeline's front.
    Unlike the XLA ordered-chain fusion — whose emitter windowing is
    bistable and program-structure-dependent (see
    kernels/entropy_pallas.encode_entropy_fused docstring) — this
    kernel's cost is stable: ~80% of the VPU-bound ideal for the
    192-flop/output ordered chain.

    fast=True swaps the chain body for the MXU Kronecker matmul
    (_realdct_t_planes_fast_chain): same input/output layouts, not
    bit-exact (the --fast-dct contract)."""
    xp, ny, nc, n = _plane_pack_t(y_plane, cb_plane, cr_plane, T_TILE)
    padded_n = xp.shape[1]
    a, b, scale, qy = (
        np.asarray(c) for c in _realdct_constants("y", quality)
    )
    qc = np.asarray(_realdct_constants("c", quality)[3])
    # scale / qy / qc as (64, 8) column blocks (lane-sliceable; 8-lane
    # minor keeps the block spec tiling-friendly).
    sq = np.zeros((64, 8), _F32)
    sq[:, 0] = scale.reshape(64)
    sq[:, 1] = qy.reshape(64)
    sq[:, 2] = qc.reshape(64)
    if out_rows is None:
        out_rows = _out_rows_default(y_plane, cb_plane)
    mat_spec = pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((16, T_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        mat_spec,
        pl.BlockSpec((64, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if fast:
        operands = (xp, jnp.asarray(_fast_kron_zigzag()), jnp.asarray(sq))
        rows_kernel, cols_kernel = (
            _realdct_t_planes_fast_rows_kernel,
            _realdct_t_planes_fast_cols_kernel,
        )
    else:
        at = jnp.asarray(a.T.copy())  # (uv, step) columns
        bt = jnp.asarray(b.T.copy())
        operands = (xp, at, bt, jnp.asarray(sq))
        in_specs.insert(2, mat_spec)
        rows_kernel, cols_kernel = (
            _realdct_t_planes_rows_kernel, _realdct_t_planes_cols_kernel
        )
    if out_rows:
        out = pl.pallas_call(
            functools.partial(rows_kernel, tile=T_TILE, ny=ny),
            grid=(padded_n // T_TILE,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (T_TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((padded_n, 64), jnp.int16),
            interpret=interpret,
        )(*operands)
    else:
        out = pl.pallas_call(
            functools.partial(cols_kernel, tile=T_TILE, ny=ny),
            grid=(padded_n // T_TILE,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (64, T_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((64, padded_n), jnp.int16),
            interpret=interpret,
        )(*operands).T
    return out[:ny], out[ny : ny + nc], out[ny + nc : n]


def _pack_plane_t(plane: jnp.ndarray) -> jnp.ndarray:
    """Padded (H, W) uint8 plane -> (16, N) i32 packed transposed layout.

    Row r holds pixels (x = r // 2, y = 4 * (r % 2) + 0..3) of every 8x8
    block, one block per lane, 4 pixels per little-endian i32 word. Built
    as two staged transposes — first hoist the word parity (the y quad)
    out of the minor dim over the FLAT pixel-row axis, then split rows
    into (by, 8) and hoist x — which XLA emits 3x faster than the direct
    (by,8,bx,2)->(1,3,0,2) permutation (1.15 vs 3.47 ms for 3 full 1080p
    batch-8 planes; tools/exp_pack_t.py — output verified identical)."""
    hgt, wdt = plane.shape
    by, bx = hgt // 8, wdt // 8
    p32 = jax.lax.bitcast_convert_type(
        plane.reshape(hgt, wdt // 4, 4), jnp.int32
    )
    t = p32.reshape(by * 8, bx, 2).transpose(2, 0, 1)    # (2, 8by, bx)
    t = t.reshape(2, by, 8, bx).transpose(2, 0, 1, 3)    # (8, 2, by, bx)
    return t.reshape(16, by * bx)


def _plane_pack_t(y_plane, cb_plane, cr_plane, tile):
    """[Y | Cb | Cr] packed columns -> zero-padded (16, padded_n) i32,
    plus (ny, nc, n) block counts."""
    xs = [_pack_plane_t(p) for p in (y_plane, cb_plane, cr_plane)]
    ny, nc = xs[0].shape[1], xs[1].shape[1]
    x = jnp.concatenate(xs, axis=1)
    n = x.shape[1]
    padded_n = -(-n // tile) * tile
    if padded_n != n:
        x = jnp.pad(x, ((0, 0), (0, padded_n - n)))
    return x, ny, nc, n


def _lift8_rows(x: list[jnp.ndarray]) -> list[jnp.ndarray]:
    """8-point all-lifting binDCT-C over eight (1, T) register rows.

    Same shift/add network as ops/dct._bindct_lifting_1d (natural-order
    output list); int32 >> is arithmetic, matching Rust
    (dct_quant.rs:84-129)."""
    x0, x1, x2, x3, x4, x5, x6, x7 = x
    s7 = x0 - x7
    s0 = x0 - (s7 >> 1)
    s6 = x1 - x6
    s1 = x1 - (s6 >> 1)
    s5 = x2 - x5
    s2 = x2 - (s5 >> 1)
    s4 = x3 - x4
    s3 = x3 - (s4 >> 1)
    s6 = ((s5 * 3) >> 3) + s6
    s5 = ((s6 * 5) >> 3) - s5
    t0 = s0 + s3
    t3 = s0 - s3
    t1 = s1 + s2
    t2 = s1 - s2
    t4 = s4 + s5
    t5 = s4 - s5
    t6 = s7 - s6
    t7 = s7 + s6
    t4 = t4 - (t7 >> 3)
    t0 = t0 + t1
    t1 = -t1 + (t0 >> 1)
    t2 = t2 - ((t3 * 3) >> 3)
    t3 = t3 + ((t2 * 3) >> 3)
    t5 = t5 + ((t6 * 7) >> 3)
    t6 = t6 - (t5 >> 1)
    return [t0, t7, t3, t6, t1, t5, t2, t4]


def _bindct_t_planes_kernel(
    x_ref, q_ref, out_ref, *, tile, ny, descale, out_rows=True
):
    """Transposed-layout binDCT over the 3-plane concat.

    Block positions are SUBLANES here, so every lifting input is a (1, T)
    register row and the whole 2-D transform is register-resident shift/
    add work — no (N, 8, 8) shapes (which pad 16x under the TPU's (8, 128)
    tiling and made the XLA lifting fusion cost ~10.7 ms/batch at 4:4:4).
    The zigzag permutation is free: outputs are assembled in zigzag
    sublane order. descale=False is bit-identical to ops/dct.bin_dct_quant
    (bug-parity un-descaled variant, dct_quant.rs:182-186); descale=True
    folds the lifting network's diagonal gains into a per-lane f32
    multiply before the quant divide (the corrected binDCT-C —
    ops/dct.bindct_descale_2d), bit-identical to the XLA descale path
    (same mul -> div -> trunc f32 association per element)."""
    pid = pl.program_id(0)
    rows = _unpack_pixel_rows(x_ref[:], shift=128)   # 64 x (1, T) i32
    mid = [None] * 64
    for bx in range(8):                              # transform block rows
        lifted = _lift8_rows([rows[8 * bx + y] for y in range(8)])
        for j in range(8):
            mid[8 * bx + j] = lifted[j]
    fin = [None] * 64
    for by in range(8):                              # transform block cols
        lifted = _lift8_rows([mid[8 * bx + by] for bx in range(8)])
        for j in range(8):
            fin[8 * j + by] = lifted[j]
    zz = [int(i) for i in tables.ZIGZAG_ORDER]
    zigzagged = jnp.concatenate([fin[s] for s in zz], axis=0)  # (64, T)
    is_luma = (
        pid * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    ) < ny
    if descale:
        s = q_ref[:, 0:1]                            # f32 descale gains
        q = jnp.where(is_luma, q_ref[:, 1:2], q_ref[:, 2:3])
        res = jnp.trunc(
            zigzagged.astype(jnp.float32) * s / q
        ).astype(jnp.int16)
    else:
        q = jnp.where(is_luma, q_ref[:, 0:1], q_ref[:, 1:2])
        res = (
            jnp.sign(zigzagged) * (jnp.abs(zigzagged) // q)
        ).astype(jnp.int16)
    if out_rows:
        # In-VMEM transpose: write (T, 64) scan-marshal rows directly (no
        # XLA relayout of the coefficient array downstream; see the rows
        # form of the RealDCT kernel above for the per-ratio measurement).
        out_ref[:] = res.T
    else:
        out_ref[:] = res


def bin_dct_quant_planes_zigzag_pallas_t(
    y_plane: jnp.ndarray,
    cb_plane: jnp.ndarray,
    cr_plane: jnp.ndarray,
    interpret: bool = False,
    quality: int | None = None,
    descale: bool = False,
    out_rows: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All three planes through ONE transposed binDCT kernel.

    Padded (H, W) uint8 planes x3 -> (N, 64) int16 zigzag coefficients
    x3, bit-exact vs ops/dct.bin_dct_quant (reference bug-parity path
    with descale=False; corrected binDCT-C with descale=True — see
    _bindct_t_planes_kernel). Input rides the packed (16, N) i32 layout;
    see real_dct_quant_planes_zigzag_pallas_t."""
    xp, ny, nc, n = _plane_pack_t(y_plane, cb_plane, cr_plane, T_TILE)
    qy, _ = _bindct_constants("y", quality)
    qc, _ = _bindct_constants("c", quality)
    if descale:
        from jpeg_encoder_tpu.ops.dct import bindct_descale_2d

        zz = tables.ZIGZAG_ORDER
        q = np.zeros((64, 8), np.float32)
        q[:, 0] = bindct_descale_2d()[zz]
        q[:, 1] = qy.reshape(64).astype(np.float32)
        q[:, 2] = qc.reshape(64).astype(np.float32)
    else:
        q = np.zeros((64, 8), np.int32)
        q[:, 0] = qy.reshape(64)
        q[:, 1] = qc.reshape(64)
    padded_n = xp.shape[1]
    if out_rows is None:
        out_rows = _out_rows_default(y_plane, cb_plane)
    in_specs = [
        pl.BlockSpec((16, T_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((64, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    kern = functools.partial(
        _bindct_t_planes_kernel, tile=T_TILE, ny=ny, descale=descale,
        out_rows=out_rows,
    )
    if out_rows:
        out = pl.pallas_call(
            kern,
            grid=(padded_n // T_TILE,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (T_TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((padded_n, 64), jnp.int16),
            interpret=interpret,
        )(xp, jnp.asarray(q))
    else:
        out = pl.pallas_call(
            kern,
            grid=(padded_n // T_TILE,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (64, T_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((64, padded_n), jnp.int16),
            interpret=interpret,
        )(xp, jnp.asarray(q)).T
    return out[:ny], out[ny : ny + nc], out[ny + nc : n]


# --------------------------------------------------------------------------
# binDCT kernel
# --------------------------------------------------------------------------

def _lift_groups(v: jnp.ndarray) -> jnp.ndarray:
    """binDCT-C lifting across the 8 contiguous 8-column groups of (N, 64).

    Same shift/add network as ops/dct._bindct_lifting_1d, with each x_i
    being one 8-column group (one row of every block in the tile).
    """
    x = [v[:, 8 * i : 8 * (i + 1)] for i in range(8)]
    x0, x1, x2, x3, x4, x5, x6, x7 = x

    s7 = x0 - x7
    s0 = x0 - (s7 >> 1)
    s6 = x1 - x6
    s1 = x1 - (s6 >> 1)
    s5 = x2 - x5
    s2 = x2 - (s5 >> 1)
    s4 = x3 - x4
    s3 = x3 - (s4 >> 1)

    s6 = ((s5 * 3) >> 3) + s6
    s5 = ((s6 * 5) >> 3) - s5

    t0 = s0 + s3
    t3 = s0 - s3
    t1 = s1 + s2
    t2 = s1 - s2
    t4 = s4 + s5
    t5 = s4 - s5
    t6 = s7 - s6
    t7 = s7 + s6

    t4 = t4 - (t7 >> 3)
    t0 = t0 + t1
    t1 = -t1 + (t0 >> 1)
    t2 = t2 - ((t3 * 3) >> 3)
    t3 = t3 + ((t2 * 3) >> 3)
    t5 = t5 + ((t6 * 7) >> 3)
    t6 = t6 - (t5 >> 1)

    return jnp.concatenate([t0, t7, t3, t6, t1, t5, t2, t4], axis=1)


@functools.cache
def _bindct_constants(
    quant_key: str, quality: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    q_luma, q_chroma = tables.scaled_quant_tables(quality)
    quant = q_luma if quant_key == "y" else q_chroma
    # Quant divide happens in natural order; zigzag applies afterwards, so
    # fold both into one gather permutation + pre-permuted quant row.
    zz = tables.ZIGZAG_ORDER
    return quant.reshape(64)[zz].astype(np.int32)[None, :], zz.astype(np.int32)


_ZIGZAG_LIST = [int(i) for i in tables.ZIGZAG_ORDER]


def _block_transpose(v: jnp.ndarray) -> jnp.ndarray:
    """Transpose each 8x8 block held as 64 contiguous lanes."""
    return v.reshape(-1, 8, 8).swapaxes(1, 2).reshape(-1, 64)


def _bindct_kernel(x_ref, quant_ref, out_ref):
    shifted = x_ref[:].astype(jnp.int32) - 128
    # Row transform: lift across columns == lift groups of the transposed
    # block layout; transpose back, then the column transform lifts rows.
    rows_done = _block_transpose(_lift_groups(_block_transpose(shifted)))
    freq = _lift_groups(rows_done)
    # Static zigzag permutation as lane slices (no constant-array captures).
    zigzagged = jnp.concatenate(
        [freq[:, i : i + 1] for i in _ZIGZAG_LIST], axis=1
    )
    q = quant_ref[:]
    out_ref[:] = jnp.sign(zigzagged) * (jnp.abs(zigzagged) // q)


def bin_dct_quant_zigzag_pallas(
    blocks_u8: jnp.ndarray, is_luma: bool, interpret: bool = False,
    quality: int | None = None,
) -> jnp.ndarray:
    """(N, 64) uint8 -> (N, 64) int32 quantized binDCT coeffs, zigzag order."""
    n = blocks_u8.shape[0]
    padded_n = -(-n // TILE) * TILE
    x = jnp.zeros((padded_n, 64), jnp.int32).at[:n].set(
        blocks_u8.astype(jnp.int32)
    )
    quant_zz, _ = _bindct_constants("y" if is_luma else "c", quality)
    out = pl.pallas_call(
        _bindct_kernel,
        grid=(padded_n // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((padded_n, 64), jnp.int32),
        interpret=interpret,
    )(x, jnp.asarray(quant_zz))
    return out[:n]
