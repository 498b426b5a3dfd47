"""Pallas TPU kernels for the receiver's hot ops.

Three kernels, each with an XLA-path oracle in ops/correlate.py / ops/
decimate.py and interpret-mode parity tests (tests/test_pallas_kernels.py):

1. ``fir_decimate_pallas`` — polyphase FIR decimator. The front end's
   bandwidth-bound op (16.368 -> 2.046 Msps brings every antenna sample
   through it). The input is laid out as polyphase branches so each tap is a
   contiguous vector FMA in VMEM; each input sample crosses HBM->VMEM exactly
   once per tile (+ a 128-lane halo), the speed-of-light pattern for a
   memory-bound stencil. The XLA path (ops/decimate.py) runs the generic
   strided-convolution lowering over I and Q separately.

2. ``peak_reduce_pallas`` — fused max / argmax / sum over each satellite's
   [Doppler x code phase] acquisition grid in one pass. The XLA path reads
   the [S, D, L] non-coherent grid several times (argmax, take_along_axis,
   peak_strength's sum — acquire/engine.py:119-126); this kernel streams it
   once through VMEM and emits the three statistics per satellite.

3. ``wipeoff_lag_correlate_pallas`` — the tracker's per-millisecond hot op:
   carrier wipeoff (cos/sin NCO phasor) fused with the (2K+1)-lag correlation
   window dot products for all channels (the body of track/loop.py's scan
   step). Complex math is expanded to real I/Q planes because the correlation
   replica is real +/-1: corr = sum_l w[l] * chunk[l] * e^{-j phi(l)} splits
   into two real reductions per lag.

All kernels run compiled on TPU and in interpreter mode elsewhere (the
``interpret`` argument defaults to "not on TPU"), so the CPU test suite
exercises exactly the kernel code the TPU runs.

Reference analogues: gypsum/utils.py:59-108 (correlation core),
gypsum/tracker.py:264-313 (per-ms tracking work); the reference has no
decimator (its 8x/16x inputs are declared but unusable,
gypsum/radio_input.py:62-92).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 128  # lanes of look-ahead appended to each decimator tile


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# =====================================================================
# 1. Polyphase FIR decimator
# =====================================================================


def _fir_decimate_kernel(
    h_ref, x_ref, halo_ref, y_ref, *, taps_per_phase: int, factor: int, tile: int
):
    """One output tile of the polyphase decimator.

    x_ref: [2 * factor, tile] — polyphase branches (I planes then Q planes),
    branch q holding x[m * factor + q], starting at this tile's first output.
    halo_ref: [2 * factor, 128] — the next 128 branch columns (look-ahead).
    h_ref (SMEM): [factor, taps_per_phase padded] — branch-major taps.
    y_ref: [2, tile] — decimated I/Q planes.
    """
    x = jnp.concatenate([x_ref[:, :], halo_ref[:, :]], axis=1)  # [2F, tile+128]
    acc_i = jnp.zeros((1, tile), dtype=jnp.float32)
    acc_q = jnp.zeros((1, tile), dtype=jnp.float32)
    for p in range(taps_per_phase):
        for q in range(factor):
            h = h_ref[q, p]
            acc_i += h * x[q, p : p + tile][None, :]
            acc_q += h * x[factor + q, p : p + tile][None, :]
    y_ref[0, :] = acc_i[0, :]
    y_ref[1, :] = acc_q[0, :]


@functools.partial(
    jax.jit, static_argnames=("factor", "taps_per_phase", "interpret", "tile")
)
def _fir_decimate_pallas_jit(
    x_poly: jax.Array,  # [2 * factor, m_padded] f32 polyphase branches
    h_poly: jax.Array,  # [factor, taps_per_phase padded] f32
    *,
    factor: int,
    taps_per_phase: int,
    interpret: bool,
    tile: int,
) -> jax.Array:
    m_padded = x_poly.shape[1]
    n_tiles = (m_padded - _HALO) // tile
    blocks_per_tile = tile // _HALO

    return pl.pallas_call(
        functools.partial(
            _fir_decimate_kernel, taps_per_phase=taps_per_phase, factor=factor, tile=tile
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(h_poly.shape, lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2 * factor, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            # The halo: the 128 columns right after tile j, addressed in
            # 128-wide block units so a *blocked* index map can express the
            # overlap (element offset (j+1)*tile = block (j+1)*blocks_per_tile).
            pl.BlockSpec(
                (2 * factor, _HALO),
                lambda j: (0, (j + 1) * blocks_per_tile),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((2, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, n_tiles * tile), jnp.float32),
        interpret=interpret,
    )(h_poly, x_poly, x_poly)


def fir_decimate_pallas(
    x: np.ndarray | jax.Array,
    taps: np.ndarray,
    factor: int,
    interpret: bool | None = None,
    tile: int = 2048,
) -> jax.Array:
    """Anti-alias filter + decimate by ``factor``.

    Accepts complex [N] or float planes [N, 2]; returns float planes
    [n_out, 2] (the device-boundary convention, core/planes.py). Matches
    ops/decimate.py semantics ('VALID': output n is
    sum_t taps[t] * x[n * factor + T - 1 - t], length (N - T)//factor + 1).
    """
    if interpret is None:
        interpret = _default_interpret()
    from gypsum_tpu.core.planes import to_planes

    if tile % _HALO:
        # The halo BlockSpec addresses blocks in 128-lane units
        # (blocks_per_tile = tile // 128); a non-multiple tile would silently
        # misalign the halo and corrupt the decimator output.
        raise ValueError(f"tile ({tile}) must be a multiple of {_HALO}")
    x = jnp.asarray(x)
    x_planes_in = x.astype(jnp.float32) if (x.ndim == 2 and x.shape[-1] == 2) else jnp.asarray(to_planes(x))
    taps = np.asarray(taps, dtype=np.float32)
    t_len = len(taps)
    n = x_planes_in.shape[0]
    n_out = (n - t_len) // factor + 1
    if n_out <= 0:
        raise ValueError(f"signal ({n}) shorter than filter ({t_len})")

    # y[n] = sum_t hr[t] x[n*factor + t] with hr = taps reversed. Split
    # t = p*factor + q: branch q = x[m*factor + q], tap matrix H[q, p].
    taps_per_phase = -(-t_len // factor)
    if taps_per_phase > _HALO:
        raise ValueError(f"filter too long for the {_HALO}-lane halo: {t_len} taps")
    hr = np.zeros(taps_per_phase * factor, dtype=np.float32)
    hr[:t_len] = taps[::-1]
    h_poly = np.zeros((factor, _round_up(taps_per_phase, 8)), dtype=np.float32)
    h_poly[:, :taps_per_phase] = hr.reshape(taps_per_phase, factor).T

    # Polyphase branches, padded so the last tile's halo read is in bounds.
    m_padded = _round_up(n_out, tile) + _HALO
    need = m_padded * factor
    xf = jnp.concatenate(
        [x_planes_in, jnp.zeros((max(0, need - n), 2), dtype=jnp.float32)]
    )[:need]  # [need, 2]
    branches = xf.reshape(m_padded, factor, 2)  # [m, factor, iq]
    x_poly = jnp.concatenate(
        [branches[:, :, 0].T, branches[:, :, 1].T], axis=0
    )  # [2*factor, m_padded]

    y = _fir_decimate_pallas_jit(
        x_poly,
        jnp.asarray(h_poly),
        factor=factor,
        taps_per_phase=taps_per_phase,
        interpret=interpret,
        tile=tile,
    )
    return y[:, :n_out].T  # [n_out, 2] float planes


# =====================================================================
# 2. Fused acquisition peak reduce (max / argmax / sum per satellite)
# =====================================================================


def _peak_reduce_kernel(x_ref, out_ref, acc_ref, *, tile: int, n_valid: int):
    """Streaming row-wise reduction over [rows, n_cols] in column tiles.

    acc_ref (VMEM scratch): [3, rows] running (max, argmax, sum) per row.
    out_ref: [rows, 128] — col 0 max, col 1 argmax (f32-exact: < 2^24),
    col 2 sum (128 lanes for the TPU tile shape; the host reads cols 0..2).
    """
    j = pl.program_id(1)
    rows = x_ref.shape[0]

    @pl.when(j == 0)
    def _():
        acc_ref[0, :] = jnp.full((rows,), -jnp.inf, dtype=jnp.float32)
        acc_ref[1, :] = jnp.zeros((rows,), dtype=jnp.float32)
        acc_ref[2, :] = jnp.zeros((rows,), dtype=jnp.float32)

    x = x_ref[:, :]  # [rows, tile]
    col0 = j * tile
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (rows, tile), dimension=1)
    valid = col_ids < n_valid
    x_max_in = jnp.where(valid, x, -jnp.inf)
    x_sum_in = jnp.where(valid, x, 0.0)

    tile_max = jnp.max(x_max_in, axis=1)  # [rows]
    tile_arg = jnp.argmax(x_max_in, axis=1).astype(jnp.float32) + col0.astype(jnp.float32)
    tile_sum = jnp.sum(x_sum_in, axis=1)

    better = tile_max > acc_ref[0, :]
    acc_ref[0, :] = jnp.where(better, tile_max, acc_ref[0, :])
    acc_ref[1, :] = jnp.where(better, tile_arg, acc_ref[1, :])
    acc_ref[2, :] = acc_ref[2, :] + tile_sum

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), dimension=1)
        out = jnp.where(lane == 0, acc_ref[0, :][:, None], 0.0)
        out = jnp.where(lane == 1, acc_ref[1, :][:, None], out)
        out = jnp.where(lane == 2, acc_ref[2, :][:, None], out)
        out_ref[:, :] = out


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "row_block"))
def _peak_reduce_jit(
    flat: jax.Array, *, interpret: bool, tile: int = 8192, row_block: int = 8
) -> jax.Array:
    s, n_cols = flat.shape
    n_valid = n_cols
    n_cols_pad = _round_up(n_cols, tile)
    s_pad = _round_up(s, row_block)
    flat = jnp.pad(flat, ((0, s_pad - s), (0, n_cols_pad - n_cols)))

    out = pl.pallas_call(
        functools.partial(_peak_reduce_kernel, tile=tile, n_valid=n_valid),
        grid=(s_pad // row_block, n_cols_pad // tile),
        in_specs=[
            pl.BlockSpec((row_block, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((row_block, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, row_block), jnp.float32)],
        interpret=interpret,
    )(flat)
    return out[:s, :3]


def peak_reduce_pallas(
    grid: jax.Array, interpret: bool | None = None
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(max, flat argmax, sum) over all trailing axes of ``grid``, per row.

    ``grid``: [S, ...] float32 (e.g. the [S, D, L] non-coherent acquisition
    power). Returns three [S] arrays; argmax is int32 over the flattened
    trailing axes, ties resolved to the lowest index (numpy semantics).
    """
    if interpret is None:
        interpret = _default_interpret()
    s = grid.shape[0]
    flat = grid.reshape(s, -1)
    out = _peak_reduce_jit(flat, interpret=interpret)
    return out[:, 0], out[:, 1].astype(jnp.int32), out[:, 2]


# =====================================================================
# 3. Fused carrier wipeoff + lag-window correlate (tracking hot op)
# =====================================================================


def _wipeoff_lag_kernel(
    chunk_ref,  # [8, L_pad] — rows 0..1 are the I and Q planes (rest pad)
    wide_ref,  # [8, W] — this block's 8 channels' wide replica rows
    params_ref,  # [8, 3] SMEM — (carrier_phase, doppler, window base) per row
    out_ref,  # [8, 2 * n_lags_pad] — per channel: I plane cols then Q plane
    *,
    length: int,
    n_lags: int,
    n_lags_pad: int,
    inv_fs: float,
):
    ci = chunk_ref[0, :length][None, :]
    cq = chunk_ref[1, :length][None, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * n_lags_pad), dimension=1)

    rows = []
    for r in range(8):
        theta = params_ref[r, 0]
        doppler = params_ref[r, 1]
        base = params_ref[r, 2].astype(jnp.int32)

        # Mosaic's iota is integer-only; build indices as i32 and convert.
        l_idx = jax.lax.broadcasted_iota(jnp.int32, (1, length), dimension=1).astype(
            jnp.float32
        )
        phase = theta + (2.0 * np.pi * inv_fs) * doppler * l_idx  # [1, L]
        c = jnp.cos(phase)
        s = jnp.sin(phase)
        # chunk * e^{-j phase}: a = I cos + Q sin, b = Q cos - I sin.
        a = ci * c + cq * s
        b = cq * c - ci * s

        # Rotate the wide replica so the window starts at lane 0; base < L
        # and base + (n_lags - 1) + length <= W, so the rotated tail never
        # wraps into the slices read below (lane padding past W only rotates
        # garbage into lanes we never read). pltpu.roll is the Mosaic-native
        # dynamic rotate (jnp.roll lowers to dynamic_slice, which the Pallas
        # TPU backend does not implement); its shift rotates *forward*, so
        # shift by W_pad - base to bring lane `base` to lane 0.
        w_len = wide_ref.shape[1]  # 128-aligned (wrapper pads)
        rolled = pltpu.roll(wide_ref[r, :][None, :], w_len - base, axis=1)  # [1, W_pad]
        row = jnp.zeros((1, 2 * n_lags_pad), dtype=jnp.float32)
        for k in range(n_lags):
            # Sub-slice k is the replica rolled by (cp + K - k): descending
            # lag order, so fill the output flipped (entry j = lag cp-K+j),
            # matching ops/correlate.py:rolled_lag_window.
            w = rolled[:, k : k + length]  # [1, L]
            j = n_lags - 1 - k
            row = jnp.where(lane == j, jnp.sum(w * a), row)
            row = jnp.where(lane == n_lags_pad + j, jnp.sum(w * b), row)
        rows.append(row)
    out_ref[:, :] = jnp.concatenate(rows, axis=0)


@functools.partial(
    jax.jit, static_argnames=("length", "n_lags", "inv_fs", "interpret")
)
def wipeoff_lag_correlate_pallas(
    chunk_iq: jax.Array,  # [2, L] f32 — I/Q planes of one millisecond
    replicas_wide: jax.Array,  # [S, W] f32 — W >= 2L + 2K (tiled replicas)
    params: jax.Array,  # [S, 3] f32 — (carrier_phase, doppler, window base)
    *,
    length: int,
    n_lags: int,
    inv_fs: float,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused per-ms tracking correlations for all channels.

    Returns [S, 2, n_lags]: planes (I, Q) of the correlation at lags
    (prompt-K .. prompt+K), identical to track/loop.py's wipeoff + einsum
    (window base = (L - cp_int - K) mod L, see track/loop.py:window_slices).
    """
    if interpret is None:
        interpret = _default_interpret()
    s_count, w = replicas_wide.shape
    s_pad = _round_up(s_count, 8)
    w_pad = _round_up(w, 128)  # dynamic rotate needs lane-aligned rows
    l_pad = _round_up(length, 128)
    n_lags_pad = _round_up(n_lags, 128)
    # Chunk planes ride an 8-row buffer (TPU sublane tile); rows 2..7 pad.
    chunk_pad = jnp.pad(
        chunk_iq.astype(jnp.float32), ((0, 8 - chunk_iq.shape[0]), (0, l_pad - length))
    )
    replicas_pad = jnp.pad(
        replicas_wide.astype(jnp.float32), ((0, s_pad - s_count), (0, w_pad - w))
    )
    params_pad = jnp.pad(params.astype(jnp.float32), ((0, s_pad - s_count), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _wipeoff_lag_kernel,
            length=length,
            n_lags=n_lags,
            n_lags_pad=n_lags_pad,
            inv_fs=inv_fs,
        ),
        grid=(s_pad // 8,),
        in_specs=[
            pl.BlockSpec((8, l_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, w_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 3), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, 2 * n_lags_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, 2 * n_lags_pad), jnp.float32),
        interpret=interpret,
    )(chunk_pad, replicas_pad, params_pad)
    out = out[:s_count].reshape(s_count, 2, n_lags_pad)
    return out[:, :, :n_lags]
