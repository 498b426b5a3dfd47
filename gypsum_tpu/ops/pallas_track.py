"""Whole-block Pallas tracking kernel: the entire 1 kHz loop in one launch.

The XLA path (track/loop.py) expresses the tracker as ``lax.scan`` whose body
re-reads the [S, n_lags_eff, L] replica lag matrix from HBM every
millisecond — at 32 channels that is ~7-12 MB per step, and the block is
HBM-bandwidth/loop-overhead bound. This kernel runs the *whole block* as one
Mosaic program:

- the lag matrix is loaded into VMEM once and stays resident for all B
  milliseconds (the residency XLA's scan cannot promise);
- the per-ms IQ chunk arrives through the Pallas pipeline (grid over B, the
  emitter double-buffers the HBM->VMEM block DMA behind compute);
- the loop-filter carry lives in a VMEM scratch that persists across grid
  steps (TPU grids are sequential);
- per-ms observables stream out through the pipelined output block.

Numerics are the same as track/loop.py's hoisted path: carrier wipeoff by
cos/sin NCO phasor, all static lags evaluated as multiply+reduce against the
block window, E/P/L selected around the current prompt (clamped at the
margin), triangle-interpolated sub-sample peak, normalized Costas/early-late
discriminators, bias-corrected lock EMAs, sticky watchdog flag.

Reference analogue: the 1 kHz per-satellite Python loop of
gypsum/tracker.py:264-389.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gypsum_tpu.core.config import TrackingConfig
from gypsum_tpu.core.constants import GPS_L1_FREQUENCY_HZ

_EPS = 1e-12

# Carry rows in the (N_CARRY, S) scratch / state arrays.
_CP, _TH, _FD, _EERR, _EERR2, _EQ, _STEP, _LOST, _CPI0 = range(9)
N_CARRY = 9

# Output rows in the per-ms (N_OUT, S) block.
(
    _O_PI, _O_PQ, _O_CP, _O_CPM, _O_FD, _O_TH, _O_PLL, _O_DLL,
    _O_LOCKED, _O_QUAL, _O_LOST,
) = range(11)
N_OUT = 16  # padded to a sublane multiple


def _track_block_kernel(
    rows_ref,  # [S, NLE, L_pad] f32 — block-static lag matrix (VMEM resident)
    init_ref,  # [N_CARRY, S] f32 — initial carry (+ cpi0 row)
    chunk_ref,  # [8, L_pad] f32 — rows 0/1 = I/Q of this millisecond
    out_ref,  # [N_OUT, S] f32 — this millisecond's observables
    fin_ref,  # [N_CARRY, S] f32 — final carry (last write wins)
    carry,  # VMEM scratch [N_CARRY, S]
    *,
    cfg_consts: tuple,
    length: int,
    n_lags_eff: int,
    k_half: int,
    s_count: int,
):
    (
        kp_locked, ki_locked, kp_pullin, ki_pullin, lam_err, lam_q,
        aiding_scale, dll_gain, t_ms, inv_fs, lock_window_ms,
        max_err_var, min_quality, watchdog_warmup_ms, quality_drop,
    ) = cfg_consts
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry[:, :] = init_ref[:, :]

    cp = carry[_CP, :][None, :]  # (1, S)
    th = carry[_TH, :][None, :]
    fd = carry[_FD, :][None, :]
    cpi0 = carry[_CPI0, :][None, :]

    # --- carrier wipeoff (S, L_pad); lag rows are zero-padded past L so the
    # padded region contributes nothing to the reductions.
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (s_count, rows_ref.shape[2]), 1).astype(
        jnp.float32
    )
    phase = th.T + (2.0 * np.pi * inv_fs) * fd.T * l_idx  # (S, L_pad)
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    ci = chunk_ref[0, 0, :][None, :]
    cq = chunk_ref[0, 1, :][None, :]
    xr = ci * c + cq * s
    xi = cq * c - ci * s

    # --- all static lags: multiply + reduce against the resident lag matrix.
    # Columns assemble into (S, 128) accumulators via lane masks.
    lane = jax.lax.broadcasted_iota(jnp.int32, (s_count, 128), 1)
    all_r = jnp.zeros((s_count, 128), jnp.float32)
    all_i = jnp.zeros((s_count, 128), jnp.float32)
    for k in range(n_lags_eff):
        # Ascending lag order: lag (cp0 - K_eff + j) lives at column j, so
        # column j reads window slice (n_lags_eff - 1 - j) — the flip of
        # track/loop.py:window_slices.
        w = rows_ref[:, n_lags_eff - 1 - k, :]  # (S, L_pad)
        rk = jnp.sum(w * xr, axis=1, keepdims=True)  # (S, 1)
        ik = jnp.sum(w * xi, axis=1, keepdims=True)
        all_r = jnp.where(lane == k, rk, all_r)
        all_i = jnp.where(lane == k, ik, all_i)

    # --- select the (2K+1) lags around the current prompt.
    cp_int = jnp.floor(cp).astype(jnp.int32) % length  # (1, S)
    half = length // 2
    delta = ((cp_int - cpi0.astype(jnp.int32) + half) % length) - half
    k_eff = (n_lags_eff - 1) // 2
    j = jnp.clip(delta + k_eff, k_half, n_lags_eff - 1 - k_half)  # (1, S)
    jt = j.T  # (S, 1)

    def select(allv, off):
        # (S,) gather of one column per row, as a masked reduction.
        return jnp.sum(jnp.where(lane == (jt + off), allv, 0.0), axis=1, keepdims=True).T

    n_lags = 2 * k_half + 1
    sr = [select(all_r, m - k_half) for m in range(n_lags)]  # each (1, S)
    si = [select(all_i, m - k_half) for m in range(n_lags)]
    pw = [r * r + q * q for r, q in zip(sr, si)]

    early, late = pw[k_half - 1], pw[k_half + 1]

    # --- peak among the selected lags (unrolled argmax).
    best = pw[0]
    best_idx = jnp.zeros_like(best)
    for m in range(1, n_lags):
        better = pw[m] > best
        best = jnp.where(better, pw[m], best)
        best_idx = jnp.where(better, float(m), best_idx)
    pr = sr[0]
    pq = si[0]
    for m in range(1, n_lags):
        at = best_idx == float(m)
        pr = jnp.where(at, sr[m], pr)
        pq = jnp.where(at, si[m], pq)

    # Triangle interpolation of the |corr| peak (track/loop.py:206-218):
    # unrolled neighbor picks at the argmax lag.
    mags = [jnp.sqrt(p) for p in pw]
    r0 = jnp.sqrt(best)
    rp = jnp.zeros_like(r0)
    rm = jnp.zeros_like(r0)
    for m in range(n_lags):
        at = best_idx == float(m)
        rp = jnp.where(at, mags[min(m + 1, n_lags - 1)], rp)
        rm = jnp.where(at, mags[max(m - 1, 0)], rm)
    frac = (rp - rm) / (2.0 * (r0 - jnp.minimum(rp, rm)) + _EPS)
    frac = jnp.clip(frac, -0.5, 0.5)
    cp_meas = jnp.mod(
        cp_int.astype(jnp.float32) + (best_idx - float(k_half)) + frac, float(length)
    )

    # --- DLL + carrier aiding (track/loop.py:220-225).
    dll_err = (early - late) / (early + late + _EPS)
    new_cp = jnp.mod(cp - dll_gain * dll_err - aiding_scale * fd, float(length))

    # --- Costas PLL (track/loop.py:227-257).
    pll_err = (pr * pq) / (pr * pr + pq * pq + _EPS)
    n = carry[_STEP, :][None, :] + 1.0
    corr_err = 1.0 - jnp.exp(n * float(np.log1p(-lam_err)))
    corr_q = 1.0 - jnp.exp(n * float(np.log1p(-lam_q)))
    ema_err = carry[_EERR, :][None, :] + lam_err * (pll_err - carry[_EERR, :][None, :])
    ema_err_sq = carry[_EERR2, :][None, :] + lam_err * (
        pll_err * pll_err - carry[_EERR2, :][None, :]
    )
    err_var = ema_err_sq / corr_err - (ema_err / corr_err) ** 2
    quality_inst = (pr * pr - pq * pq) / (pr * pr + pq * pq + _EPS)
    ema_q_raw = carry[_EQ, :][None, :] + lam_q * (quality_inst - carry[_EQ, :][None, :])
    ema_q = ema_q_raw / corr_q

    warmed = n > float(lock_window_ms)
    locked = warmed & (err_var < max_err_var) & (ema_q > min_quality)
    kp = jnp.where(locked, kp_locked, kp_pullin)
    ki = jnp.where(locked, ki_locked, ki_pullin)
    two_pi = 2.0 * np.pi
    new_th = jnp.mod(th + two_pi * fd * t_ms + kp * pll_err, two_pi)
    new_fd = fd + ki * pll_err

    watchdog_armed = n > float(watchdog_warmup_ms)
    lost = (carry[_LOST, :][None, :] > 0.5) | (watchdog_armed & (ema_q < quality_drop))
    lost_f = lost.astype(jnp.float32)

    # --- outputs for this millisecond (pre-update values, like the scan).
    row = jax.lax.broadcasted_iota(jnp.int32, (N_OUT, s_count), 0)
    out = jnp.where(row == _O_PI, pr, 0.0)
    out = jnp.where(row == _O_PQ, pq, out)
    out = jnp.where(row == _O_CP, cp, out)
    out = jnp.where(row == _O_CPM, cp_meas, out)
    out = jnp.where(row == _O_FD, fd, out)
    out = jnp.where(row == _O_TH, th, out)
    out = jnp.where(row == _O_PLL, pll_err, out)
    out = jnp.where(row == _O_DLL, dll_err, out)
    out = jnp.where(row == _O_LOCKED, locked.astype(jnp.float32), out)
    out = jnp.where(row == _O_QUAL, ema_q, out)
    out = jnp.where(row == _O_LOST, lost_f, out)
    out_ref[0, :, :] = out

    # --- carry update (persists in scratch across the sequential grid).
    crow = jax.lax.broadcasted_iota(jnp.int32, (N_CARRY, s_count), 0)
    new_carry = jnp.where(crow == _CP, new_cp, 0.0)
    new_carry = jnp.where(crow == _TH, new_th, new_carry)
    new_carry = jnp.where(crow == _FD, new_fd, new_carry)
    new_carry = jnp.where(crow == _EERR, ema_err, new_carry)
    new_carry = jnp.where(crow == _EERR2, ema_err_sq, new_carry)
    new_carry = jnp.where(crow == _EQ, ema_q_raw, new_carry)
    new_carry = jnp.where(crow == _STEP, n, new_carry)
    new_carry = jnp.where(crow == _LOST, lost_f, new_carry)
    new_carry = jnp.where(crow == _CPI0, cpi0, new_carry)
    carry[:, :] = new_carry
    fin_ref[:, :] = new_carry  # last grid step's write is the block result


def block_margin(cfg: TrackingConfig, length: int) -> int:
    """Lag-window headroom for one block. Honors an explicit
    cfg.lag_window_block_margin; otherwise half the worst-case Doppler-aided
    drift over the block (the window is centered on the *predicted* mid-block
    code phase, so only half the drift plus DLL slack must fit) + 8 samples.
    """
    if cfg.lag_window_block_margin is not None:
        return cfg.lag_window_block_margin
    drift = 7000.0 / GPS_L1_FREQUENCY_HZ * length * cfg.block_size_ms
    return int(np.ceil(drift / 2.0)) + 8


def lag_matrix_bytes(cfg: TrackingConfig, length: int, n_channels: int) -> int:
    """VMEM footprint of the resident lag matrix (the fit check used to
    decide between this kernel and the scan path)."""
    k_eff = cfg.lag_window_half_width + block_margin(cfg, length)
    l_pad = ((length + 127) // 128) * 128
    return n_channels * (2 * k_eff + 1) * l_pad * 4


def make_pallas_track_block_fn(
    config: TrackingConfig,
    samples_per_prn: int,
    sample_rate: float,
    n_channels: int,
    interpret: bool | None = None,
):
    """Whole-block tracker: same contract as track/loop.py's track_block but
    the B-millisecond loop runs inside one Pallas kernel.

    Returns ``f(state_rows [N_CARRY, S] f32, samples_block [B, L, 2] f32,
    replicas_wide [S, >=2L+2K] f32) -> (final_state [N_CARRY, S],
    outs [B, N_OUT, S])`` — a lower-level interface consumed by
    track/loop.py when TrackingConfig selects the Pallas block path.
    """
    cfg = config
    length = samples_per_prn
    fs = float(sample_rate)
    k_half = cfg.lag_window_half_width
    margin = block_margin(cfg, length)
    k_eff = k_half + margin
    n_lags_eff = 2 * k_eff + 1
    l_pad = ((length + 127) // 128) * 128
    t_ms = length / fs
    zeta = cfg.pll_damping_factor

    def gains(bw):
        return 4.0 * zeta * bw * t_ms, 4.0 * (bw**2) * t_ms

    kp_l, ki_l = gains(cfg.pll_bandwidth_locked_hz)
    kp_p, ki_p = gains(cfg.pll_bandwidth_pullin_hz)
    aiding = (length / GPS_L1_FREQUENCY_HZ) if cfg.carrier_aiding else 0.0
    cfg_consts = (
        kp_l, ki_l, kp_p, ki_p,
        1.0 / cfg.lock_window_ms, 1.0 / cfg.quality_window_ms,
        aiding, cfg.dll_gain_samples, t_ms, 1.0 / fs,
        cfg.lock_window_ms, cfg.max_phase_error_variance_for_lock,
        cfg.min_quality_for_lock, cfg.watchdog_warmup_ms,
        cfg.quality_drop_threshold,
    )

    @functools.partial(jax.jit, static_argnames=("interp",))
    def track_block(state_rows, samples_block, replicas_wide, interp):
        b = samples_block.shape[0]
        s_count = state_rows.shape[1]

        # Block prologue (XLA): position the lag window at the *predicted
        # mid-block* code phase (carrier aiding moves the code by
        # -aiding * fd per ms deterministically; centering on the midpoint
        # halves the margin the drift consumes) — one dynamic slice per
        # channel per block.
        cp0 = state_rows[_CP, :]
        predicted_mid_drift = -aiding * state_rows[_FD, :] * (b / 2.0)
        cpi0 = jnp.floor(cp0 + predicted_mid_drift).astype(jnp.int32) % length
        base0 = jnp.mod(length - cpi0 - k_eff, length)
        w2 = jnp.concatenate(
            [replicas_wide[:, : 2 * length], replicas_wide[:, : 2 * k_eff]], axis=1
        )
        win = jax.vmap(
            lambda t, bb: jax.lax.dynamic_slice(t, (bb,), (length + 2 * k_eff,))
        )(w2, base0)
        rows = jnp.stack([win[:, k : k + length] for k in range(n_lags_eff)], axis=1)
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, l_pad - length)))  # [S, NLE, L_pad]

        init = state_rows.at[_CPI0, :].set(cpi0.astype(jnp.float32))

        chunks = jnp.pad(
            jnp.moveaxis(samples_block, 2, 1),  # [B, 2, L]
            ((0, 0), (0, 6), (0, l_pad - length)),
        )  # [B, 8, L_pad]

        outs, fin = pl.pallas_call(
            functools.partial(
                _track_block_kernel,
                cfg_consts=cfg_consts,
                length=length,
                n_lags_eff=n_lags_eff,
                k_half=k_half,
                s_count=s_count,
            ),
            grid=(b,),
            in_specs=[
                pl.BlockSpec(
                    (s_count, n_lags_eff, l_pad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((N_CARRY, s_count), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, l_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, N_OUT, s_count), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((N_CARRY, s_count), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, N_OUT, s_count), jnp.float32),
                jax.ShapeDtypeStruct((N_CARRY, s_count), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((N_CARRY, s_count), jnp.float32)],
            interpret=interp,
        )(rows, init, chunks)
        return fin, outs

    def fn(state_rows, samples_block, replicas_wide):
        interp = (
            interpret if interpret is not None else jax.default_backend() != "tpu"
        )
        return track_block(state_rows, samples_block, replicas_wide, interp)

    return fn
