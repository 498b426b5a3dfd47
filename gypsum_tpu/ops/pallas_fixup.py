"""Grouped Pallas fixup kernel: phase 2 of the MXU tracker.

track/matmul.py evaluates the whole block's lag correlations as one batched
MXU matmul (phase 1); what remains is the inherently sequential loop-filter
update — tiny [S]-vector math per millisecond. On this environment's TPU
runtime, *sequencing* dominates that phase: a lax.scan trip or a Mosaic
grid step costs ~16 us regardless of body size (measured round 1: the
whole-block kernel's 1000-step grid ran ~16.8 ms with microseconds of
compute per step). So this kernel processes GROUP_MS milliseconds per grid
step, unrolling the per-ms updates inside the kernel where ops compile to
straight-line vector code with no per-step runtime overhead:

    grid steps = B / GROUP_MS   (e.g. 1000 / 25 = 40 -> ~0.6 ms of
                                 sequencing instead of ~16 ms)

Inputs are the phase-1 correlation planes laid out [B, S, 128] (lags on
lanes, padded), so the per-ms lag selection is lane-mask reductions — the
same technique as ops/pallas_track.py, which this kernel supersedes on the
hot path. The carry persists in VMEM scratch across the sequential grid.

Numerics: identical to track/matmul.py's fixup scan (parity-tested by
tests/test_matmul_tracker.py::test_fixup_kernel_matches_scan).

Reference analogue: the per-ms discriminator/loop-filter updates of
gypsum/tracker.py:246-329.
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

# Carry rows in the (N_CARRY, S) init/final/scratch arrays. The last four
# are block constants (the lag-window center, the phase-1 wipeoff reference
# state, and the FDMA carrier offset) that ride the carry for convenience.
(_CP, _TH, _FD, _EERR, _EERR2, _EQ, _STEP, _LOST, _CPI0, _TH0, _FD0, _OFF) = range(12)
N_CARRY = 12

# Output rows in the per-ms (N_OUT, S) block (same order as
# track/loop.py's TrackBlockOutputs fields).
(
    _O_PI, _O_PQ, _O_CP, _O_CPM, _O_FD, _O_TH, _O_PLL, _O_DLL,
    _O_LOCKED, _O_QUAL, _O_LOST,
) = range(11)
N_OUT = 16  # padded to a sublane multiple


def _fixup_kernel(
    init_ref,  # [N_CARRY, S] f32
    cr_ref,  # [T, S, 128] f32 — corr real, lags on lanes (ascending)
    ci_ref,  # [T, S, 128] f32 — corr imag
    out_ref,  # [T, N_OUT, S] f32
    fin_ref,  # [N_CARRY, S] f32
    carry,  # VMEM scratch [N_CARRY, S]
    *,
    cfg_consts: tuple,
    length: int,
    n_lags_eff: int,
    k_half: int,
    group_ms: int,
    s_count: int,
    use_hrc: bool,
    w_chip: float,
):
    (
        kp_locked, ki_locked, kp_pullin, ki_pullin, lam_err, lam_q,
        aiding_scale, dll_gain, t_ms, lock_window_ms,
        max_err_var, min_quality, watchdog_warmup_ms, quality_drop,
    ) = cfg_consts

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry[:, :] = init_ref[:, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (s_count, 128), 1)
    n_lags = 2 * k_half + 1
    k_eff = (n_lags_eff - 1) // 2
    half = length // 2
    two_pi = 2.0 * np.pi

    cpi0 = carry[_CPI0, :][None, :]
    th0 = carry[_TH0, :][None, :]
    fd0 = carry[_FD0, :][None, :]
    # FDMA carrier offset: its per-ms NCO advance, reduced mod one cycle in
    # CYCLES before the f32 radian conversion (exact for k * 562.5 kHz
    # offsets — see track/loop.py step's rationale). Block-constant.
    off_cycles = carry[_OFF, :][None, :] * t_ms
    off_frac = off_cycles - jnp.round(off_cycles)

    for t in range(group_ms):
        cp = carry[_CP, :][None, :]  # (1, S)
        th = carry[_TH, :][None, :]
        fd = carry[_FD, :][None, :]

        row_r = cr_ref[t, :, :]  # (S, 128)
        row_i = ci_ref[t, :, :]

        # --- select the (2K+1) lags around the current prompt (lane masks).
        cp_int = jnp.floor(cp).astype(jnp.int32) % length  # (1, S)
        delta = ((cp_int - cpi0.astype(jnp.int32) + half) % length) - half
        j = jnp.clip(delta + k_eff, k_half, n_lags_eff - 1 - k_half)  # (1, S)
        jt = j.T  # (S, 1)

        def select(rowv, off):
            return jnp.sum(
                jnp.where(lane == (jt + off), rowv, 0.0), axis=1, keepdims=True
            ).T  # (1, S)

        sr = [select(row_r, m - k_half) for m in range(n_lags)]
        si = [select(row_i, m - k_half) for m in range(n_lags)]
        pw = [r * r + q * q for r, q in zip(sr, si)]
        early, late = pw[k_half - 1], pw[k_half + 1]

        # --- unrolled argmax over the selected lags.
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

        # --- triangle interpolation of the |corr| peak.
        mags = [jnp.sqrt(p) for p in pw]
        r0 = jnp.sqrt(best)
        rp = jnp.zeros_like(r0)
        rm = jnp.zeros_like(r0)
        rp2 = jnp.zeros_like(r0)
        rm2 = jnp.zeros_like(r0)
        for m in range(n_lags):
            at = best_idx == float(m)
            rp = jnp.where(at, mags[min(m + 1, n_lags - 1)], rp)
            rm = jnp.where(at, mags[max(m - 1, 0)], rm)
            if use_hrc:
                rp2 = jnp.where(at, mags[min(m + 2, n_lags - 1)], rp2)
                rm2 = jnp.where(at, mags[max(m - 2, 0)], rm2)
        if use_hrc:
            # Double-delta zero crossing (multipath-resistant; see
            # TrackingConfig.code_phase_measurement for the bias table).
            frac = -w_chip * ((rm - rp) - 0.5 * (rm2 - rp2)) / (r0 + _EPS)
            frac = jnp.clip(frac, -1.5, 1.5)
        else:
            frac = (rp - rm) / (2.0 * (r0 - jnp.minimum(rp, rm)) + _EPS)
            frac = jnp.clip(frac, -0.5, 0.5)
        cp_meas = jnp.mod(
            cp_int.astype(jnp.float32) + (best_idx - float(k_half)) + frac,
            float(length),
        )

        # --- rotate the prompt from the phase-1 wipeoff reference to the
        # actual loop phase: alpha = (th - th0) + pi (fd - fd0) t_ms.
        alpha = (th - th0) + np.pi * (fd - fd0) * t_ms
        ca = jnp.cos(alpha)
        sa = jnp.sin(alpha)
        pi_rot = pr * ca + pq * sa
        pq_rot = pq * ca - pr * sa

        # --- DLL + carrier aiding.
        dll_err = (early - late) / (early + late + _EPS)
        new_cp = jnp.mod(cp - dll_gain * dll_err - aiding_scale * fd, float(length))

        # --- Costas PLL + lock EMAs (bias-corrected).
        pll_err = (pi_rot * pq_rot) / (pi_rot * pi_rot + pq_rot * pq_rot + _EPS)
        n = carry[_STEP, :][None, :] + 1.0
        corr_err = 1.0 - jnp.exp(n * float(np.log1p(-lam_err)))
        corr_q = 1.0 - jnp.exp(n * float(np.log1p(-lam_q)))
        ema_err = carry[_EERR, :][None, :] + lam_err * (
            pll_err - carry[_EERR, :][None, :]
        )
        ema_err_sq = carry[_EERR2, :][None, :] + lam_err * (
            pll_err * pll_err - carry[_EERR2, :][None, :]
        )
        err_var = ema_err_sq / corr_err - (ema_err / corr_err) ** 2
        quality_inst = (pi_rot * pi_rot - pq_rot * pq_rot) / (
            pi_rot * pi_rot + pq_rot * pq_rot + _EPS
        )
        ema_q_raw = carry[_EQ, :][None, :] + lam_q * (
            quality_inst - carry[_EQ, :][None, :]
        )
        ema_q = ema_q_raw / corr_q

        warmed = n > float(lock_window_ms)
        locked = warmed & (err_var < max_err_var) & (ema_q > min_quality)
        kp = jnp.where(locked, kp_locked, kp_pullin)
        ki = jnp.where(locked, ki_locked, ki_pullin)
        new_th = jnp.mod(
            th + two_pi * (fd * t_ms + off_frac) + kp * pll_err, two_pi
        )
        new_fd = fd + ki * pll_err

        watchdog_armed = n > float(watchdog_warmup_ms)
        lost = (carry[_LOST, :][None, :] > 0.5) | (
            watchdog_armed & (ema_q < quality_drop)
        )
        lost_f = lost.astype(jnp.float32)

        # --- outputs for this millisecond (pre-update values).
        row = jax.lax.broadcasted_iota(jnp.int32, (N_OUT, s_count), 0)
        out = jnp.where(row == _O_PI, pi_rot, 0.0)
        out = jnp.where(row == _O_PQ, pq_rot, out)
        out = jnp.where(row == _O_CP, cp, out)
        out = jnp.where(row == _O_CPM, cp_meas, out)
        out = jnp.where(row == _O_FD, fd, out)
        out = jnp.where(row == _O_TH, th, out)
        out = jnp.where(row == _O_PLL, pll_err, out)
        out = jnp.where(row == _O_DLL, dll_err, out)
        out = jnp.where(row == _O_LOCKED, locked.astype(jnp.float32), out)
        out = jnp.where(row == _O_QUAL, ema_q, out)
        out = jnp.where(row == _O_LOST, lost_f, out)
        out_ref[t, :, :] = out

        # --- carry update.
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
        new_carry = jnp.where(crow == _TH0, th0, new_carry)
        new_carry = jnp.where(crow == _FD0, fd0, new_carry)
        new_carry = jnp.where(crow == _OFF, carry[_OFF, :][None, :], new_carry)
        carry[:, :] = new_carry

    fin_ref[:, :] = carry[:, :]


def pick_group_ms(block_ms: int, target: int) -> int:
    """Largest divisor of ``block_ms`` that is <= target (>= 1)."""
    t = max(1, min(target, block_ms))
    while block_ms % t:
        t -= 1
    return t


def make_fixup_fn(
    config: TrackingConfig,
    samples_per_prn: int,
    sample_rate: float,
    n_channels: int,
    n_lags_eff: int,
    interpret: bool | None = None,
):
    """Build the grouped fixup: ``f(init [N_CARRY, S] f32,
    corr_r, corr_i [B, S, n_lags_eff] f32) -> (final [N_CARRY, S],
    outs [B, N_OUT, S])``.

    ``init`` rows are the _CP.._FD0 carry layout above.
    """
    cfg = config
    length = samples_per_prn
    fs = float(sample_rate)
    t_ms = length / fs
    k_half = cfg.lag_window_half_width
    zeta = cfg.pll_damping_factor
    if n_lags_eff > 128:
        raise ValueError(f"n_lags_eff ({n_lags_eff}) exceeds the 128-lane row")
    _S_SLAB = 256  # max channels per pallas_call (scoped-vmem bound, v5e)

    def gains(bw):
        return 4.0 * zeta * bw * t_ms, 4.0 * (bw**2) * t_ms

    kp_l, ki_l = gains(cfg.pll_bandwidth_locked_hz)
    kp_p, ki_p = gains(cfg.pll_bandwidth_pullin_hz)
    aiding = (
        (length / (cfg.aiding_carrier_hz or GPS_L1_FREQUENCY_HZ))
        if cfg.carrier_aiding else 0.0
    )
    cfg_consts = (
        kp_l, ki_l, kp_p, ki_p,
        1.0 / cfg.lock_window_ms, 1.0 / cfg.quality_window_ms,
        aiding, cfg.dll_gain_samples, t_ms,
        cfg.lock_window_ms, cfg.max_phase_error_variance_for_lock,
        cfg.min_quality_for_lock, cfg.watchdog_warmup_ms,
        cfg.quality_drop_threshold,
    )

    @functools.partial(jax.jit, static_argnames=("interp",))
    def fixup(init, corr_r, corr_i, interp):
        b, s_count, nle = corr_r.shape
        group = pick_group_ms(b, cfg.fixup_group_ms)
        cr = jnp.pad(corr_r, ((0, 0), (0, 0), (0, 128 - nle)))
        ci = jnp.pad(corr_i, ((0, 0), (0, 0), (0, 128 - nle)))

        def run(init_c, cr_c, ci_c):
            s_c = init_c.shape[1]
            return pl.pallas_call(
                functools.partial(
                    _fixup_kernel,
                    cfg_consts=cfg_consts,
                    length=length,
                    n_lags_eff=n_lags_eff,
                    k_half=k_half,
                    group_ms=group,
                    s_count=s_c,
                    use_hrc=cfg.code_phase_measurement == "hrc",
                    w_chip=float(length) / float(cfg.chips_per_code),
                ),
                grid=(b // group,),
                in_specs=[
                    pl.BlockSpec((N_CARRY, s_c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((group, s_c, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((group, s_c, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((group, N_OUT, s_c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((N_CARRY, s_c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((b, N_OUT, s_c), jnp.float32),
                    jax.ShapeDtypeStruct((N_CARRY, s_c), jnp.float32),
                ],
                scratch_shapes=[pltpu.VMEM((N_CARRY, s_c), jnp.float32)],
                interpret=interp,
            )(init_c, cr_c, ci_c)

        if s_count <= _S_SLAB:
            outs, fin = run(init, cr, ci)
            return fin, outs
        # Channels are independent: farms beyond _S_SLAB channels run the
        # kernel in VMEM-sized slabs (one pallas_call each, same program) —
        # a single 512-channel call overflows the ~16 MB scoped-vmem limit
        # (measured on v5e; the per-step output block is what blows up).
        outs_l, fin_l = [], []
        for c0 in range(0, s_count, _S_SLAB):
            o, f = run(
                init[:, c0:c0 + _S_SLAB],
                cr[:, c0:c0 + _S_SLAB],
                ci[:, c0:c0 + _S_SLAB],
            )
            outs_l.append(o)
            fin_l.append(f)
        return jnp.concatenate(fin_l, axis=1), jnp.concatenate(outs_l, axis=2)

    def fn(init, corr_r, corr_i):
        interp = (
            interpret if interpret is not None else jax.default_backend() != "tpu"
        )
        return fixup(init, corr_r, corr_i, interp)

    return fn
