"""MXU-batched tracking block: whole-block correlation as one matmul.

The round-1 paths (the XLA hoisted scan and the whole-block Pallas kernel,
track/loop.py / ops/pallas_track.py) evaluate the lag-window correlation
per millisecond as VPU multiply+reduce work — measured ~16.8 ms per
1000 ms block at 32 channels on TPU v5e, a VPU floor, not a chip floor.

This module restructures the block so the FLOPs land on the MXU:

Phase 1 (batched matmul, no sequential dependence):
    The per-ms carrier wipeoff ``x = c * e^{-j(theta + 2 pi f l / fs)}``
    appears to depend on the sequentially-updated loop state (theta, f), but
    the correlation's dependence factorizes: wiping every millisecond with
    the BLOCK-START state (theta0, f0) and rotating the result by the phase
    difference is exact up to the within-ms Doppler-residual ramp
    (amplitude factor sinc(pi*(f-f0)*t_ms) >= 0.992 even at a worst-case
    70 Hz pull-in excursion — and the b-dependent phase terms cancel
    entirely because each millisecond's wipeoff is referenced to its own
    chunk start). So:

        W[s, l, j]    = rows[s, j, l] * e^{-j(theta0_s + 2 pi f0_s l / fs)}
        corr0[s, b, j] = sum_l C[b, l] * W[s, l, j]        (ONE bf16 einsum)
        corr_act[s, b, j] ~= corr0[s, b, j] * e^{-j alpha_s(b)}
        alpha_s(b)    = theta_act_s(b) - theta0_s
                        + pi (f_act_s(b) - f0_s) t_ms      (midpoint term)

    C (the sample block) is shared by every channel, so the einsum is a
    dense [B, L] x [S, L, J] contraction — MXU-shaped, bf16 inputs with f32
    accumulation. At B=1000, L=2046, J~35, S=32 this is ~18 GFLOP per block:
    tens of microseconds of MXU time versus ~16 ms of VPU time.

Phase 2 (sequential fixup, tiny):
    A lax.scan over milliseconds whose carry is the loop-filter state, but
    whose body now only selects the (2K+1) lags around the current prompt
    from the precomputed row, rotates the prompt by alpha, and runs the
    discriminator/EMA updates — all [S]-sized vector math with no O(L)
    work. Early/late/peak magnitudes use |corr0| directly (rotation-
    invariant); only the Costas error and the I/Q outputs need the rotation.

Numerics match the scan path exactly at block start (alpha = 0 when the
state equals the block-start state) and to the sinc amplitude factor during
pull-in; parity is pinned by tests/test_matmul_tracker.py at the decode
level and to tight numeric tolerances block-by-block.

A further benefit over ops/pallas_track.py: there is no pallas_call in this
path, so GSPMD can shard both phases over the channel axis — multi-chip
tracking no longer forfeits the fast kernel (VERDICT round 1, item 4).

Reference analogue: the 1 kHz per-satellite loop of gypsum/tracker.py:264-389.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gypsum_tpu.core.config import TrackingConfig
from gypsum_tpu.core.constants import GPS_L1_FREQUENCY_HZ
from gypsum_tpu.core.planes import dequantize_planes, to_complex

_EPS = 1e-12


def make_matmul_track_block_fn(
    config: TrackingConfig,
    samples_per_prn: int,
    sample_rate: float,
    n_channels: int,
    stream_of_channel: np.ndarray | None = None,
    input_offset: float = 0.0,
):
    """Build the two-phase (matmul + fixup-scan) block tracker.

    Same contract as track/loop.py's track_block:
    ``f(state, samples_block [B, L, 2] f32 planes (or [B, N, L, 2] farm),
    replicas_wide [S, >=2L+2K] f32) -> (state' [S, 1] columns,
    TrackBlockOutputs [B, S])``.
    """
    from gypsum_tpu.track.loop import TrackBlockOutputs, TrackState

    cfg = config
    length = samples_per_prn
    fs = float(sample_rate)
    k_half = cfg.lag_window_half_width
    n_lags = 2 * k_half + 1
    t_ms = length / fs
    zeta = cfg.pll_damping_factor

    def gains(bw):
        return 4.0 * zeta * bw * t_ms, 4.0 * (bw**2) * t_ms

    kp_locked, ki_locked = gains(cfg.pll_bandwidth_locked_hz)
    kp_pullin, ki_pullin = gains(cfg.pll_bandwidth_pullin_hz)
    lam_err = 1.0 / cfg.lock_window_ms
    lam_q = 1.0 / cfg.quality_window_ms
    f_aid = cfg.aiding_carrier_hz or GPS_L1_FREQUENCY_HZ
    aiding_scale = (length / f_aid) if cfg.carrier_aiding else 0.0

    if cfg.lag_window_block_margin is not None:
        margin = cfg.lag_window_block_margin
    else:
        # Window centered on the predicted mid-block code phase: half the
        # worst-case Doppler-aided drift over the block + DLL slack.
        drift = 7000.0 / f_aid * length * cfg.block_size_ms
        margin = int(np.ceil(drift / 2.0)) + 8
    k_eff = k_half + margin
    n_lags_eff = 2 * k_eff + 1

    # bf16 matmul inputs keep the contraction on the MXU; f32 keeps CPU tests
    # exact and fast (CPU bf16 is emulated).
    mm_dtype = jnp.bfloat16 if cfg.matmul_tracker_bf16 else jnp.float32

    use_hrc = cfg.code_phase_measurement == "hrc"
    if cfg.code_phase_measurement not in ("triangle", "hrc"):
        raise ValueError(
            f"unknown code_phase_measurement {cfg.code_phase_measurement!r}"
        )
    if use_hrc and k_half < 3:
        raise ValueError(
            "code_phase_measurement='hrc' needs lag_window_half_width >= 3 "
            "(lags at peak +/- 2 with one sample of peak drift)"
        )
    # Correlation triangle half-width in samples (= one chip).
    w_chip = float(length) / float(cfg.chips_per_code)

    l_over_fs = (np.arange(length) / fs).astype(np.float32)  # [L]

    farm_idx = None
    if stream_of_channel is not None:
        farm_idx = np.asarray(stream_of_channel, dtype=np.int32)
        assert farm_idx.shape == (n_channels,)

    def build_rows(replicas_wide, state):
        """Block-static lag window [S, n_lags_eff, L] centered on the
        predicted mid-block code phase (same prologue as the Pallas block
        kernel, ops/pallas_track.py:288-303); also returns cpi0 [S]."""
        predicted_mid = -aiding_scale * state.doppler * (cfg.block_size_ms / 2.0)
        cpi0 = jnp.floor(state.code_phase + predicted_mid).astype(jnp.int32) % length
        base0 = jnp.mod(length - cpi0 - k_eff, length)
        w2 = jnp.concatenate(
            [replicas_wide[:, : 2 * length], replicas_wide[:, : 2 * k_eff]], axis=1
        )
        win = jax.vmap(
            lambda t, b: jax.lax.dynamic_slice(t, (b,), (length + 2 * k_eff,))
        )(w2, base0)  # [S, L + 2K_eff]
        rows = jnp.stack(
            [win[:, k : k + length] for k in range(n_lags_eff)], axis=1
        )[:, ::-1, :]  # [S, NLE, L], ascending lag order
        return rows, cpi0

    def correlate_block(rows, state, chunks):
        """Phase 1: all-lag correlations for every millisecond at once.

        chunks: [B, L] complex (shared stream) or [B, N, L] (farm).
        Returns (corr_r, corr_i): [S, B, n_lags_eff] f32.
        """
        # Fold the block-start wipeoff phasor into the replica side:
        # W[s, l, j] = rows[s, j, l] * e^{-j(theta0 + 2 pi (f0 + f_off) l / fs)}.
        # The FDMA offset joins the wipeoff ramp; since it is constant over
        # the block, the fixup's rotation alpha (built from theta/f DELTAS)
        # is unchanged.
        phase0 = state.carrier_phase[:, None] + (
            2.0 * jnp.pi * (state.doppler + state.carrier_offset)[:, None]
            * jnp.asarray(l_over_fs)[None, :]
        )  # [S, L]
        c0, s0 = jnp.cos(phase0), jnp.sin(phase0)
        rows_lj = jnp.swapaxes(rows, 1, 2)  # [S, L, NLE]
        w_r = (rows_lj * c0[:, :, None]).astype(mm_dtype)
        w_i = (-rows_lj * s0[:, :, None]).astype(mm_dtype)

        cr = jnp.real(chunks).astype(mm_dtype)
        ci = jnp.imag(chunks).astype(mm_dtype)
        if farm_idx is None:
            # corr[s, b, j] = sum_l c[b, l] * W[s, l, j] with complex c and
            # complex W (the wipeoff phasor lives in W):
            # re = cr.wr - ci.wi, im = cr.wi + ci.wr.
            def mm(c_, w_):
                return jax.lax.dot_general(
                    c_, w_,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [B, S, NLE]

            corr_r = jnp.swapaxes(mm(cr, w_r) - mm(ci, w_i), 0, 1)
            corr_i = jnp.swapaxes(mm(cr, w_i) + mm(ci, w_r), 0, 1)
        else:
            idx = jnp.asarray(farm_idx)
            cr_s = jnp.take(cr, idx, axis=1)  # [B, S, L]
            ci_s = jnp.take(ci, idx, axis=1)

            def mm_farm(c_, w_):
                # [B, S, L] x [S, L, NLE] -> [S, B, NLE] (batch over S).
                return jax.lax.dot_general(
                    jnp.swapaxes(c_, 0, 1), w_,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )

            corr_r = mm_farm(cr_s, w_r) - mm_farm(ci_s, w_i)
            corr_i = mm_farm(cr_s, w_i) + mm_farm(ci_s, w_r)
        return corr_r, corr_i

    def fixup_step(carry, xs, cpi0, theta0, f0):
        """Phase 2 body: one millisecond of loop-filter updates from the
        precomputed all-lag correlation row. All [S]-sized vector math."""
        state = carry
        row_r, row_i = xs  # [S, NLE] each

        cp_int = jnp.floor(state.code_phase).astype(jnp.int32) % length  # [S]
        half = length // 2
        delta = jnp.mod(cp_int - cpi0 + half, length) - half
        j = jnp.clip(delta + k_eff, k_half, n_lags_eff - 1 - k_half)  # [S]
        idx = j[:, None] + jnp.arange(-k_half, k_half + 1)[None, :]  # [S, n_lags]
        sel_r = jnp.take_along_axis(row_r, idx, axis=1)  # [S, n_lags]
        sel_i = jnp.take_along_axis(row_i, idx, axis=1)

        power = sel_r * sel_r + sel_i * sel_i
        early = power[:, k_half - 1]
        late = power[:, k_half + 1]
        peak_idx = jnp.argmax(power, axis=-1)
        p0_r = jnp.take_along_axis(sel_r, peak_idx[:, None], axis=-1)[:, 0]
        p0_i = jnp.take_along_axis(sel_i, peak_idx[:, None], axis=-1)[:, 0]

        mag = jnp.sqrt(power)
        take = lambda off: jnp.take_along_axis(
            mag, jnp.clip(peak_idx + off, 0, n_lags - 1)[:, None], axis=-1
        )[:, 0]
        r0 = take(0)
        rp = take(1)
        rm = take(-1)
        if use_hrc:
            # Double-delta zero crossing (multipath-resistant; see
            # TrackingConfig.code_phase_measurement for the bias table).
            d1 = rm - rp  # |R(-1)| - |R(+1)|
            d2 = take(-2) - take(2)
            frac = -w_chip * (d1 - 0.5 * d2) / (r0 + _EPS)
            frac = jnp.clip(frac, -1.5, 1.5)
        else:
            frac = (rp - rm) / (2.0 * (r0 - jnp.minimum(rp, rm)) + _EPS)
            frac = jnp.clip(frac, -0.5, 0.5)
        code_phase_measured = jnp.mod(
            cp_int.astype(jnp.float32)
            + (peak_idx - k_half).astype(jnp.float32)
            + frac,
            float(length),
        )

        # Rotate the prompt from block-start-referenced to actual loop phase:
        # alpha = (theta - theta0) + pi (f - f0) t_ms  (midpoint of the
        # within-ms residual-Doppler ramp).
        alpha = (state.carrier_phase - theta0) + jnp.pi * (state.doppler - f0) * t_ms
        ca, sa = jnp.cos(alpha), jnp.sin(alpha)
        i = p0_r * ca + p0_i * sa  # Re(p0 * e^{-j alpha})
        q = p0_i * ca - p0_r * sa

        dll_err = (early - late) / (early + late + _EPS)
        code_phase = state.code_phase - cfg.dll_gain_samples * dll_err
        code_phase = code_phase - aiding_scale * state.doppler
        code_phase = jnp.mod(code_phase, float(length))

        pll_err = (i * q) / (i * i + q * q + _EPS)

        n = (state.step_count + 1).astype(jnp.float32)
        corr_err = 1.0 - jnp.exp(n * np.log1p(-lam_err))
        corr_q = 1.0 - jnp.exp(n * np.log1p(-lam_q))
        ema_err = state.ema_err + lam_err * (pll_err - state.ema_err)
        ema_err_sq = state.ema_err_sq + lam_err * (pll_err**2 - state.ema_err_sq)
        err_var = ema_err_sq / corr_err - (ema_err / corr_err) ** 2
        quality_inst = (i * i - q * q) / (i * i + q * q + _EPS)
        ema_quality_raw = state.ema_quality + lam_q * (quality_inst - state.ema_quality)
        ema_quality = ema_quality_raw / corr_q

        warmed = state.step_count >= cfg.lock_window_ms
        locked = warmed & (err_var < cfg.max_phase_error_variance_for_lock) & (
            ema_quality > cfg.min_quality_for_lock
        )
        kp = jnp.where(locked, kp_locked, kp_pullin)
        ki = jnp.where(locked, ki_locked, ki_pullin)
        two_pi = 2.0 * jnp.pi
        # FDMA offset advance reduced mod one cycle pre-f32-radians (see
        # track/loop.py's step for the rounding-bias rationale).
        off_cycles = state.carrier_offset * t_ms
        off_frac = off_cycles - jnp.round(off_cycles)
        carrier_phase = jnp.mod(
            state.carrier_phase
            + two_pi * (state.doppler * t_ms + off_frac)
            + kp * pll_err,
            two_pi,
        )
        doppler = state.doppler + ki * pll_err

        watchdog_armed = state.step_count >= cfg.watchdog_warmup_ms
        lost = state.lost | (
            watchdog_armed & (ema_quality < cfg.quality_drop_threshold)
        )

        new_state = TrackState(
            code_phase=code_phase,
            carrier_phase=carrier_phase,
            doppler=doppler,
            carrier_offset=state.carrier_offset,
            ema_err=ema_err,
            ema_err_sq=ema_err_sq,
            ema_quality=ema_quality_raw,
            step_count=state.step_count + 1,
            lost=lost,
        )
        outputs = TrackBlockOutputs(
            prompt_i=i,
            prompt_q=q,
            code_phase=state.code_phase,
            code_phase_measured=code_phase_measured,
            doppler=state.doppler,
            carrier_phase=state.carrier_phase,
            pll_error=pll_err,
            dll_error=dll_err,
            locked=locked,
            quality=ema_quality,
            lost=lost,
        )
        return new_state, outputs

    fixup_backend = cfg.fixup_backend
    if fixup_backend is None:
        fixup_backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    pallas_fixup_fn = None
    if fixup_backend == "pallas":
        from gypsum_tpu.ops import pallas_fixup as pf

        pallas_fixup_fn = pf.make_fixup_fn(
            cfg, length, fs, n_channels, n_lags_eff
        )

    def run_fixup_scan(state, corr_bs, cpi0, theta0, f0):
        new_state, outs = jax.lax.scan(
            lambda c, x: fixup_step(c, x, cpi0, theta0, f0),
            state,
            corr_bs,
            unroll=min(cfg.fixup_unroll, corr_bs[0].shape[0]),
        )
        return new_state, outs

    def run_fixup_pallas(state, corr_bs, cpi0, theta0, f0):
        from gypsum_tpu.ops import pallas_fixup as pf
        from gypsum_tpu.track.loop import TrackBlockOutputs, TrackState

        init = jnp.stack(
            [
                state.code_phase.astype(jnp.float32),
                state.carrier_phase.astype(jnp.float32),
                state.doppler.astype(jnp.float32),
                state.ema_err.astype(jnp.float32),
                state.ema_err_sq.astype(jnp.float32),
                state.ema_quality.astype(jnp.float32),
                state.step_count.astype(jnp.float32),
                state.lost.astype(jnp.float32),
                cpi0.astype(jnp.float32),
                theta0.astype(jnp.float32),
                f0.astype(jnp.float32),
                state.carrier_offset.astype(jnp.float32),
            ]
        )  # [N_CARRY, S]
        fin, outs = pallas_fixup_fn(init, corr_bs[0], corr_bs[1])
        new_state = TrackState(
            code_phase=fin[pf._CP, :],
            carrier_phase=fin[pf._TH, :],
            doppler=fin[pf._FD, :],
            carrier_offset=state.carrier_offset,
            ema_err=fin[pf._EERR, :],
            ema_err_sq=fin[pf._EERR2, :],
            ema_quality=fin[pf._EQ, :],
            step_count=fin[pf._STEP, :].astype(jnp.int32),
            lost=fin[pf._LOST, :] > 0.5,
        )
        outputs = TrackBlockOutputs(
            prompt_i=outs[:, pf._O_PI, :],
            prompt_q=outs[:, pf._O_PQ, :],
            code_phase=outs[:, pf._O_CP, :],
            code_phase_measured=outs[:, pf._O_CPM, :],
            doppler=outs[:, pf._O_FD, :],
            carrier_phase=outs[:, pf._O_TH, :],
            pll_error=outs[:, pf._O_PLL, :],
            dll_error=outs[:, pf._O_DLL, :],
            locked=outs[:, pf._O_LOCKED, :] > 0.5,
            quality=outs[:, pf._O_QUAL, :],
            lost=outs[:, pf._O_LOST, :] > 0.5,
        )
        return new_state, outputs

    def track_block(state, samples_block, replicas_wide):
        state = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a).reshape((a.shape[0],)), state
        )
        samples_block = dequantize_planes(samples_block, input_offset)
        chunks = to_complex(samples_block)  # [B, L] or [B, N, L] c64
        rows, cpi0 = build_rows(replicas_wide, state)
        corr_r, corr_i = correlate_block(rows, state, chunks)  # [S, B, NLE]

        # Phase-rotation reference = the block-start state. The carry's
        # theta/f evolve; theta0/f0 stay closed over the fixup.
        theta0 = state.carrier_phase
        f0 = state.doppler

        # Fixup consumes ms-major correlation planes [B, S, NLE].
        corr_bs = (jnp.swapaxes(corr_r, 0, 1), jnp.swapaxes(corr_i, 0, 1))
        run = run_fixup_pallas if fixup_backend == "pallas" else run_fixup_scan
        new_state, outs = run(state, corr_bs, cpi0, theta0, f0)
        state_cols = jax.tree_util.tree_map(lambda a: a[:, None], new_state)
        return state_cols, outs

    return jax.jit(track_block)
