"""Per-satellite tracking loops as one jitted scan over milliseconds.

Reference behavior being reproduced (gypsum/tracker.py): each millisecond,
wipe off the carrier with the current Doppler/phase estimate, correlate
early/prompt/late replicas, update the code phase from an early-late power
discriminator, update carrier phase and Doppler with a second-order Costas
loop whose bandwidth depends on lock state, emit the prompt correlation peak
as a +/-1 pseudosymbol, and watch constellation health to detect lost lock.

TPU-first re-design (see TrackingConfig for the documented numerics changes):

- The 1 kHz Python loop (reference: gypsum/tracker.py:331-389, one satellite
  at a time) becomes ``lax.scan`` over milliseconds with the loop-filter state
  as the carry, evaluated for *all* channels simultaneously ([S]-vectorized
  inside the scan step). One device dispatch processes a whole block
  (default 1000 ms) for every tracked satellite.
- No FFTs in the hot path: the correlation is evaluated only on a
  (2K+1)-sample lag window around the prompt as a batched matmul
  (the reference computes a full 2046-point FFT correlation per ms per
  satellite just to read off its peak, gypsum/tracker.py:307-313).
- All rolling-deque statistics (reference: gypsum/tracker.py:146-155) become
  exponential moving averages carried through the scan.
- Lost-lock detection is a flag in the carry (sticky), consumed by the host
  at block boundaries — the device program never raises.

The host-side ``TrackerBank`` owns channel assignment (satellite <-> slot),
converts device outputs into timestamped pseudosymbol streams, and mirrors
the reference's drop/reacquire semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gypsum_tpu.core.config import TrackingConfig
from gypsum_tpu.core.constants import GPS_L1_FREQUENCY_HZ
from gypsum_tpu.core.planes import dequantize_planes, to_complex, to_planes
from gypsum_tpu.signal.prn import ALL_PRN_IDS, replica_table

_EPS = 1e-12


class TrackState(NamedTuple):
    """Loop-filter carry, one entry per channel ([S]-shaped leaves)."""

    code_phase: jax.Array  # f32, fractional samples in [0, L)
    carrier_phase: jax.Array  # f32, NCO phase mod 2*pi
    doppler: jax.Array  # f32 Hz
    # Static per-channel carrier frequency offset (Hz) joined to the wipeoff
    # and NCO advance but NOT to carrier aiding or the PLL state: the FDMA
    # sub-band offset of a GLONASS channel (k * 562.5 kHz), zero for
    # CDMA (GPS/SBAS) channels. Set at assignment, constant while tracking.
    carrier_offset: jax.Array  # f32 Hz
    ema_err: jax.Array  # f32 — EMA of the Costas error
    ema_err_sq: jax.Array  # f32 — EMA of its square (for variance)
    ema_quality: jax.Array  # f32 — EMA of (I^2-Q^2)/(I^2+Q^2)
    step_count: jax.Array  # i32 — ms processed since (re)init
    lost: jax.Array  # bool — sticky lost-lock flag


class TrackBlockOutputs(NamedTuple):
    """Per-millisecond observables, [B, S]-shaped (ms-major, the scan's
    natural stacking order — transposing on device would hand the host
    auto-layout buffers this environment's TPU transfer path rejects; hosts
    transpose for free).

    The prompt correlation peak is split into I/Q float32 planes: this
    environment's TPU backend cannot transfer complex64 arrays back to the
    host (hosts reassemble prompt = prompt_i + 1j * prompt_q)."""

    prompt_i: jax.Array  # f32 — Re(prompt correlation peak)
    prompt_q: jax.Array  # f32 — Im(prompt correlation peak)
    code_phase: jax.Array  # f32 — code phase used for this ms (loop state)
    # Sub-sample code-phase *measurement*: the lag-window peak position
    # refined by triangle interpolation of the correlation magnitudes. This
    # feeds pseudoranges (the loop itself stays on the integer-lag
    # discriminator); one sample at 2.046 Msps is ~147 m of range, the
    # interpolated measurement is good to ~0.1 sample.
    code_phase_measured: jax.Array  # f32
    doppler: jax.Array  # f32
    carrier_phase: jax.Array  # f32
    pll_error: jax.Array  # f32 — normalized Costas error
    dll_error: jax.Array  # f32 — normalized early-late discriminator
    locked: jax.Array  # bool
    quality: jax.Array  # f32 — EMA lock quality at this ms
    lost: jax.Array  # bool — sticky


def fresh_state(n_channels: int) -> TrackState:
    """Host-side (numpy) initial state. The bank keeps loop state on the host
    between blocks — it is a few hundred bytes, and host residency sidesteps
    this environment's TPU restriction on small-rank device->host reads while
    making channel assignment plain array edits."""
    z = np.zeros((n_channels,), dtype=np.float32)
    return TrackState(
        code_phase=z,
        carrier_phase=z.copy(),
        doppler=z.copy(),
        carrier_offset=z.copy(),
        ema_err=z.copy(),
        ema_err_sq=z.copy(),
        ema_quality=z.copy(),
        step_count=np.zeros((n_channels,), dtype=np.int32),
        lost=np.zeros((n_channels,), dtype=bool),
    )


# Jitted block trackers are pure functions of their (hashable) build
# parameters, so they are shared process-wide: without this every
# TrackerBank (one per Receiver) re-traced and re-lowered the same program
# — several hundred ms per construction even on a warm persistent compile
# cache, and the dominant cost of restarting a receiver in-process
# (campaign workers, bench run_once, checkpoint restarts).
_TRACK_FN_CACHE: dict = {}


def make_track_block_fn(
    config: TrackingConfig,
    samples_per_prn: int,
    sample_rate: float,
    n_channels: int,
    stream_of_channel: np.ndarray | None = None,
    input_offset: float = 0.0,
):
    """Build (or fetch the process-wide cached) jitted block-tracking function.

    Returns ``f(state, samples_block [B, L, 2] f32 I/Q planes,
    replicas_tiled [S, 2L+2K] f32) -> (state', TrackBlockOutputs [S, B])``.
    B is fixed by ``config.block_size_ms`` at trace time. Samples cross the
    host->device boundary as float planes (see core/planes.py: this
    environment's TPU backend cannot upload complex64).

    With ``stream_of_channel`` ([S] int), the farm variant: samples_block is
    [B, N, L, 2] (N independent streams) and channel s correlates against
    stream ``stream_of_channel[s]`` (see make_farm_track_block_fn).
    """
    farm_key = (
        None
        if stream_of_channel is None
        else np.asarray(stream_of_channel, dtype=np.int32).tobytes()
    )
    key = (
        config,
        int(samples_per_prn),
        float(sample_rate),
        int(n_channels),
        float(input_offset),
        farm_key,
        jax.default_backend(),  # path selection is backend-dependent
    )
    try:
        return _TRACK_FN_CACHE[key]
    except KeyError:
        pass
    except TypeError:  # unhashable config field — build uncached
        key = None
    fn = _build_track_block_fn(
        config, samples_per_prn, sample_rate, n_channels,
        stream_of_channel=stream_of_channel, input_offset=input_offset,
    )
    if jax.default_backend() == "tpu" and stream_of_channel is None:
        fn = _with_track_aot(
            fn, config, samples_per_prn, sample_rate, n_channels, input_offset
        )
    fn = _with_state_cols(fn)
    if key is not None:
        _TRACK_FN_CACHE[key] = fn
    return fn


def _with_state_cols(fn):
    """Host-level carry-rank normalization: lift rank-1 state leaves to the
    [S, 1] column layout the program RETURNS before entering the traced fn.

    The traced track_block accepts either rank (it reshapes internally),
    but each input rank is its own compiled program: without this, one
    replay pays two XLA compiles per ingest dtype (the first dispatch feeds
    host [S] arrays from fresh_state, every later one feeds the returned
    [S, 1] device columns — measured 2.8 s + 6.6 s of the 17 s cold e2e
    wall), and the in-repo AOT executable (tools/build_aot.py, lowered at
    [S, 1]) can never serve the first dispatch."""
    def lift(a):
        if getattr(a, "ndim", None) == 1:
            if isinstance(a, np.ndarray):
                return a[:, None]
            return jnp.reshape(a, (a.shape[0], 1))
        return a

    def with_cols(state, samples_block, replicas_wide):
        return fn(
            jax.tree_util.tree_map(lift, state), samples_block, replicas_wide
        )

    # Introspection/AOT attributes ride through (tests/test_aot.py,
    # tools/build_aot.py lower via _jit_fn).
    for attr in ("_aot_tag", "_jit_fn", "_aot_holder"):
        if hasattr(fn, attr):
            setattr(with_cols, attr, getattr(fn, attr))
    if not hasattr(with_cols, "_jit_fn"):
        with_cols._jit_fn = fn
    return with_cols


def track_aot_tag(
    config: TrackingConfig,
    samples_per_prn: int,
    sample_rate: float,
    n_channels: int,
    input_offset: float = 0.0,
) -> str:
    """In-repo AOT artifact name for the standard track-block program
    (core/aot.py), keyed on everything that shapes it.

    HOST-ONLY fields are normalized out of the key: pipeline_tracking and
    async_upload change how the Receiver schedules dispatches, never the
    lowered device program — round 4 shipped a track artifact that the
    bench's pipeline_tracking=True config silently never loaded because
    the raw dataclass repr keyed them in."""
    import dataclasses
    import hashlib

    config = dataclasses.replace(
        config, pipeline_tracking=None, async_upload=False
    )
    key = repr((
        "track", config, int(samples_per_prn), float(sample_rate),
        int(n_channels), float(input_offset),
    ))
    return "track_" + hashlib.md5(key.encode()).hexdigest()[:16]


def _with_track_aot(fn, config, samples_per_prn, sample_rate, n_channels,
                    input_offset):
    """Prefer an AOT-serialized executable for this track-block geometry
    when an operator has built one (tools/build_aot.py). None ships by
    default since r05: a deserialized executable's first run sporadically
    stalls for minutes on this environment's tunnel and blocks the whole
    device queue (docs/DESIGN_NOTES.md "Round 5: the tunnel stall study"),
    so the cold-compile problem (11-25 s per track program on a recycled
    machine) is solved by the shipped persistent-cache seeds instead
    (tools/build_cache_seed.py). Loading starts on a daemon thread NOW
    (overlapping the receiver's acquisition phase); the first call joins
    it. Any mismatch or call failure falls back to the jitted build
    permanently."""
    import threading

    tag = track_aot_tag(
        config, samples_per_prn, sample_rate, n_channels, input_offset
    )
    holder: dict = {}

    def _load() -> None:
        from gypsum_tpu.core.aot import load_compiled

        holder["aot"] = load_compiled(tag)

    t = threading.Thread(target=_load, daemon=True, name=f"aot-{tag}")
    t.start()

    def wrapper(state, samples, replicas):
        # A call under an active trace (shard_map/jit/vmap of this fn —
        # e.g. the sharded multi-chip path traces the SAME cached wrapper)
        # can never use a serialized executable; route it to the jitted
        # build WITHOUT touching the artifact. Round-4 weakness: the old
        # wrapper treated the resulting exception as "artifact incompatible"
        # and permanently disabled AOT for every later direct call in the
        # process (_TRACK_FN_CACHE shares the wrapper).
        if any(
            isinstance(leaf, jax.core.Tracer)
            for arg in (state, samples, replicas)
            for leaf in jax.tree_util.tree_leaves(arg)
        ):
            return fn(state, samples, replicas)
        if "aot" not in holder:
            t.join()
        aot = holder.get("aot")
        if aot is not None:
            try:
                return aot(state, samples, replicas)
            except Exception:
                # Genuinely incompatible artifacts fail deterministically;
                # transient backend errors (e.g. a tunnel FAILED_PRECONDITION)
                # do not. Allow one strike before permanently falling back
                # to the jitted build.
                holder["strikes"] = holder.get("strikes", 0) + 1
                if holder["strikes"] >= 2:
                    holder["aot"] = None
        return fn(state, samples, replicas)

    wrapper._aot_tag = tag
    wrapper._jit_fn = fn
    wrapper._aot_holder = holder  # test introspection (tests/test_aot.py)
    return wrapper


def _build_track_block_fn(
    config: TrackingConfig,
    samples_per_prn: int,
    sample_rate: float,
    n_channels: int,
    stream_of_channel: np.ndarray | None = None,
    input_offset: float = 0.0,
):
    cfg = config
    length = samples_per_prn
    fs = float(sample_rate)
    k_half = cfg.lag_window_half_width
    n_lags = 2 * k_half + 1
    t_ms = length / fs  # chunk duration (1 ms when fs = 1000 * L)

    zeta = cfg.pll_damping_factor

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
    w_chip = float(length) / float(cfg.chips_per_code)

    def gains(bw):
        # Second-order loop, update period = one chunk: proportional gain on
        # the (normalized, ~radian) error, integral gain in Hz per error unit.
        return 4.0 * zeta * bw * t_ms, 4.0 * (bw**2) * t_ms

    kp_locked, ki_locked = gains(cfg.pll_bandwidth_locked_hz)
    kp_pullin, ki_pullin = gains(cfg.pll_bandwidth_pullin_hz)

    lam_err = 1.0 / cfg.lock_window_ms
    lam_q = 1.0 / cfg.quality_window_ms
    # Code-phase advance per ms implied by carrier Doppler (carrier aiding):
    # the received code rate scales by (1 + fd/fL1), so the code arrives
    # earlier by fd/fL1 * L samples each ms.
    f_aid = cfg.aiding_carrier_hz or GPS_L1_FREQUENCY_HZ
    aiding_scale = (length / f_aid) if cfg.carrier_aiding else 0.0

    # numpy closure constant (a captured device array would need a
    # device->host copy at lowering time).
    l_over_fs = (np.arange(length) / fs).astype(np.float32)  # [L]

    def window_slices(replicas_wide: jax.Array, base: jax.Array) -> jax.Array:
        # replicas_wide: [S, 2L + 2K]; base: [S] int32 in [0, L).
        # One dynamic slice of length L + 2K per channel, then n_lags static
        # sub-slices (XLA fuses these into views). Sub-slice k starts at
        # base + k and equals the replica rolled by (cp + K - k) — a
        # *descending* lag order — so flip to make row j correspond to lag
        # cp - K + j (ascending: row K-1 early, row K prompt, row K+1 late).
        win = jax.vmap(
            lambda t, b: jax.lax.dynamic_slice(t, (b,), (length + 2 * k_half,))
        )(replicas_wide, base)  # [S, L + 2K]
        rows = jnp.stack([win[:, k : k + length] for k in range(n_lags)], axis=1)
        return rows[:, ::-1, :]

    use_pallas = cfg.use_pallas_correlator
    if use_pallas is None or stream_of_channel is not None:
        # (the per-ms kernel assumes one shared stream; measured slower than
        # the XLA path on TPU v5e anyway)
        use_pallas = False
    hoist = cfg.hoist_lag_window and not use_pallas
    if cfg.lag_window_block_margin is not None:
        margin = cfg.lag_window_block_margin
    else:
        # Doppler-aided code drift at +/-7 kHz over one block + DLL slack.
        aiding_drift = 7000.0 / f_aid * length * cfg.block_size_ms
        margin = int(np.ceil(aiding_drift)) + 8
    k_eff = k_half + margin
    n_lags_eff = 2 * k_eff + 1

    def correlate_xla(replicas_wide, state, chunk_2d, base):
        # --- carrier wipeoff: x = chunk * e^{-j(theta + 2 pi (f + f_off) l / fs)}
        phase = state.carrier_phase[:, None] + (
            2.0 * jnp.pi * (state.doppler + state.carrier_offset)[:, None]
            * jnp.asarray(l_over_fs)[None, :]
        )  # [S, L]
        wipe = jax.lax.complex(jnp.cos(phase), -jnp.sin(phase))
        x = chunk_2d * wipe  # [S, L] ([1, L] chunks broadcast)
        # --- lag-window correlation around the prompt (batched matmul).
        wide = window_slices(replicas_wide, base)  # [S, n_lags, L]
        return jnp.einsum("skl,sl->sk", wide, x)  # [S, n_lags] c64

    def correlate_pallas(replicas_wide, state, chunk_2d, base):
        from gypsum_tpu.ops.pallas_kernels import wipeoff_lag_correlate_pallas

        chunk = chunk_2d[0]  # the per-ms kernel supports one shared stream
        params = jnp.stack(
            [
                state.carrier_phase,
                state.doppler + state.carrier_offset,  # wipeoff frequency
                base.astype(jnp.float32),
            ],
            axis=-1,
        )  # [S, 3]
        planes = wipeoff_lag_correlate_pallas(
            jnp.stack([jnp.real(chunk), jnp.imag(chunk)]),
            replicas_wide,
            params,
            length=length,
            n_lags=n_lags,
            inv_fs=1.0 / fs,
        )  # [S, 2, n_lags]
        return jax.lax.complex(planes[:, 0, :], planes[:, 1, :])

    def make_hoisted_correlate(replicas_wide: jax.Array, state0: TrackState):
        """Block-static lag window: one dynamic slice per channel per BLOCK
        (the per-ms vmapped dynamic_slice gather dominated the legacy step,
        see TrackingConfig.hoist_lag_window). Returns a per-ms correlate
        closure evaluating all n_lags_eff static lags and selecting the
        2K+1 around the current prompt."""
        cpi0 = jnp.floor(state0.code_phase).astype(jnp.int32) % length  # [S]
        base0 = jnp.mod(length - cpi0 - k_eff, length)  # [S]
        # Widen the tiled replica to cover base0 + L + 2K_eff reads.
        w2 = jnp.concatenate(
            [replicas_wide[:, : 2 * length], replicas_wide[:, : 2 * k_eff]], axis=1
        )
        win = jax.vmap(
            lambda t, b: jax.lax.dynamic_slice(t, (b,), (length + 2 * k_eff,))
        )(w2, base0)  # [S, L + 2K_eff]
        # Ascending lag order: row j <-> lag (cp0 - K_eff + j).
        rows = jnp.stack(
            [win[:, k : k + length] for k in range(n_lags_eff)], axis=1
        )[:, ::-1, :]  # [S, n_lags_eff, L]

        def correlate(state, chunk_2d, cp_int):
            # chunk_2d: [1, L] (shared stream, broadcasts) or [S, L] (one
            # stream per channel — the farm path).
            phase = state.carrier_phase[:, None] + (
                2.0 * jnp.pi * (state.doppler + state.carrier_offset)[:, None]
                * jnp.asarray(l_over_fs)[None, :]
            )  # [S, L]
            c, s = jnp.cos(phase), jnp.sin(phase)
            cr_ = jnp.real(chunk_2d)
            ci_ = jnp.imag(chunk_2d)
            # chunk * e^{-j phase} split into real planes (replica rows are
            # real +/-1, so the correlation is two real matmuls).
            xr = cr_ * c + ci_ * s
            xi = ci_ * c - cr_ * s
            all_r = jnp.einsum("skl,sl->sk", rows, xr)  # [S, n_lags_eff]
            all_i = jnp.einsum("skl,sl->sk", rows, xi)
            # Select lags (prompt-K .. prompt+K) around the current prompt;
            # clamp keeps the window in range if the drift outruns the
            # margin (the host re-centers next block).
            delta = jnp.mod(cp_int - cpi0 + length // 2, length) - length // 2
            j = jnp.clip(delta + k_eff, k_half, n_lags_eff - 1 - k_half)
            idx = j[:, None] + jnp.arange(-k_half, k_half + 1)[None, :]
            return jax.lax.complex(
                jnp.take_along_axis(all_r, idx, axis=1),
                jnp.take_along_axis(all_i, idx, axis=1),
            )

        return correlate

    def make_per_ms_correlate(replicas_wide: jax.Array):
        inner = correlate_pallas if use_pallas else correlate_xla

        def correlate(state, chunk_2d, cp_int):
            base = jnp.mod(length - cp_int - k_half, length)  # [S]
            return inner(replicas_wide, state, chunk_2d, base)

        return correlate

    def step(correlate, state: TrackState, chunk_2d: jax.Array):
        # chunk_2d: [1, L] (shared stream) or [S, L] (farm) complex64.
        cp_int = jnp.floor(state.code_phase).astype(jnp.int32) % length  # [S]
        corr = correlate(state, chunk_2d, cp_int)  # [S, n_lags] c64

        power = jnp.abs(corr) ** 2  # [S, n_lags]
        early = power[:, k_half - 1]
        late = power[:, k_half + 1]
        peak_idx = jnp.argmax(power, axis=-1)
        prompt = jnp.take_along_axis(corr, peak_idx[:, None], axis=-1)[:, 0]  # [S]

        # Sub-sample peak position: the C/A correlation is a triangle in lag,
        # so the vertex offset from the argmax is
        # (R+ - R-) / (2 (R0 - min(R+, R-))) in samples, with R = |corr|.
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
            frac = -w_chip * ((rm - rp) - 0.5 * (take(-2) - take(2))) / (r0 + _EPS)
            frac = jnp.clip(frac, -1.5, 1.5)
        else:
            frac = (rp - rm) / (2.0 * (r0 - jnp.minimum(rp, rm)) + _EPS)
            frac = jnp.clip(frac, -0.5, 0.5)
        code_phase_measured = jnp.mod(
            cp_int.astype(jnp.float32) + (peak_idx - k_half).astype(jnp.float32) + frac,
            float(length),
        )

        # --- DLL: normalized early-late power discriminator. Positive means
        # the true peak sits earlier than the prompt -> decrease code phase.
        dll_err = (early - late) / (early + late + _EPS)
        code_phase = state.code_phase - cfg.dll_gain_samples * dll_err
        code_phase = code_phase - aiding_scale * state.doppler
        code_phase = jnp.mod(code_phase, float(length))

        # --- Costas PLL on the prompt peak (insensitive to BPSK flips).
        i, q = jnp.real(prompt), jnp.imag(prompt)
        pll_err = (i * q) / (i * i + q * q + _EPS)  # ~ 0.5 sin(2 theta)

        # Lock metrics: bias-corrected EMAs (the raw EMA starts at zero, so
        # dividing by 1-(1-lambda)^n removes the warm-up bias — the corrected
        # value estimates the true windowed mean from the first step).
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
        # NCO advance for the elapsed chunk (using the frequency the chunk
        # was wiped with), then the loop correction. The FDMA offset's
        # contribution is reduced mod one cycle BEFORE the f32 radian
        # conversion: offset * t_ms is exactly representable (k * 562.5
        # cycles) while 2 pi * that is not, and the resulting rounding bias
        # would otherwise masquerade as a ~0.1 Hz Doppler error.
        two_pi = 2.0 * jnp.pi
        off_cycles = state.carrier_offset * t_ms
        off_frac = off_cycles - jnp.round(off_cycles)
        carrier_phase = jnp.mod(
            state.carrier_phase
            + two_pi * (state.doppler * t_ms + off_frac)
            + kp * pll_err,
            two_pi,
        )
        doppler = state.doppler + ki * pll_err

        # Watchdog (reference: gypsum/tracker.py:370-388): sticky lost flag
        # once the quality EMA collapses after warmup.
        watchdog_armed = state.step_count >= cfg.watchdog_warmup_ms
        lost = state.lost | (watchdog_armed & (ema_quality < cfg.quality_drop_threshold))

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

    farm_idx = None
    if stream_of_channel is not None:
        farm_idx = np.asarray(stream_of_channel, dtype=np.int32)
        assert farm_idx.shape == (n_channels,)

    # The two-phase MXU tracker (track/matmul.py) supersedes both the scan
    # and the Pallas block kernel by default — it is the fastest path on
    # BOTH backends (TPU: 16.8 -> ~3 ms per 1 s block; CPU: 727 -> ~60 ms).
    # An explicit use_pallas_block_tracker=True still selects the block
    # kernel (parity tests compare the implementations).
    use_matmul = cfg.use_matmul_tracker
    if use_matmul is None:
        use_matmul = cfg.use_pallas_block_tracker is not True
    if use_matmul:
        from gypsum_tpu.track.matmul import make_matmul_track_block_fn

        return make_matmul_track_block_fn(
            cfg, length, fs, n_channels, stream_of_channel=farm_idx,
            input_offset=input_offset,
        )

    if farm_idx is not None:
        use_block_kernel = False  # the block kernel assumes one shared stream
    else:
        use_block_kernel = cfg.use_pallas_block_tracker
    if use_block_kernel is None:
        # Measured on TPU v5e at 32 channels x 1000 ms: 22 ms/block vs 29 ms
        # for the XLA hoisted scan (the kernel keeps the lag matrix VMEM-
        # resident and pays no per-iteration sequencing). Interpret mode is
        # far slower than XLA on CPU, so only the TPU backend defaults to it.
        # NOTE: a pallas_call is opaque to GSPMD — channel-sharded multi-chip
        # tracking (parallel/sharded.py) must set
        # use_pallas_block_tracker=False to keep the partitionable scan path.
        use_block_kernel = jax.default_backend() == "tpu"
        if use_block_kernel:
            from gypsum_tpu.ops.pallas_track import lag_matrix_bytes

            need = lag_matrix_bytes(cfg, length, n_channels)
            if need > 12 * 1024 * 1024:  # keep headroom in the ~16 MB VMEM
                import logging

                logging.getLogger(__name__).warning(
                    "lag matrix (%d MB) would not stay VMEM-resident; "
                    "using the XLA scan path", need >> 20,
                )
                use_block_kernel = False
    if use_block_kernel:
        return _make_block_kernel_wrapper(cfg, length, fs, n_channels, input_offset)

    def track_block(state: TrackState, samples_block: jax.Array, replicas_wide: jax.Array):
        # Accept either [S] or [S, 1] carry leaves (the function returns
        # columns; callers may feed them straight back in).
        state = jax.tree_util.tree_map(lambda a: jnp.asarray(a).reshape((a.shape[0],)), state)
        samples_block = dequantize_planes(samples_block, input_offset)
        chunks = to_complex(samples_block)  # [B, L] (or [B, N, L]) c64
        correlate = (
            make_hoisted_correlate(replicas_wide, state)
            if hoist
            else make_per_ms_correlate(replicas_wide)
        )
        if farm_idx is None:
            body = lambda st, chunk: step(correlate, st, chunk[None, :])
        else:
            idx = jnp.asarray(farm_idx)
            body = lambda st, chunk_n: step(correlate, st, jnp.take(chunk_n, idx, axis=0))
        new_state, outs = jax.lax.scan(
            body,
            state,
            chunks,
            unroll=min(cfg.scan_unroll, chunks.shape[0]),
        )
        # Outputs stay [B, S] (the scan's stacking order; see
        # TrackBlockOutputs). Return the carry as [S, 1] columns: rank-2 so
        # the host can always read it back (rank-1 device->host transfers are
        # unsupported on this environment's TPU backend).
        state_cols = jax.tree_util.tree_map(lambda a: a[:, None], new_state)
        return state_cols, outs

    return jax.jit(track_block)


def make_farm_track_block_fn(
    config: TrackingConfig,
    samples_per_prn: int,
    sample_rate: float,
    n_channels: int,
    stream_of_channel: np.ndarray,  # [S] int — which stream each channel reads
):
    """Multi-stream ("replay farm") block tracker: each channel consumes its
    own IQ stream — N independent captures / antennas tracked in one device
    dispatch (the production batch axis; the reference is single-stream by
    construction).

    Returns ``f(state, samples_block [B, N, L, 2] f32 planes,
    replicas_tiled [S, >=2L+2K] f32) -> (state', TrackBlockOutputs [B, S])``;
    ``stream_of_channel[s]`` selects the stream channel s correlates against.
    """
    return make_track_block_fn(
        config, samples_per_prn, sample_rate, n_channels,
        stream_of_channel=stream_of_channel,
    )


def _make_block_kernel_wrapper(cfg, length, fs, n_channels, input_offset=0.0):
    """Adapt the whole-block Pallas kernel (ops/pallas_track.py) to the
    TrackState/TrackBlockOutputs contract of the scan path."""
    from gypsum_tpu.ops import pallas_track as pt

    if cfg.code_phase_measurement != "triangle":
        raise ValueError(
            "the legacy Pallas block tracker only implements the 'triangle' "
            "code-phase measurement; use the matmul or scan tracker for "
            f"{cfg.code_phase_measurement!r}"
        )

    inner = pt.make_pallas_track_block_fn(cfg, length, fs, n_channels)

    def track_block(state: TrackState, samples_block, replicas_wide):
        state = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a).reshape((a.shape[0],)), state
        )
        samples_block = dequantize_planes(samples_block, input_offset)
        rows = jnp.stack(
            [
                state.code_phase.astype(jnp.float32),
                state.carrier_phase.astype(jnp.float32),
                state.doppler.astype(jnp.float32),
                state.ema_err.astype(jnp.float32),
                state.ema_err_sq.astype(jnp.float32),
                state.ema_quality.astype(jnp.float32),
                state.step_count.astype(jnp.float32),
                state.lost.astype(jnp.float32),
                jnp.zeros_like(state.code_phase, dtype=jnp.float32),  # cpi0 (kernel fills)
            ]
        )  # [N_CARRY, S]
        fin, outs = inner(rows, samples_block, replicas_wide)
        # NOTE: the legacy block kernel predates FDMA carrier offsets and
        # ignores them (TrackerBank.assign rejects nonzero offsets when this
        # path is forced); the offset column rides through unchanged.
        new_state = TrackState(
            code_phase=fin[pt._CP, :][:, None],
            carrier_phase=fin[pt._TH, :][:, None],
            doppler=fin[pt._FD, :][:, None],
            carrier_offset=state.carrier_offset[:, None],
            ema_err=fin[pt._EERR, :][:, None],
            ema_err_sq=fin[pt._EERR2, :][:, None],
            ema_quality=fin[pt._EQ, :][:, None],
            step_count=fin[pt._STEP, :][:, None].astype(jnp.int32),
            lost=fin[pt._LOST, :][:, None] > 0.5,
        )
        outputs = TrackBlockOutputs(
            prompt_i=outs[:, pt._O_PI, :],
            prompt_q=outs[:, pt._O_PQ, :],
            code_phase=outs[:, pt._O_CP, :],
            code_phase_measured=outs[:, pt._O_CPM, :],
            doppler=outs[:, pt._O_FD, :],
            carrier_phase=outs[:, pt._O_TH, :],
            pll_error=outs[:, pt._O_PLL, :],
            dll_error=outs[:, pt._O_DLL, :],
            locked=outs[:, pt._O_LOCKED, :] > 0.5,
            quality=outs[:, pt._O_QUAL, :],
            lost=outs[:, pt._O_LOST, :] > 0.5,
        )
        return new_state, outputs

    return jax.jit(track_block)


@dataclass
class ChannelObservation:
    """Host-side view of one channel's block outputs, timestamped."""

    prn: int
    slot: int
    # Arrays of length B (block size in ms):
    pseudosymbol_signs: np.ndarray  # int8 +/-1
    start_times: np.ndarray  # f64 — code-phase-corrected leading edges
    end_times: np.ndarray  # f64
    prompts: np.ndarray  # c64
    code_phases: np.ndarray  # f32 — loop state
    code_phases_measured: np.ndarray  # f32 — sub-sample interpolated
    dopplers: np.ndarray  # f32
    carrier_phases: np.ndarray  # f32 — NCO phase at each ms
    pll_errors: np.ndarray  # f32 — normalized Costas discriminator
    dll_errors: np.ndarray  # f32 — normalized early-late discriminator
    locked: np.ndarray  # bool
    quality: np.ndarray  # f32
    lost: bool  # sticky lost-lock flag at block end


class TrackerBank:
    """Host orchestration of a fixed bank of tracking channels.

    Channels are static slots (device arrays have fixed [S] shapes); a slot is
    bound to a PRN at acquisition and freed on lost lock — the analogue of the
    reference's per-satellite pipeline dict
    (reference: gypsum/receiver.py:70-72,225-256).
    """

    def __init__(
        self,
        sample_rate: float,
        samples_per_prn: int,
        config: TrackingConfig | None = None,
        n_channels: int = 12,
        input_offset: float = 0.0,
        prns: tuple[int, ...] = ALL_PRN_IDS,
        mesh=None,
    ) -> None:
        """``mesh``: a jax.sharding.Mesh with a 'sat' axis — the bank's
        block program becomes the channel-sharded fast tracker
        (parallel/sharded.py:make_sharded_track_block_fn): each device runs
        the full single-device program (matmul + Pallas fixup) on its
        n_channels / n_shards slice; the host orchestration (assignment,
        observation building, drop/rescue/coast) is unchanged. This is the
        multi-chip FULL-RECEIVER path — a Receiver built over a sharded
        bank runs acquisition -> sharded tracking -> nav decode -> fix with
        no other code aware of the mesh."""
        self.config = config or TrackingConfig()
        self.sample_rate = float(sample_rate)
        self.samples_per_prn = int(samples_per_prn)
        self.n_channels = n_channels
        self.prns = tuple(prns)
        self._prn_row = {prn: i for i, prn in enumerate(self.prns)}
        self.mesh = mesh
        if mesh is not None:
            from gypsum_tpu.parallel.sharded import make_sharded_track_block_fn

            self._fn = make_sharded_track_block_fn(
                mesh, self.config, self.samples_per_prn, self.sample_rate,
                n_channels, input_offset=input_offset,
            )
        else:
            self._fn = make_track_block_fn(
                self.config, self.samples_per_prn, self.sample_rate, n_channels,
                input_offset=input_offset,
            )
        k = self.config.lag_window_half_width
        reps = replica_table(self.samples_per_prn, self.prns)  # [N, L]
        self._replicas_wide = np.concatenate(
            [reps, reps, reps[:, : 2 * k]], axis=1
        ).astype(np.float32)  # [N, 2L + 2K]
        self.state = fresh_state(n_channels)
        # Pack the 11 per-ms output fields into ONE device buffer before the
        # host fetch: on this environment's TPU tunnel device_get pays a
        # large PER-ARRAY round-trip cost (measured 103 ms/block for the 11
        # separate [B, S] fields vs ~bandwidth-bound for one [11, B, S]
        # buffer) — the single biggest term in end-to-end replay wall time.
        # CPU gains nothing (fetch is a memcpy), so only the TPU backend
        # packs.
        self._pack_outputs = jax.default_backend() == "tpu"
        self._pack_fn = jax.jit(
            lambda o: jnp.stack(
                [
                    o.prompt_i,
                    o.prompt_q,
                    o.code_phase,
                    o.code_phase_measured,
                    o.doppler,
                    o.carrier_phase,
                    o.pll_error,
                    o.dll_error,
                    o.locked.astype(jnp.float32),
                    o.quality,
                    o.lost.astype(jnp.float32),
                ]
            )
        )
        self.slot_prn: list[int | None] = [None] * n_channels
        self._last_rescue_time = np.full(n_channels, -np.inf)
        self.rescue_counts = np.zeros(n_channels, dtype=int)
        # Pipelining (config.pipeline_tracking): the carry stays
        # device-resident between dispatches; host edits force a sync.
        self._device_state = None  # [S, 1]-column device tree or None
        self._pending: list = []  # dispatched-but-uncollected blocks
        self._replica_cache: tuple[bytes | None, object] = (None, None)

    # ----------------------------------------------------------- assignment

    def sync_host_state(self) -> None:
        """Bring the authoritative carry back to host numpy (fetches the
        latest dispatched state when the carry is device-resident). Host
        edits (assign/release/rescue) and checkpointing require this."""
        if self._device_state is not None:
            cols = jax.device_get(self._device_state)
            self.state = TrackState(*(np.array(np.asarray(a)[:, 0]) for a in cols))
            self._device_state = None

    def invalidate_device_state(self) -> None:
        """Forget any device-resident carry (after externally replacing
        ``self.state``, e.g. checkpoint restore)."""
        self._device_state = None

    def assign(
        self,
        prn: int,
        doppler_hz: float,
        code_phase_samples: float,
        carrier_phase_rad: float,
        carrier_offset_hz: float = 0.0,
    ) -> int:
        """Bind a free slot to a newly acquired satellite; returns the slot.
        State lives on the host (numpy), so this is a plain array edit.

        ``carrier_offset_hz``: static sub-band offset for FDMA signals
        (GLONASS: k * 562.5 kHz); ``doppler_hz`` stays the Doppler RELATIVE
        to that offset."""
        if carrier_offset_hz and self.config.use_pallas_block_tracker is True:
            raise ValueError(
                "the legacy Pallas block tracker does not support FDMA "
                "carrier offsets; use the matmul or scan tracker"
            )
        self.sync_host_state()
        try:
            slot = self.slot_prn.index(None)
        except ValueError:
            raise RuntimeError("no free tracking channels") from None
        self.slot_prn[slot] = prn
        s = self.state
        s.code_phase[slot] = code_phase_samples % self.samples_per_prn
        s.carrier_phase[slot] = carrier_phase_rad % (2 * np.pi)
        s.doppler[slot] = doppler_hz
        s.carrier_offset[slot] = carrier_offset_hz
        s.ema_err[slot] = 0.0
        s.ema_err_sq[slot] = 0.0
        s.ema_quality[slot] = 0.0
        s.step_count[slot] = 0
        s.lost[slot] = False
        return slot

    def release(self, slot: int) -> None:
        self.sync_host_state()
        self.slot_prn[slot] = None
        self.state.lost[slot] = False
        self.state.carrier_offset[slot] = 0.0
        self._last_rescue_time[slot] = -np.inf
        self.rescue_counts[slot] = 0

    # -------------------------------------------------------------- rescue

    def maybe_rescue(self, obs: "ChannelObservation", now: float) -> bool:
        """Degradation short of drop (reference: gypsum/tracker.py:380-387):
        when a channel's block-end quality sits in the marginal band
        [quality_drop_threshold, rescue_quality_threshold), correct its
        Doppler in place instead of letting it decay to a drop + 10 s-cadence
        reacquisition + bit/subframe resync.

        The reference nudges +/-5 Hz in the constellation-rotation direction;
        here the residual Doppler is measured exactly (sign and magnitude,
        unambiguous to +/-250 Hz) from the phase slope of the squared prompt
        stream — the same BPSK-flip-cancelling trick the acquisition engine's
        refinement stage uses (acquire/engine.py). Lock EMAs and the step
        counter reset so the watchdog re-warms (the analogue of the
        reference's 6 s adjustment cadence). Returns True if rescued."""
        cfg = self.config
        slot = obs.slot
        if not cfg.rescue_enabled or obs.lost:
            return False
        quality = float(obs.quality[-1])
        if quality >= cfg.rescue_quality_threshold:
            self.rescue_counts[slot] = 0
            return False
        self.sync_host_state()  # rescue edits the carry on the host
        # Quality EMA must have had time to mean anything.
        if int(self.state.step_count[slot]) < cfg.quality_window_ms:
            return False
        if now - self._last_rescue_time[slot] < cfg.rescue_period_s:
            return False

        # Residual Doppler from the squared-prompt phase slope over the last
        # ~250 ms: z = p^2 rotates at twice the residual rate.
        p = obs.prompts[-250:].astype(np.complex128)
        z = p * p
        if len(z) < 8:
            return False
        s = np.sum(z[1:] * np.conj(z[:-1]))
        if abs(s) == 0.0:
            return False
        t_ms = self.samples_per_prn / self.sample_rate
        residual_hz = float(np.angle(s)) / (2.0 * 2.0 * np.pi * t_ms)
        residual_hz = float(
            np.clip(residual_hz, -cfg.rescue_max_correction_hz, cfg.rescue_max_correction_hz)
        )

        st = self.state
        st.doppler[slot] += residual_hz
        st.ema_err[slot] = 0.0
        st.ema_err_sq[slot] = 0.0
        st.ema_quality[slot] = 0.0
        st.step_count[slot] = 0
        st.lost[slot] = False
        self._last_rescue_time[slot] = now
        self.rescue_counts[slot] += 1
        return True

    def coast_override(self, slot: int, code_phase_samples: float, doppler_hz: float) -> None:
        """Vector coast (deep-integration tier above rescue): drive a blocked
        channel's code phase and Doppler open-loop from the navigation
        solution's predicted geometry (runtime/receiver.py computes the
        prediction; reference: no counterpart — gypsum can only drop and
        reacquire, gypsum/receiver.py:248-267). Lock EMAs and the step
        counter reset each application so the watchdog never re-fires on the
        (noise-driven) discriminators while the signal is absent."""
        self.sync_host_state()
        s = self.state
        s.code_phase[slot] = code_phase_samples % self.samples_per_prn
        s.doppler[slot] = doppler_hz
        s.ema_err[slot] = 0.0
        s.ema_err_sq[slot] = 0.0
        s.ema_quality[slot] = 0.0
        s.step_count[slot] = 0
        s.lost[slot] = False

    @property
    def active_slots(self) -> list[int]:
        return [i for i, p in enumerate(self.slot_prn) if p is not None]

    @property
    def free_slots(self) -> list[int]:
        return [i for i, p in enumerate(self.slot_prn) if p is None]

    @property
    def tracked_prns(self) -> list[int]:
        return [p for p in self.slot_prn if p is not None]

    # ------------------------------------------------------------ processing

    def _device_replicas(self, prn_idx: np.ndarray):
        """Device-resident replica rows for the current slot->PRN binding
        (re-uploaded only when assignments change — the [S, 2L+2K] f32 table
        is ~1 MB and host->device bandwidth is the scarce resource on this
        environment's tunnel)."""
        key = prn_idx.tobytes()
        if self._replica_cache[0] != key:
            self._replica_cache = (key, jnp.asarray(self._replicas_wide[prn_idx]))
        return self._replica_cache[1]

    def dispatch_block(self, samples_block: np.ndarray, block_start_time: float) -> None:
        """Submit one [B, L] block to the device WITHOUT waiting for results.

        The carry chains device-side from the previous dispatch (no host
        round trip unless an edit intervened); sample upload and device
        compute overlap the host's processing of earlier blocks. Collect
        results in dispatch order with collect_block()."""
        prn_idx = np.array(
            [self._prn_row[p] if p is not None else 0 for p in self.slot_prn],
            dtype=np.int32,
        )
        replicas = self._device_replicas(prn_idx)
        state_in = self._device_state if self._device_state is not None else self.state
        if np.iscomplexobj(samples_block):
            planes = to_planes(samples_block)
        else:
            # Already [B, L, 2] planes — float32 or raw integer words (the
            # quantized-upload path; dequantization happens in-graph).
            planes = samples_block
        state_cols, outs = self._fn(state_in, jnp.asarray(planes), replicas)
        self._device_state = state_cols
        if self._pack_outputs:
            outs = self._pack_fn(outs)  # one [11, B, S] buffer, one fetch
        self._pending.append(
            (outs, samples_block.shape[0], block_start_time, list(self.slot_prn))
        )

    @property
    def pending_blocks(self) -> int:
        return len(self._pending)

    @property
    def pending_ms(self) -> int:
        """Milliseconds of signal dispatched but not yet collected — the
        staleness any host edit of the carry suffers before taking effect
        (the in-flight blocks run on the pre-edit state)."""
        return sum(b for _, b, _, _ in self._pending)

    def collect_block(self) -> tuple[float, int, list[ChannelObservation]]:
        """Fetch and unpack the OLDEST dispatched block. Returns
        (block_start_time, n_ms, observations) — observations reflect the
        slot->PRN binding at dispatch time."""
        if not self._pending:
            raise RuntimeError("no dispatched block to collect")
        outs_dev, b, block_start_time, slot_prn = self._pending.pop(0)
        if self._pack_outputs:
            raw = np.asarray(jax.device_get(outs_dev))  # [11, B, S]
            t = [raw[i].T for i in range(11)]
            outs = TrackBlockOutputs(
                *t[:8], t[8] > 0.5, t[9], t[10] > 0.5
            )
        else:
            outs = TrackBlockOutputs(
                *(np.asarray(a).T for a in jax.device_get(outs_dev))
            )
        return block_start_time, b, self._build_observations(outs, b, block_start_time, slot_prn)

    def process_block(self, samples_block: np.ndarray, block_start_time: float) -> list[ChannelObservation]:
        """Track one [B, L] block synchronously (dispatch + collect).

        ``block_start_time`` is the receiver timestamp (s) of the block's first
        sample; pseudosymbol timestamps are code-phase corrected exactly like
        the reference (gypsum/tracker.py:319-328).
        """
        self.dispatch_block(samples_block, block_start_time)
        return self.collect_block()[2]

    def _build_observations(
        self,
        outs: TrackBlockOutputs,
        b: int,
        block_start_time: float,
        slot_prn: list[int | None],
    ) -> list[ChannelObservation]:
        observations = []
        ms = np.arange(b, dtype=np.float64) * (self.samples_per_prn / self.sample_rate)
        for slot, prn in enumerate(slot_prn):
            if prn is None:
                continue
            delay = (
                outs.code_phase[slot].astype(np.float64) / self.samples_per_prn
            ) * (self.samples_per_prn / self.sample_rate)
            starts = block_start_time + ms + delay
            ends = starts + (self.samples_per_prn / self.sample_rate)
            signs = np.sign(outs.prompt_i[slot]).astype(np.int8)
            signs[signs == 0] = 1
            prompts = (outs.prompt_i[slot] + 1j * outs.prompt_q[slot]).astype(np.complex64)
            observations.append(
                ChannelObservation(
                    prn=prn,
                    slot=slot,
                    pseudosymbol_signs=signs,
                    start_times=starts,
                    end_times=ends,
                    prompts=prompts,
                    code_phases=outs.code_phase[slot],
                    code_phases_measured=outs.code_phase_measured[slot],
                    dopplers=outs.doppler[slot],
                    carrier_phases=outs.carrier_phase[slot],
                    pll_errors=outs.pll_error[slot],
                    dll_errors=outs.dll_error[slot],
                    locked=outs.locked[slot],
                    quality=outs.quality[slot],
                    lost=bool(outs.lost[slot][-1]),
                )
            )
        return observations
