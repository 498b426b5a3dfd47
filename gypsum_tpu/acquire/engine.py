"""Cold-start acquisition: one device program for the whole constellation.

Reference behavior being reproduced (gypsum/acquisition.py): search each PRN
over +/-7 kHz of Doppler and all code phases using 10 ms of non-coherently
integrated FFT correlation; accept satellites whose normalized peak strength
exceeds 3.0; report (Doppler, code phase, carrier phase, strength).

TPU-first re-design (not a port):

- The reference's data-dependent coarse-to-fine halving loop
  (gypsum/acquisition.py:81-108 — ~10 rounds x 20 bins of sequential numpy
  FFTs *per PRN*) is JIT-hostile. Here the search is two *static* stages
  compiled into a single program evaluating all 32 PRNs at once:

  1. Coarse: non-coherent 10 ms integration over a fixed +/-7 kHz / 500 Hz
     grid, batched over [sat x Doppler x code phase]; argmax gives the code
     phase and a Doppler bin. (500 Hz matches the ~1 kHz main-lobe width of a
     1 ms correlation — finer coarse bins buy nothing.)
  2. Fine: *coherent* 10 ms integration at the detected code phase over a
     +/-400 Hz / 25 Hz offset grid around the coarse bin (10 ms coherent
     integration has a ~100 Hz main lobe, so 25 Hz bins are meaningful —
     unlike the reference's non-coherent "refinement" to 10 Hz, which can't
     actually resolve below a few hundred Hz).

- A final closed-form refinement estimates residual Doppler from the phase
  slope of the per-ms prompt correlations, squared to cancel BPSK nav-bit
  flips: delta_f = angle(sum_m (p_{m+1} conj(p_m))^2) / (2 * 2 pi * 1 ms).
  This lands within a few Hz of truth — tighter than the reference's bin pick
  — giving the PLL a near-zero initial frequency error.

- The fine stage is evaluated as an MXU matmul: the per-satellite coarse
  wipeoff is separable from the shared fine-offset basis, so each millisecond
  contributes one [S, L] x [L, F] product.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gypsum_tpu.core.config import AcquisitionConfig
from gypsum_tpu.core.planes import to_complex, to_planes

_UNSET = object()  # "AOT lookup not attempted yet" sentinel


def circulant_aot_tag(shape: tuple) -> str:
    """In-repo AOT artifact name for the device-side circulant-table build
    (ops/correlate.py:build_circulant_table_device) at one replica-table
    shape. Keyed only on the shape: the program is a pure gather whose
    lowering depends on nothing else."""
    import hashlib

    key = repr(("circulant", tuple(int(s) for s in shape)))
    return "circulant_" + hashlib.md5(key.encode()).hexdigest()[:16]
from gypsum_tpu.ops.correlate import (
    noncoherent_acquisition_sweep,
    peak_strength,
    replica_fft_conj_table,
)
from gypsum_tpu.signal.prn import ALL_PRN_IDS, replica_table


@dataclass(frozen=True)
class AcquisitionResult:
    """One satellite's acquisition estimate
    (reference: gypsum/acquisition.py:35-41)."""

    prn: int
    doppler_hz: float
    code_phase_samples: int
    carrier_phase_rad: float
    strength: float

    @property
    def detected(self) -> bool:  # convenience for callers holding a config
        return self.strength > AcquisitionConfig().detection_threshold


class AcquisitionEngine:
    """Searches a whole PRN family (default: the 32 GPS SVs; any registered
    C/A-family set, e.g. GPS+SBAS, via ``prns``) in one jitted dispatch.

    Precomputes the replica FFT constants once (the reference recomputes the
    replica FFT inside every correlation call, gypsum/utils.py:66) and traces
    a single program whose only input is the 10 ms sample block.
    """

    def __init__(
        self,
        sample_rate: float,
        samples_per_prn: int,
        config: AcquisitionConfig | None = None,
        prns: tuple[int, ...] = ALL_PRN_IDS,
        center_offsets_hz: "tuple[float, ...] | None" = None,
    ) -> None:
        """``center_offsets_hz``: per-row FDMA sub-band centers (aligned with
        ``prns``) for frequency-division families — GLONASS channels search
        +/-doppler_max around k * 562.5 kHz instead of around 0. Requires all
        rows to share ONE code (true of GLONASS); the whole [channel x
        Doppler] grid then flattens into a single-code sweep over a
        concatenated Doppler list, reusing the CDMA kernels unchanged.
        Reported ``doppler_hz`` stays the ABSOLUTE baseband frequency
        (offset + Doppler); callers subtract the channel center when seeding
        a tracker's offset-relative Doppler."""
        self.config = config or AcquisitionConfig()
        self.sample_rate = float(sample_rate)
        self.samples_per_prn = int(samples_per_prn)
        self.prns = tuple(prns)
        self._center_offsets = None
        if center_offsets_hz is not None:
            if len(center_offsets_hz) != len(self.prns):
                raise ValueError("center_offsets_hz must align with prns")
            self._center_offsets = np.asarray(center_offsets_hz, dtype=np.float32)

        cfg = self.config
        # All closure constants stay as NUMPY arrays: the lowering embeds them
        # directly, whereas a captured device array forces a device->host copy
        # at trace time (which this environment's TPU backend cannot do for
        # every shape).
        reps = replica_table(self.samples_per_prn, self.prns)  # [S, L] float32 +/-1
        if self._center_offsets is not None and not all(
            np.array_equal(reps[0], reps[i]) for i in range(len(self.prns))
        ):
            raise ValueError(
                "center_offsets_hz requires all rows to share one code "
                "(an FDMA family); these PRNs have distinct codes"
            )
        # FDMA: one shared code row drives the flattened sweep.
        sweep_reps = reps[:1] if self._center_offsets is not None else reps
        # Stored as float32 I/Q planes: a complex64 closure constant would be
        # materialized through the complex transfer path this environment's
        # TPU backend lacks (see core/planes.py).
        self._prn_fft_planes = to_planes(replica_fft_conj_table(sweep_reps))
        if cfg.correlator not in (None, "matmul", "fft"):
            raise ValueError(
                f"AcquisitionConfig.correlator must be 'matmul', 'fft' or None, "
                f"got {cfg.correlator!r}"
            )
        self._correlator = cfg.correlator or (
            "matmul" if jax.default_backend() == "tpu" else "fft"
        )
        self._circulant = None
        if self._correlator == "matmul":
            from gypsum_tpu.ops.correlate import build_circulant_table_device

            # Device-resident bf16 circulant tables, passed as an ARGUMENT to
            # the jitted program (a closure constant this large would bloat
            # the lowered HLO). Built ON DEVICE from the 256 KB replica rows:
            # uploading the prebuilt 256 MB table cost ~3 s on this
            # environment's tunnel and was the whole post-cache cold start.
            # The build program itself is an 8.4 s cold XLA compile (measured
            # r05) — covered by the shipped persistent-cache seed
            # (tools/build_cache_seed.py). The artifact probe below stays for
            # operators who build a serialized executable for their geometry
            # (tools/build_aot.py built one in r05 before the tunnel stall
            # study demoted serialized executables to opt-in; none ships).
            build = None
            if jax.default_backend() == "tpu":
                from gypsum_tpu.core.aot import load_compiled

                build = load_compiled(circulant_aot_tag(sweep_reps.shape))
            if build is None:
                build = jax.jit(build_circulant_table_device)
            self._circulant = build(jnp.asarray(sweep_reps))
        self._replica_tiled = np.concatenate([reps, reps], axis=1)  # [32, 2L]
        self._coarse_dopplers = np.arange(
            -cfg.doppler_max_hz, cfg.doppler_max_hz + 1e-6, cfg.coarse_step_hz
        ).astype(np.float32)
        self._fine_offsets = np.arange(
            -cfg.fine_span_hz, cfg.fine_span_hz + 1e-6, cfg.fine_step_hz
        ).astype(np.float32)
        self._acquire_jit = jax.jit(self._acquire_all)
        # In-repo AOT executable (core/aot.py): loaded lazily per samples
        # geometry on first dispatch; None means "tried and unavailable".
        self._aot_cache: dict[int, object] = {}
        self._aot_preload: dict[int, object] = {}  # n_ms -> Thread in flight
        if jax.default_backend() == "tpu":
            # Deserializing the shipped executable costs ~0.7 s; start it on
            # a background thread NOW so it overlaps the caller's sample IO
            # and the first _dispatch finds it ready (<1 s cold target).
            self.preload_aot(cfg.integration_period_ms)

    # ------------------------------------------------------------------ AOT

    def _aot_tag(self, n_ms: int) -> str:
        """Artifact name keyed on everything that shapes the program."""
        import hashlib

        cfg = self.config
        key = repr((
            "acquire", self.sample_rate, self.samples_per_prn, self.prns,
            tuple(self._center_offsets) if self._center_offsets is not None else None,
            n_ms, cfg.doppler_max_hz, cfg.coarse_step_hz, cfg.fine_span_hz,
            cfg.fine_step_hz, cfg.phase_slope_refinement, self._correlator,
            cfg.use_pallas_peak_reduce,
        ))
        return "acquire_" + hashlib.md5(key.encode()).hexdigest()[:16]

    def preload_aot(self, n_ms: int) -> None:
        """Start deserializing the shipped AOT executable for ``n_ms`` on a
        daemon thread; ``_dispatch`` joins it before its first lookup."""
        import threading

        n_ms = int(n_ms)
        if n_ms in self._aot_cache or n_ms in self._aot_preload:
            return

        def _load() -> None:
            from gypsum_tpu.core.aot import load_compiled

            self._aot_cache[n_ms] = load_compiled(self._aot_tag(n_ms))

        t = threading.Thread(target=_load, daemon=True, name=f"aot-preload-{n_ms}")
        t.start()
        self._aot_preload[n_ms] = t

    def _dispatch(self, planes: jax.Array):
        """Run the sweep via the shipped AOT executable when one matches
        (saves the ~2.3 s cold XLA/Mosaic compile on a recycled machine —
        BASELINE's <1 s cold-start target), else the jitted program."""
        n_ms = int(planes.shape[0])
        t = self._aot_preload.pop(n_ms, None)
        if t is not None:
            t.join()
        fn = self._aot_cache.get(n_ms, _UNSET)
        if fn is _UNSET:
            fn = None
            if jax.default_backend() == "tpu":
                from gypsum_tpu.core.aot import load_compiled

                fn = load_compiled(self._aot_tag(n_ms))
            self._aot_cache[n_ms] = fn
        if fn is not None:
            try:
                return fn(planes, self._circulant)
            except Exception:  # stale artifact: recompile via jit
                self._aot_cache[n_ms] = None
        return self._acquire_jit(planes, self._circulant)

    def export_aot(self, n_ms: int | None = None) -> "str":
        """Compile the standard-geometry sweep and serialize it in-repo
        (tools/build_aot.py); returns the artifact path."""
        from gypsum_tpu.core.aot import save_compiled
        from gypsum_tpu.core.planes import to_planes as _tp

        m = int(n_ms or self.config.integration_period_ms)
        x = jnp.asarray(
            _tp(np.zeros((m, self.samples_per_prn), np.complex64))
        )
        compiled = self._acquire_jit.lower(x, self._circulant).compile()
        return str(save_compiled(self._aot_tag(m), compiled))

    # ---------------------------------------------------------------- device

    def _acquire_all(self, samples_planes: jax.Array, circulant: jax.Array | None = None):
        """samples_planes: [M, L, 2] float32 I/Q planes -> per-sat (doppler,
        code phase, carrier phase, strength), all [S] (packed rank-2)."""
        fs = self.sample_rate
        length = self.samples_per_prn
        samples_ms = to_complex(samples_planes)  # [M, L] c64, on device
        m_count = samples_ms.shape[0]
        coarse_dopplers = jnp.asarray(self._coarse_dopplers)
        fine_offsets = jnp.asarray(self._fine_offsets)

        # ---- Stage 1: coarse non-coherent sweep over the full grid —
        # circulant MXU matmuls on TPU, FFT elsewhere (config.correlator).
        # FDMA families flatten [channel x Doppler] into one single-code
        # sweep over the concatenated per-channel grids (see __init__).
        if self._center_offsets is not None:
            sweep_dopplers = jnp.asarray(
                (self._center_offsets[:, None] + self._coarse_dopplers[None, :])
                .reshape(-1)
                .astype(np.float32)
            )
        else:
            sweep_dopplers = coarse_dopplers
        if circulant is not None:
            from gypsum_tpu.ops.correlate import noncoherent_acquisition_sweep_matmul

            noncoh = noncoherent_acquisition_sweep_matmul(
                samples_ms, sweep_dopplers, circulant, fs
            )  # [S, D, L] (FDMA: [1, K*D, L])
        else:
            prn_fft_conj = to_complex(jnp.asarray(self._prn_fft_planes))  # [S, L]
            noncoh = noncoherent_acquisition_sweep(
                samples_ms, sweep_dopplers, prn_fft_conj, fs
            )  # [S, D, L] (FDMA: [1, K*D, L])
        if self._center_offsets is not None:
            noncoh = noncoh.reshape(
                len(self.prns), len(self._coarse_dopplers), length
            )
        s_count, d_count, _ = noncoh.shape
        use_pallas = self.config.use_pallas_peak_reduce
        if use_pallas is None:
            use_pallas = False  # measured: XLA reduce is faster (config.py)
        if use_pallas:
            # One streaming pass over the grid: per-(sat, Doppler) row
            # (max, argmax, sum), then a tiny [S, D] reduce picks the best
            # Doppler. Same tie-breaking as the flat argmax (lowest Doppler
            # bin, then lowest code phase).
            from gypsum_tpu.ops.pallas_kernels import peak_reduce_pallas

            mx, arg, sm = peak_reduce_pallas(noncoh.reshape(s_count * d_count, length))
            mx = mx.reshape(s_count, d_count)
            best_d_idx = jnp.argmax(mx, axis=-1)  # [S]
            rows = jnp.arange(s_count) * d_count + best_d_idx
            code_phase = arg[rows].astype(jnp.int32)  # [S]
            peak = mx[jnp.arange(s_count), best_d_idx]
            mean_rest = (sm[rows] - peak) / (length - 1)
            strength = peak / mean_rest
        else:
            flat_idx = jnp.argmax(noncoh.reshape(s_count, -1), axis=-1)  # [S]
            best_d_idx = flat_idx // length
            code_phase = (flat_idx % length).astype(jnp.int32)  # [S]
            best_profiles = jnp.take_along_axis(
                noncoh, best_d_idx[:, None, None], axis=1
            )[:, 0, :]  # [S, L]
            strength = peak_strength(best_profiles)  # [S]
        coarse_doppler = coarse_dopplers[best_d_idx]  # [S]
        if self._center_offsets is not None:
            # Back to absolute baseband frequency per channel.
            coarse_doppler = coarse_doppler + jnp.asarray(self._center_offsets)

        # ---- Stage 2: coherent fine grid at the detected code phase.
        # Prompt replica for each satellite: roll(r, cp)[l] = tiled[(L-cp)+l].
        starts = jnp.mod(length - code_phase, length)
        rolled = jax.vmap(
            lambda tiled, s: jax.lax.dynamic_slice(tiled, (s,), (length,))
        )(jnp.asarray(self._replica_tiled), starts)  # [S, L] float32

        l_over_fs = jnp.arange(length, dtype=jnp.float32) / fs  # [L]
        t_ms = jnp.arange(m_count, dtype=jnp.float32) * (length / fs)  # [M]

        def phasor(freq_x_time):
            return jax.lax.complex(jnp.cos(-2 * jnp.pi * freq_x_time), jnp.sin(-2 * jnp.pi * freq_x_time))

        # Separable wipeoff: coarse per-sat terms x shared fine-offset basis.
        sat_intra = phasor(coarse_doppler[:, None] * l_over_fs[None, :])  # [S, L]
        sat_chunk = phasor(_mod_cycles(coarse_doppler[:, None] * t_ms[None, :]))  # [S, M]
        fine_intra = phasor(fine_offsets[:, None] * l_over_fs[None, :])  # [F, L]
        fine_chunk = phasor(_mod_cycles(fine_offsets[:, None] * t_ms[None, :]))  # [F, M]

        def per_ms(_, y):
            # y: [L] one millisecond of samples.
            z = (y[None, :] * rolled) * sat_intra  # [S, L]
            return None, z @ fine_intra.T  # [S, F]

        _, p_scan = jax.lax.scan(per_ms, None, samples_ms)  # [M, S, F]
        prompts = (
            jnp.moveaxis(p_scan, 0, 2)  # [S, F, M]
            * sat_chunk[:, None, :]
            * fine_chunk[None, :, :]
        )

        coherent_power = jnp.abs(prompts.sum(axis=-1))  # [S, F]
        best_f_idx = jnp.argmax(coherent_power, axis=-1)  # [S]
        fine_doppler = coarse_doppler + fine_offsets[best_f_idx]

        p_star = jnp.take_along_axis(prompts, best_f_idx[:, None, None], axis=1)[:, 0, :]  # [S, M]

        # ---- Stage 3: phase-slope residual (BPSK-safe via squaring).
        if self.config.phase_slope_refinement:
            q = p_star[:, 1:] * jnp.conj(p_star[:, :-1])  # [S, M-1]
            r = jnp.sum(q * q, axis=-1)
            t_chunk = length / fs
            residual = jnp.angle(r) / (2.0 * 2.0 * jnp.pi * t_chunk)
            doppler = fine_doppler + residual
        else:
            doppler = fine_doppler

        # Carrier phase estimate: angle of the coherent prompt sum (analogue of
        # the reference's angle(coherent_profile[peak]),
        # gypsum/acquisition.py:136). The PLL refines it immediately.
        carrier_phase = jnp.angle(p_star.sum(axis=-1))

        # Pack the four per-satellite vectors into one rank-2 float32 result:
        # this environment's TPU backend cannot transfer rank-1 arrays back to
        # the host (code phase fits float32 exactly: < 2^24).
        return jnp.stack(
            [doppler, code_phase.astype(jnp.float32), carrier_phase, strength]
        )

    # ------------------------------------------------------------------ host

    def acquire_all(self, samples_ms: np.ndarray) -> list[AcquisitionResult]:
        """Run the full-constellation search on [M, L] (or flat [M*L]) IQ.

        Returns results for the engine's whole PRN family, strongest first;
        callers filter by
        ``config.detection_threshold`` and their eligibility set (the reference
        filters inside the detector, gypsum/acquisition.py:52-68)."""
        samples = np.asarray(samples_ms)
        if samples.ndim == 1:
            samples = samples.reshape(-1, self.samples_per_prn)
        if samples.shape != (self.config.integration_period_ms, self.samples_per_prn):
            raise ValueError(
                f"expected [{self.config.integration_period_ms}, {self.samples_per_prn}] "
                f"samples, got {samples.shape}"
            )
        packed = jax.device_get(self._dispatch(jnp.asarray(to_planes(samples))))
        doppler, code_phase, carrier_phase, strength = packed
        results = [
            AcquisitionResult(
                prn=self.prns[i],
                doppler_hz=float(doppler[i]),
                code_phase_samples=int(code_phase[i]),
                carrier_phase_rad=float(carrier_phase[i]),
                strength=float(strength[i]),
            )
            for i in range(len(self.prns))
        ]
        results.sort(key=lambda r: -r.strength)
        return results

    def detect(
        self, samples_ms: np.ndarray, eligible_prns: set[int] | None = None
    ) -> list[AcquisitionResult]:
        """Detected satellites only (strength above threshold), optionally
        restricted to an eligibility set."""
        hits = [
            r
            for r in self.acquire_all(samples_ms)
            if r.strength > self.config.detection_threshold
            and (eligible_prns is None or r.prn in eligible_prns)
        ]
        return hits


def _mod_cycles(cycles: jax.Array) -> jax.Array:
    """Reduce a phase expressed in cycles to [-0.5, 0.5] to keep f32 exact."""
    return cycles - jnp.round(cycles)


# AcquisitionEngine is stateless across detect() calls, so instances are
# shared process-wide: constructing one re-traces the 32-PRN search program
# AND rebuilds the device-resident circulant table — hundreds of ms per
# Receiver even on a warm compile cache. One engine per distinct
# (rate, L, config, backend) serves every Receiver in the process.
_ENGINE_CACHE: dict = {}


def shared_acquisition_engine(
    sample_rate: float,
    samples_per_prn: int,
    config: "AcquisitionConfig | None" = None,
    prns: tuple[int, ...] = ALL_PRN_IDS,
    center_offsets_hz: "tuple[float, ...] | None" = None,
) -> AcquisitionEngine:
    prns = tuple(prns)
    offsets = None if center_offsets_hz is None else tuple(center_offsets_hz)
    key = (
        float(sample_rate),
        int(samples_per_prn),
        config,
        prns,
        offsets,
        jax.default_backend(),  # correlator selection is backend-dependent
    )
    try:
        eng = _ENGINE_CACHE.get(key)
    except TypeError:  # unhashable config — build uncached
        return AcquisitionEngine(sample_rate, samples_per_prn, config, prns, offsets)
    if eng is None:
        eng = _ENGINE_CACHE[key] = AcquisitionEngine(
            sample_rate, samples_per_prn, config, prns, offsets
        )
    return eng
