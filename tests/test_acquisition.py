"""Acquisition engine tests on synthetic signals with known ground truth."""

import numpy as np
import pytest

from gypsum_tpu.acquire.engine import AcquisitionEngine
from gypsum_tpu.core.config import AcquisitionConfig
from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq

FS = 2.046e6
L = 2046
M = 10


@pytest.fixture(scope="module")
def engine():
    return AcquisitionEngine(sample_rate=FS, samples_per_prn=L)


def _capture(sats, noise=0.5, seed=1):
    return synthesize_iq(sats, M * L, FS, noise_sigma=noise, seed=seed).reshape(M, L)


def test_single_satellite_parameters_recovered(engine):
    truth = SyntheticSatellite(prn=25, doppler_hz=1234.0, delay_samples=701, amplitude=0.25)
    results = engine.detect(_capture([truth]))
    assert [r.prn for r in results] == [25]
    r = results[0]
    assert abs(r.doppler_hz - truth.doppler_hz) < 10.0
    assert r.code_phase_samples == 701
    assert r.strength > 3.0


def test_phase_slope_refinement_beats_grid(engine):
    # An off-grid Doppler: the fine grid is 25 Hz, the refinement should land
    # within a few Hz.
    truth = SyntheticSatellite(prn=4, doppler_hz=-3456.7, delay_samples=123, amplitude=0.3)
    r = engine.detect(_capture([truth], noise=0.3))[0]
    assert r.prn == 4
    assert abs(r.doppler_hz - truth.doppler_hz) < 5.0


def test_multi_satellite_acquisition(engine):
    sats = [
        SyntheticSatellite(prn=25, doppler_hz=2500.0, delay_samples=100, amplitude=0.22),
        SyntheticSatellite(prn=28, doppler_hz=-4000.0, delay_samples=1500, amplitude=0.22,
                           carrier_phase_rad=1.0),
        SyntheticSatellite(prn=31, doppler_hz=300.0, delay_samples=2000, amplitude=0.22,
                           carrier_phase_rad=-2.0),
        SyntheticSatellite(prn=32, doppler_hz=6800.0, delay_samples=47, amplitude=0.22),
    ]
    results = engine.detect(_capture(sats, noise=0.4))
    found = {r.prn: r for r in results}
    assert set(found) == {25, 28, 31, 32}
    for truth in sats:
        r = found[truth.prn]
        assert abs(r.doppler_hz - truth.doppler_hz) < 10.0
        assert abs(r.code_phase_samples - truth.delay_samples % L) <= 1


def test_absent_satellites_rejected(engine):
    sats = [SyntheticSatellite(prn=10, doppler_hz=1000.0, delay_samples=500, amplitude=0.25)]
    results = engine.detect(_capture(sats, noise=0.5))
    assert {r.prn for r in results} == {10}


def test_noise_only_detects_nothing(engine):
    noise = (0.7 * (np.random.default_rng(7).standard_normal((M, L))
                    + 1j * np.random.default_rng(8).standard_normal((M, L)))).astype(np.complex64)
    assert engine.detect(noise) == []


def test_eligibility_filter(engine):
    sats = [
        SyntheticSatellite(prn=25, doppler_hz=2500.0, delay_samples=100, amplitude=0.25),
        SyntheticSatellite(prn=28, doppler_hz=-1000.0, delay_samples=900, amplitude=0.25),
    ]
    results = engine.detect(_capture(sats), eligible_prns={28})
    assert [r.prn for r in results] == [28]


def test_weak_signal_detected_at_threshold(engine):
    # ~3x weaker than the comfortable cases: still above the 3.0 threshold with
    # 10 ms of integration.
    truth = SyntheticSatellite(prn=17, doppler_hz=-2222.0, delay_samples=1024, amplitude=0.08)
    results = engine.detect(_capture([truth], noise=0.5, seed=3))
    assert any(r.prn == 17 for r in results)


def test_config_grid_shapes():
    cfg = AcquisitionConfig(doppler_max_hz=1000.0, coarse_step_hz=250.0, fine_span_hz=100.0)
    eng = AcquisitionEngine(FS, L, cfg)
    assert eng._coarse_dopplers.shape[0] == 9
    truth = SyntheticSatellite(prn=2, doppler_hz=432.0, delay_samples=10, amplitude=0.3)
    r = eng.detect(_capture([truth]))[0]
    assert r.prn == 2 and abs(r.doppler_hz - 432.0) < 10.0


def test_pallas_peak_reduce_path_matches_xla_path(rng):
    """Stage-1 peak search via the Pallas kernel must agree with the XLA
    argmax/gather path (interpret mode on CPU, compiled on TPU)."""
    import dataclasses

    from gypsum_tpu.acquire.engine import AcquisitionEngine
    from gypsum_tpu.core.config import AcquisitionConfig
    from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq

    fs, L = 2.046e6, 2046
    iq = synthesize_iq(
        [SyntheticSatellite(prn=17, doppler_hz=1500.0, delay_samples=321, amplitude=0.3),
         SyntheticSatellite(prn=4, doppler_hz=-2400.0, delay_samples=1999, amplitude=0.25)],
        10 * L, fs, noise_sigma=0.3, seed=11,
    ).reshape(10, L)

    base = AcquisitionConfig()
    eng_xla = AcquisitionEngine(fs, L, dataclasses.replace(base, use_pallas_peak_reduce=False))
    eng_pl = AcquisitionEngine(fs, L, dataclasses.replace(base, use_pallas_peak_reduce=True))
    a = {r.prn: r for r in eng_xla.acquire_all(iq)}
    b = {r.prn: r for r in eng_pl.acquire_all(iq)}
    for prn in range(1, 33):
        assert a[prn].code_phase_samples == b[prn].code_phase_samples, prn
        assert abs(a[prn].doppler_hz - b[prn].doppler_hz) < 1e-3, prn
        assert abs(a[prn].strength - b[prn].strength) < 1e-3 * max(1.0, a[prn].strength), prn
    assert b[17].detected and b[4].detected


def test_weak_signal_longer_integration(rng):
    """Longer non-coherent integration buys detection *margin*: the
    peak/mean-of-rest strength of noise-only PRNs shrinks toward 1 as more
    milliseconds average, so the gap between a weak true satellite and the
    strongest absent PRN widens (the reference's integration length is a
    constant, gypsum/config.py:4; here it is a config knob)."""
    import dataclasses

    from gypsum_tpu.acquire.engine import AcquisitionEngine
    from gypsum_tpu.core.config import AcquisitionConfig
    from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq

    fs, L = 2.046e6, 2046
    sat = SyntheticSatellite(prn=14, doppler_hz=2200.0, delay_samples=1234, amplitude=0.045)
    iq = synthesize_iq([sat], 30 * L, fs, noise_sigma=0.5, seed=77).reshape(30, L)

    def margin(results):
        by = {r.prn: r for r in results}
        others = max(r.strength for r in results if r.prn != 14)
        return by[14], by[14].strength - others

    short = AcquisitionEngine(fs, L, AcquisitionConfig())
    hit10, margin10 = margin(short.acquire_all(iq[:10]))

    long_cfg = dataclasses.replace(AcquisitionConfig(), integration_period_ms=30)
    long_eng = AcquisitionEngine(fs, L, long_cfg)
    hit30, margin30 = margin(long_eng.acquire_all(iq))

    assert margin30 > margin10, (margin10, margin30)
    assert hit30.detected
    assert hit30.code_phase_samples == 1234
    assert abs(hit30.doppler_hz - 2200.0) < 15.0


def test_matmul_correlator_matches_fft_path(rng):
    """The circulant-matmul coarse sweep (TPU default) must find the same
    peaks as the FFT path (CPU check at reduced grid size; identical
    end-to-end behavior is covered by the engine parity below)."""
    import dataclasses

    from gypsum_tpu.acquire.engine import AcquisitionEngine
    from gypsum_tpu.core.config import AcquisitionConfig
    from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq

    fs, L = 2.046e6, 2046
    iq = synthesize_iq(
        [SyntheticSatellite(prn=17, doppler_hz=1500.0, delay_samples=321, amplitude=0.35)],
        4 * L, fs, noise_sigma=0.25, seed=12,
    ).reshape(4, L)
    base = AcquisitionConfig(integration_period_ms=4, doppler_max_hz=2500.0)
    eng_fft = AcquisitionEngine(fs, L, dataclasses.replace(base, correlator="fft"))
    eng_mat = AcquisitionEngine(fs, L, dataclasses.replace(base, correlator="matmul"))
    a = {r.prn: r for r in eng_fft.acquire_all(iq)}
    b = {r.prn: r for r in eng_mat.acquire_all(iq)}
    assert b[17].detected
    assert b[17].code_phase_samples == a[17].code_phase_samples == 321
    assert abs(b[17].doppler_hz - a[17].doppler_hz) < 2.0
    for prn in range(1, 33):
        assert abs(a[prn].strength - b[prn].strength) < 0.05 * max(1.0, a[prn].strength), prn


def test_acquisition_randomized_scenarios(rng):
    """Fuzz the acquisition envelope: random Doppler across the full +/-7 kHz
    span (including the grid edges), random code phase including the 0/L
    wrap, random SNR down to threshold — detection, code phase and Doppler
    must hold everywhere."""
    from gypsum_tpu.acquire.engine import AcquisitionEngine
    from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq

    fs, L = 2.046e6, 2046
    eng = AcquisitionEngine(fs, L)
    cases = [
        # (prn, doppler, delay, amplitude)
        (1, -6990.0, 0, 0.25),       # Doppler at the grid edge, zero delay
        (32, 6990.0, L - 1, 0.25),   # other edge, delay at the wrap
        (9, 0.0, 1023, 0.3),         # zero Doppler
        (17, -249.0, 7, 0.3),        # half-bin Doppler offset
    ]
    for prn, dopp, delay, amp in cases:
        iq = synthesize_iq(
            [SyntheticSatellite(prn=prn, doppler_hz=dopp, delay_samples=delay, amplitude=amp)],
            10 * L, fs, noise_sigma=0.3, seed=prn,
        ).reshape(10, L)
        hits = eng.detect(iq)
        assert hits and hits[0].prn == prn, (prn, dopp, delay)
        assert abs(hits[0].doppler_hz - dopp) < 10.0, (prn, hits[0].doppler_hz, dopp)
        cp_err = abs(hits[0].code_phase_samples - delay)
        assert min(cp_err, L - cp_err) <= 1, (prn, hits[0].code_phase_samples, delay)
    for trial in range(4):
        prn = int(rng.integers(1, 33))
        dopp = float(rng.uniform(-7000, 7000))
        delay = int(rng.integers(0, L))
        iq = synthesize_iq(
            [SyntheticSatellite(prn=prn, doppler_hz=dopp, delay_samples=delay, amplitude=0.28)],
            10 * L, fs, noise_sigma=0.35, seed=100 + trial,
        ).reshape(10, L)
        hits = eng.detect(iq)
        assert hits and hits[0].prn == prn, (trial, prn, dopp, delay)
        assert abs(hits[0].doppler_hz - dopp) < 10.0
        cp_err = abs(hits[0].code_phase_samples - delay)
        assert min(cp_err, L - cp_err) <= 1


def test_mixed_gps_sbas_family_acquisition():
    # An engine built over GPS+SBAS PRNs acquires an SBAS GEO signal (PRN
    # 120-138 Gold codes, DO-229 Table A-1) exactly like a GPS SV. GEO
    # Doppler is near zero; delay picked off-grid.
    from gypsum_tpu.signal.prn import ALL_PRN_IDS

    family = tuple(sorted(set(ALL_PRN_IDS) | {120, 133}))
    eng = AcquisitionEngine(sample_rate=FS, samples_per_prn=L, prns=family)
    sats = [
        SyntheticSatellite(prn=25, doppler_hz=2500.0, delay_samples=100, amplitude=0.22),
        SyntheticSatellite(prn=120, doppler_hz=-40.0, delay_samples=777, amplitude=0.22),
        SyntheticSatellite(prn=133, doppler_hz=15.0, delay_samples=1800, amplitude=0.22),
    ]
    results = eng.detect(_capture(sats, noise=0.4))
    found = {r.prn: r for r in results}
    assert set(found) == {25, 120, 133}
    for truth in sats:
        r = found[truth.prn]
        assert abs(r.doppler_hz - truth.doppler_hz) < 10.0
        assert abs(r.code_phase_samples - truth.delay_samples % L) <= 1
