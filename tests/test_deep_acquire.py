"""Deep (high-sensitivity) acquisition: acquire/deep.py.

Calibrated against the 10 ms engine on the same synthetic captures: the
deep engine digs ~7-10 dB below the standard engine's floor (the reference
has nothing beyond 10 ms non-coherent integration, gypsum/config.py:4)."""

from __future__ import annotations

import numpy as np

from gypsum_tpu.acquire.deep import DeepAcquisitionEngine
from gypsum_tpu.acquire.engine import AcquisitionEngine
from gypsum_tpu.core.config import AcquisitionConfig, DeepAcquisitionConfig
from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq

FS, L = 2.046e6, 2046


def _capture(sats, n_ms, seed=5, noise=0.3):
    iq = synthesize_iq(sats, n_samples=n_ms * L, sample_rate=FS,
                       noise_sigma=noise, seed=seed)
    return iq.reshape(n_ms, L)


def test_deep_finds_signal_below_the_standard_floor():
    """At amplitude 0.012 (~ -25 dB below the noise) the 10 ms engine is
    blind (strength ~2.0, below the 3.0 threshold) while the 400 ms deep
    search still nails code phase and Doppler. Measured margins: std 2.01,
    deep 5.45."""
    sats = [SyntheticSatellite(prn=7, doppler_hz=1743.0, delay_samples=512,
                               amplitude=0.012)]
    samples = _capture(sats, 400)

    std = AcquisitionEngine(FS, L, AcquisitionConfig(correlator="fft"),
                            prns=(7, 3))
    std_hit = {r.prn: r for r in std.acquire_all(samples[:10])}[7]
    assert std_hit.strength < 3.0  # the reference-envelope engine fails

    deep = DeepAcquisitionEngine(
        FS, L, DeepAcquisitionConfig(total_ms=400, doppler_span_hz=4000.0),
        prns=(7, 3))
    hits = {r.prn: r for r in deep.acquire_all(samples)}
    hit = hits[7]
    assert hit.strength > 4.0 and hit.strength > deep.detection_threshold
    assert hit.code_phase_samples == 512
    assert abs(hit.doppler_hz - 1743.0) < 5.0  # phase-slope refined
    # Absent-satellite control: below the adaptive threshold (1 + k/sqrt(G)
    # — the noise max/mean ratio shrinks with non-coherent averaging).
    assert hits[3].strength < deep.detection_threshold
    assert deep.detect(samples) == [hit]


def test_code_doppler_compensation_sharpens_the_peak():
    """At 6.8 kHz Doppler the code drifts ~3.6 samples over 400 ms; without
    per-group realignment the accumulated peak smears. Measured: 12.9 vs
    8.4 strength, and the uncompensated argmax lands off the true phase."""
    sats = [SyntheticSatellite(prn=7, doppler_hz=6800.0, delay_samples=900,
                               amplitude=0.03)]
    samples = _capture(sats, 400, seed=6)

    def run(comp: bool):
        eng = DeepAcquisitionEngine(
            FS, L,
            DeepAcquisitionConfig(total_ms=400, doppler_center_hz=6800.0,
                                  doppler_span_hz=500.0,
                                  compensate_code_doppler=comp),
            prns=(7,))
        return eng.acquire_all(samples)[0]

    on, off = run(True), run(False)
    assert on.code_phase_samples == 900
    assert on.strength > 1.25 * off.strength
    assert abs(on.doppler_hz - 6800.0) < 5.0


def test_deep_agrees_with_standard_on_strong_signals():
    sats = [
        SyntheticSatellite(prn=7, doppler_hz=1743.0, delay_samples=512,
                           amplitude=0.22),
        SyntheticSatellite(prn=19, doppler_hz=-3211.0, delay_samples=1777,
                           amplitude=0.22),
    ]
    samples = _capture(sats, 100)
    std = AcquisitionEngine(FS, L, AcquisitionConfig(correlator="fft"),
                            prns=(7, 19))
    deep = DeepAcquisitionEngine(
        FS, L, DeepAcquisitionConfig(total_ms=100, doppler_span_hz=4000.0),
        prns=(7, 19))
    std_hits = {r.prn: r for r in std.acquire_all(samples[:10])}
    deep_hits = {r.prn: r for r in deep.acquire_all(samples)}
    for prn in (7, 19):
        assert deep_hits[prn].code_phase_samples == std_hits[prn].code_phase_samples
        assert abs(deep_hits[prn].doppler_hz - std_hits[prn].doppler_hz) < 5.0
        assert deep_hits[prn].strength > std_hits[prn].strength  # more integration


def test_total_ms_must_divide_into_groups():
    import pytest

    with pytest.raises(ValueError):
        DeepAcquisitionEngine(
            FS, L, DeepAcquisitionConfig(coherent_ms=10, total_ms=205),
            prns=(7,))


def test_deep_acquire_glonass_fdma():
    """GLONASS weak-signal deep search (acquire/deep.py:
    deep_acquire_glonass): at an amplitude where the standard FDMA engine
    is blind, the per-channel f64 pre-rotation + single-code deep sweep
    still nails each planted channel's code phase and absolute baseband
    frequency; a vacant sub-band stays below the adaptive threshold."""
    import dataclasses

    from gypsum_tpu.acquire.deep import deep_acquire_glonass
    from gypsum_tpu.core.constants import (
        GLONASS_L1_CHANNEL_SPACING_HZ as SPACING,
    )
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.prn import glonass_frequency_number
    from gypsum_tpu.signal.scenarios import (
        DEMO_GLONASS_SAMPLE_RATE as GLO_FS,
        demo_glonass_constellation,
        demo_receiver_ecef,
    )

    glo_l = 4092
    sats = [
        dataclasses.replace(s, amplitude=0.011)
        for s in demo_glonass_constellation([-4, 2])
    ]
    iq, truth = synthesize_constellation(
        sats, demo_receiver_ecef(), 21618.0, 0.42, GLO_FS, noise_sigma=0.3,
        seed=11,
    )
    planted = [s.prn for s in sats]  # 204 (k=-4), 210 (k=+2)
    probe = tuple(planted) + (208,)  # + vacant k=0 control

    std = AcquisitionEngine(
        GLO_FS, glo_l, AcquisitionConfig(correlator="fft"), prns=probe,
        center_offsets_hz=tuple(
            glonass_frequency_number(p) * SPACING for p in probe
        ),
    )
    std_hits = {r.prn: r for r in std.acquire_all(iq[: 10 * glo_l].reshape(10, glo_l))}
    assert all(std_hits[p].strength < 3.0 for p in planted), (
        "amplitude not below the standard floor: "
        f"{[(p, std_hits[p].strength) for p in planted]}"
    )

    cfg = DeepAcquisitionConfig(total_ms=400, doppler_span_hz=4000.0)
    hits = {
        r.prn: r
        for r in deep_acquire_glonass(iq, GLO_FS, glo_l, cfg, prns=probe)
    }
    threshold = 1.0 + cfg.detection_k / np.sqrt(400 // cfg.coherent_ms)
    for p in planted:
        h = hits[p]
        assert h.strength > threshold, f"id {p}: {h.strength:.2f}"
        assert abs(h.code_phase_samples - truth.code_phase_samples[p]) <= 1
        # Doppler contract at this depth: the winning 50 Hz bin can sit one
        # step off under noise and the squared-slope refinement is only
        # unambiguous to +/-25 Hz — the deep hit's payoff is the CODE
        # PHASE (module docstring); the tracker/snapshot consumers pull in
        # a <100 Hz error without help.
        assert abs(h.doppler_hz - truth.doppler_hz[p]) < 80.0, (
            f"id {p}: {h.doppler_hz:.1f} vs truth {truth.doppler_hz[p]:.1f}"
        )
    assert hits[208].strength < threshold
