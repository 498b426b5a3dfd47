"""Tracking-loop simulation tests: the scan-based PLL/DLL must acquire and
hold lock on synthetic signals with known truth, and its pseudosymbol stream
must match the transmitted navigation bits (SURVEY.md §4 kernel tests —
scan-based loop filters validated on synthetic BPSK signals)."""

import numpy as np
import pytest

from gypsum_tpu.core.config import TrackingConfig
from gypsum_tpu.signal.synth import SyntheticSatellite, nav_bit_schedule, synthesize_iq
from gypsum_tpu.track.loop import TrackerBank

FS = 2.046e6
L = 2046


def _run_tracker(sat, n_ms, noise=0.3, init_doppler_err=0.0, init_phase_err=0.0,
                 init_code_err=0, block_ms=250, seed=11, n_channels=2):
    iq = synthesize_iq([sat], n_ms * L, FS, noise_sigma=noise, seed=seed)
    cfg = TrackingConfig(block_size_ms=block_ms)
    bank = TrackerBank(FS, L, cfg, n_channels=n_channels)
    bank.assign(
        prn=sat.prn,
        doppler_hz=sat.doppler_hz + init_doppler_err,
        code_phase_samples=(sat.delay_samples + init_code_err) % L,
        carrier_phase_rad=sat.carrier_phase_rad + init_phase_err,
    )
    all_obs = []
    for b in range(n_ms // block_ms):
        block = iq[b * block_ms * L : (b + 1) * block_ms * L].reshape(block_ms, L)
        obs = bank.process_block(block, block_start_time=b * block_ms * 1e-3)
        all_obs.append(obs[0])
    return bank, all_obs


def _concat(all_obs, field):
    return np.concatenate([getattr(o, field) for o in all_obs])


def test_locks_and_decodes_pseudosymbols():
    bits = np.array([1, -1, -1, 1, 1, 1, -1, 1, -1, -1], dtype=np.int8)
    sat = SyntheticSatellite(prn=25, doppler_hz=1500.0, delay_samples=700,
                             carrier_phase_rad=0.7, amplitude=0.2, nav_bits=bits)
    n_ms = 1000
    bank, obs = _run_tracker(sat, n_ms, init_doppler_err=4.0, init_phase_err=0.5)
    signs = _concat(obs, "pseudosymbol_signs")
    truth = nav_bit_schedule(bits, n_ms)
    # After pull-in (allow 300 ms), every pseudosymbol matches the transmitted
    # bit sign up to a global polarity (Costas loops have a 180-deg ambiguity).
    settled, expect = signs[300:], truth[300:]
    agreement = np.mean(settled == expect)
    assert max(agreement, 1 - agreement) > 0.995, f"agreement={agreement}"


def test_reports_doppler_and_code_phase():
    sat = SyntheticSatellite(prn=7, doppler_hz=-3210.0, delay_samples=1234, amplitude=0.25)
    bank, obs = _run_tracker(sat, 1000, init_doppler_err=-5.0)
    dop = _concat(obs, "dopplers")
    cp = _concat(obs, "code_phases")
    assert abs(np.mean(dop[-200:]) - sat.doppler_hz) < 2.0
    # Code phase tracks the *drifting* truth: code Doppler moves the arrival
    # by -fd/fL1 samples per sample, i.e. -fd/fL1 * fs per second. The
    # +/-0.5-chip early/late discriminator has a 1-sample dead zone at
    # 2 samples/chip, so the loop parks within ~1.5 samples of truth. The
    # bound also guards the early/late lag orientation: an inverted DLL
    # settles 2-3 samples off (regression: the lag window was once built in
    # descending order, swapping E and L).
    t = np.arange(len(cp)) * 1e-3
    true_cp = sat.delay_samples + (-sat.doppler_hz / 1.57542e9) * 2.046e6 * t
    err = (cp - true_cp + L / 2) % L - L / 2
    assert np.abs(err[-200:]).max() < 1.6


def test_achieves_lock_state():
    sat = SyntheticSatellite(prn=12, doppler_hz=900.0, delay_samples=40, amplitude=0.25)
    bank, obs = _run_tracker(sat, 1000)
    locked = _concat(obs, "locked")
    quality = _concat(obs, "quality")
    assert locked[-300:].all()
    assert quality[-1] > 0.7
    assert not bool(obs[-1].lost)


def test_tracks_doppler_drift():
    # ~0.8 Hz/s of Doppler drift (a realistic LEO-free GPS pass is < 1 Hz/s).
    sat = SyntheticSatellite(prn=3, doppler_hz=2000.0, delay_samples=500,
                             amplitude=0.25, doppler_rate_hz_per_s=0.8)
    bank, obs = _run_tracker(sat, 2000, block_ms=500)
    dop = _concat(obs, "dopplers")
    t_end = 2.0
    expected_end = sat.doppler_hz + sat.doppler_rate_hz_per_s * t_end
    assert abs(np.mean(dop[-100:]) - expected_end) < 3.0


def test_pseudosymbol_timestamps_are_code_phase_corrected():
    sat = SyntheticSatellite(prn=9, doppler_hz=0.0, delay_samples=1023, amplitude=0.3)
    bank, obs = _run_tracker(sat, 250, block_ms=250)
    o = obs[0]
    # start_time = block_start + ms_index * 1ms + (code_phase / L) * 1ms
    # (reference: gypsum/tracker.py:319-328).
    want = 0.0 + 100 * 1e-3 + (o.code_phases[100] / L) * 1e-3
    np.testing.assert_allclose(o.start_times[100], want, rtol=0, atol=1e-8)
    assert o.end_times[100] == pytest.approx(o.start_times[100] + 1e-3)


def test_watchdog_flags_lost_signal():
    # Signal disappears after 7 s: quality collapses, the sticky lost flag
    # must be set (analogue of reference's circularity watchdog drop,
    # gypsum/tracker.py:377-378).
    sat = SyntheticSatellite(prn=5, doppler_hz=500.0, delay_samples=100, amplitude=0.25)
    n_ms = 9000
    iq_on = synthesize_iq([sat], 7000 * L, FS, noise_sigma=0.3, seed=2)
    rng = np.random.default_rng(3)
    iq_off = (0.3 * (rng.standard_normal(2000 * L) + 1j * rng.standard_normal(2000 * L))
              / np.sqrt(2)).astype(np.complex64)
    iq = np.concatenate([iq_on, iq_off])
    cfg = TrackingConfig(block_size_ms=500)
    bank = TrackerBank(FS, L, cfg, n_channels=1)
    bank.assign(sat.prn, sat.doppler_hz, sat.delay_samples, 0.0)
    lost_flags = []
    for b in range(n_ms // 500):
        obs = bank.process_block(iq[b * 500 * L : (b + 1) * 500 * L].reshape(500, L),
                                 b * 0.5)
        lost_flags.append(obs[0].lost)
    assert not lost_flags[12]  # still fine at 6.5 s
    assert lost_flags[-1]  # flagged after signal loss


def test_channel_assignment_and_release():
    bank = TrackerBank(FS, L, TrackingConfig(block_size_ms=10), n_channels=3)
    s0 = bank.assign(25, 100.0, 10, 0.0)
    s1 = bank.assign(28, 200.0, 20, 0.0)
    assert bank.tracked_prns == [25, 28]
    bank.release(s0)
    assert bank.tracked_prns == [28]
    s2 = bank.assign(31, 300.0, 30, 0.0)
    assert s2 == s0  # freed slot is reused
    with pytest.raises(RuntimeError):
        bank.assign(1, 0.0, 0, 0.0)
        bank.assign(2, 0.0, 0, 0.0)


def test_tracks_sbas_prn_with_2ms_symbols():
    # An SBAS GEO channel (PRN 120, DO-229 Gold code, 500 sps FEC symbols =
    # 2 PRN periods per symbol) tracks through the identical PLL/DLL path
    # once the bank's replica table includes the SBAS family.
    from gypsum_tpu.signal.prn import ALL_PRN_IDS
    from gypsum_tpu.signal.synth import synthesize_iq

    rng = np.random.default_rng(3)
    symbols = (rng.integers(0, 2, size=250) * 2 - 1).astype(np.int8)
    sat = SyntheticSatellite(prn=120, doppler_hz=-35.0, delay_samples=400,
                             amplitude=0.2, nav_bits=symbols, symbol_periods=2)
    n_ms = 600
    iq = synthesize_iq([sat], n_ms * L, FS, noise_sigma=0.3, seed=5)
    family = tuple(sorted(set(ALL_PRN_IDS) | {120}))
    bank = TrackerBank(FS, L, TrackingConfig(block_size_ms=200), n_channels=2,
                       prns=family)
    bank.assign(prn=120, doppler_hz=-31.0, code_phase_samples=400,
                carrier_phase_rad=0.0)
    all_obs = []
    for b in range(n_ms // 200):
        block = iq[b * 200 * L : (b + 1) * 200 * L].reshape(200, L)
        all_obs.append(bank.process_block(block, block_start_time=b * 0.2)[0])
    signs = _concat(all_obs, "pseudosymbol_signs")
    truth = nav_bit_schedule(symbols, n_ms, symbol_periods=2)
    settled, expect = signs[300:], truth[300:]
    agreement = np.mean(settled == expect)
    assert max(agreement, 1 - agreement) > 0.99, f"agreement={agreement}"
    assert bool(all_obs[-1].locked[-1])


def test_packed_output_fetch_parity():
    """The TPU backend packs the 11 per-ms output fields into one device
    buffer before the host fetch (TrackerBank._pack_outputs — one transfer
    instead of eleven on a high-latency link). Forcing the pack on CPU must
    reproduce the unpacked observations exactly."""
    import numpy as np

    from gypsum_tpu.core.config import TrackingConfig
    from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq
    from gypsum_tpu.track.loop import TrackerBank

    fs, L, B = 2.046e6, 2046, 32
    sat = SyntheticSatellite(prn=7, doppler_hz=900.0, delay_samples=321,
                             amplitude=0.3)
    iq = synthesize_iq([sat], B * L, fs, noise_sigma=0.25, seed=3).reshape(B, L)

    def run(pack):
        bank = TrackerBank(fs, L, TrackingConfig(block_size_ms=B), n_channels=2)
        bank._pack_outputs = pack
        bank.assign(prn=7, doppler_hz=900.0, code_phase_samples=321,
                    carrier_phase_rad=0.1)
        return bank.process_block(iq, block_start_time=0.0)[0]

    a, b = run(False), run(True)
    for name in ("pseudosymbol_signs", "prompts", "code_phases",
                 "code_phases_measured", "dopplers", "carrier_phases",
                 "pll_errors", "dll_errors", "locked", "quality"):
        np.testing.assert_array_equal(getattr(a, name), getattr(b, name), err_msg=name)
    assert a.lost == b.lost
