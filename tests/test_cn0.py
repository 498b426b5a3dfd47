"""C/N0 estimator tests — obs/cn0.py."""

import numpy as np
import pytest

from gypsum_tpu.obs.cn0 import cn0_m2m4_dbhz, sigma_from_cn0


def _prompt_stream(cn0_dbhz: float, n_ms: int = 2000, seed: int = 0) -> np.ndarray:
    """Synthesize 1 ms BPSK prompts at an exact C/N0: signal amplitude A,
    complex noise of total variance sigma^2 per prompt, C/N0 = A^2/sigma^2/T."""
    rng = np.random.default_rng(seed)
    t = 1e-3
    a = 1.0
    sigma2 = a * a / (10.0 ** (cn0_dbhz / 10.0) * t)
    bits = rng.choice([-1.0, 1.0], size=n_ms)
    noise = (rng.standard_normal(n_ms) + 1j * rng.standard_normal(n_ms)) * np.sqrt(
        sigma2 / 2.0
    )
    # Random constant carrier-phase offset: the estimator must not care.
    return (a * bits + noise) * np.exp(1j * 1.1)


@pytest.mark.parametrize("truth", [32.0, 40.0, 48.0])
def test_m2m4_tracks_truth(truth):
    est = cn0_m2m4_dbhz(_prompt_stream(truth))
    assert est is not None
    assert abs(est - truth) < 1.5, f"{est:.1f} vs {truth}"


def test_noise_only_reports_none_or_floor():
    rng = np.random.default_rng(3)
    noise = rng.standard_normal(2000) + 1j * rng.standard_normal(2000)
    est = cn0_m2m4_dbhz(noise)
    assert est is None or est < 25.0


def test_short_window_rejected():
    assert cn0_m2m4_dbhz(np.ones(10, dtype=complex)) is None


def test_sigma_weighting_monotone():
    s45 = sigma_from_cn0(45.0, 2.5)
    assert s45 == pytest.approx(2.5)
    assert sigma_from_cn0(51.0, 2.5) < s45 < sigma_from_cn0(33.0, 2.5)
    # 12 dB down doubles-squared the noise: 20 dB/decade amplitude scaling.
    assert sigma_from_cn0(33.0, 2.5) == pytest.approx(2.5 * 10 ** 0.6, rel=1e-6)
    # Unknown quality is conservative, and the clamp bounds the extremes.
    assert sigma_from_cn0(None, 2.5) == 10.0
    assert sigma_from_cn0(90.0, 2.5) == sigma_from_cn0(55.0, 2.5)


def test_estimator_on_tracker_like_amplitudes():
    # Typical synthetic-scene post-correlation SNR: amplitude 0.22 over
    # 2046 samples with per-sample noise 0.35 -> C/N0 ~ 10log10(a^2/sig^2
    # * fs / 2) ... checked empirically: build prompts the way the tracker
    # sees them and verify the estimate matches the constructed SNR.
    rng = np.random.default_rng(7)
    L, a, sig = 2046, 0.22, 0.35
    n_ms = 1500
    bits = rng.choice([-1.0, 1.0], size=n_ms)
    # Prompt = sum over L samples: signal a*L, noise std sig*sqrt(L/2) per
    # component.
    noise = (rng.standard_normal(n_ms) + 1j * rng.standard_normal(n_ms)) * sig * np.sqrt(L / 2.0)
    prompts = a * L * bits + noise
    truth = 10.0 * np.log10((a * L) ** 2 / (sig**2 * L) / 1e-3)
    est = cn0_m2m4_dbhz(prompts)
    assert est is not None
    assert abs(est - truth) < 1.5, f"{est:.1f} vs {truth:.1f}"


def test_world_model_routes_cn0_into_sigma():
    from gypsum_tpu.core.config import SolverConfig
    from gypsum_tpu.nav.sbas import GeoNavigationMessage
    from gypsum_tpu.solve.world import WorldModel

    wm = WorldModel(SolverConfig())
    wm.handle_channel_block(25, 1e-4, 1000.0, 500, cn0_dbhz=45.0)
    wm.handle_channel_block(28, 1e-4, 1000.0, 500, cn0_dbhz=33.0)
    wm.handle_channel_block(31, 1e-4, 1000.0, 500)  # no estimate
    assert wm._sats[25].cn0_dbhz == 45.0
    nominal = wm.config.pseudorange_sigma_m
    assert wm._sigma_for(25) == pytest.approx(nominal)
    assert wm._sigma_for(28) == pytest.approx(nominal * 10 ** 0.6)
    assert wm._sigma_for(31) == pytest.approx(nominal)  # nominal when unmeasured
    # SBAS GEO: URA RSS'd on top of the thermal term.
    wm._record(120).geo = GeoNavigationMessage(
        prn=120, t0_sec_of_day=0.0, ura=6, xyz_m=(0, 0, 0),
        vel_mps=(0, 0, 0), acc_mps2=(0, 0, 0), a_gf0_s=0.0, a_gf1_ss=0.0,
    )
    wm.handle_channel_block(120, 1e-4, 10.0, 500, cn0_dbhz=45.0)
    assert wm._sigma_for(120) == pytest.approx(np.hypot(nominal, 24.0))
