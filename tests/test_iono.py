"""Klobuchar ionosphere + UTC from subframe 4 page 18 (solve/iono.py).

The reference decodes no subframe-4 payload (gypsum/
navigation_message_parser.py:599-618); these tests pin the beyond-reference
accuracy lever: page-18 field decode, the ICD model's shape, and an
end-to-end run where the broadcast correction removes the synthesizer's
injected (same-model) ionospheric delay.
"""

from __future__ import annotations

import numpy as np
import pytest

from gypsum_tpu.nav.subframes import (
    PAGE18_SV_ID,
    Subframe4,
    Subframe4Page18,
    decode_subframe,
    encode_subframe,
    roundtrip_fields,
)
from gypsum_tpu.solve.iono import IonoUtcParams, gps_to_utc_offset_s, klobuchar_delay_s

# A daytime-active parameter set (period stretched so the demo epoch's
# 6 AM local time sits inside the cosine window).
PAGE18 = Subframe4Page18(
    data_id=1,
    page_id=PAGE18_SV_ID,
    alpha0=8.0e-8, alpha1=3.0e-8, alpha2=-6.0e-8, alpha3=0.0,
    beta0=131072.0, beta1=98304.0, beta2=-65536.0, beta3=0.0,
    a1_utc=2.0e-15, a0_utc=3.0e-9, t_ot=147456.0, wn_t=250 % 256,
    delta_t_ls=18, wn_lsf=250 % 256, dn=7, delta_t_lsf=18,
)


def test_page18_roundtrip_through_transmitted_bits():
    """encode -> 300 transmitted bits -> decode recovers every field at
    transmitted precision, and the page dispatches to Subframe4Page18."""
    q = roundtrip_fields(PAGE18)
    bits = encode_subframe(q, tow_count=1000)
    dec = decode_subframe(bits)
    assert isinstance(dec.subframe, Subframe4Page18)
    for f in Subframe4Page18.FIELDS:
        assert getattr(dec.subframe, f.name) == getattr(q, f.name), f.name


def test_non_page18_subframe4_still_plain():
    bits = encode_subframe(Subframe4(data_id=1, page_id=1), tow_count=1000)
    dec = decode_subframe(bits)
    assert isinstance(dec.subframe, Subframe4)
    assert not isinstance(dec.subframe, Subframe4Page18)


def test_klobuchar_model_shape():
    p = IonoUtcParams.from_page(roundtrip_fields(PAGE18))
    # Zenith vs low elevation: obliquity increases the slant delay.
    d_zenith = klobuchar_delay_s(p, 51.5, -0.1, 90.0, 0.0, 21600.0)
    d_low = klobuchar_delay_s(p, 51.5, -0.1, 10.0, 180.0, 21600.0)
    assert d_low > d_zenith > 0.0
    assert 5e-9 <= d_zenith < 1.5e-7
    # Deep night (cosine window closed) falls to the 5 ns floor times F.
    p_night = IonoUtcParams(
        alpha=p.alpha, beta=(72000.0, 0, 0, 0), a0_utc=p.a0_utc,
        a1_utc=p.a1_utc, t_ot=p.t_ot, wn_t=p.wn_t, delta_t_ls=p.delta_t_ls,
    )
    d_night = klobuchar_delay_s(p_night, 51.5, -0.1, 90.0, 0.0, 3600.0)
    assert d_night == pytest.approx(5e-9 * (1 + 16 * (0.53 - 0.5) ** 3), rel=1e-6)


def test_utc_offset():
    p = IonoUtcParams.from_page(roundtrip_fields(PAGE18))
    off = gps_to_utc_offset_s(p, p.t_ot)
    assert off == pytest.approx(18 + p.a0_utc, abs=1e-12)


def test_e2e_iono_correction_recovers_injected_delay():
    """Synthesize the demo scene WITH Klobuchar-consistent ionospheric delay
    and page 18 on the subframe-4 slots; the receiver that applies the
    broadcast correction must beat the one that ignores it (the reference's
    behavior) decisively."""
    import dataclasses

    from gypsum_tpu.core.config import ReceiverConfig, SolverConfig
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import DEMO_GPS_START_SOW, demo_constellation
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    rx = lla_to_ecef(51.5, -0.1, 80.0)
    page = roundtrip_fields(PAGE18)
    params = IonoUtcParams.from_page(page)
    sats = demo_constellation([25, 28, 31, 32])
    sats = [dataclasses.replace(s, sf4=page) for s in sats]
    iq, _ = synthesize_constellation(
        sats, rx, DEMO_GPS_START_SOW, 30.0, 2.046e6,
        noise_sigma=0.3, subframe_pattern="1234", iono=params,
    )

    def final_err(apply_correction):
        cfg = ReceiverConfig(
            solver=SolverConfig(apply_iono_correction=apply_correction)
        )
        recv = Receiver(ArraySampleSource(iq, 2.046e6), cfg)
        recv.run()
        assert recv.world.position_fixes, "no fix"
        if apply_correction:
            assert recv.world.iono_utc is not None, "page 18 never decoded"
        return float(np.linalg.norm(recv.world.position_fixes[-1].ecef - rx))

    err_without = final_err(False)
    err_with = final_err(True)
    # The injected differential delay biases the uncorrected fix; the
    # correction (same model, broadcast parameters) removes it.
    assert err_with < err_without, (err_with, err_without)
    assert err_with < 15.0, err_with
