"""Subframe field encode/decode tests (SURVEY.md §4: HOW TOW decoding,
two's-complement / scale-factor field decode)."""

import numpy as np
import pytest

from gypsum_tpu.nav.subframes import (
    GpsSubframeId,
    IncorrectPreambleError,
    InvalidSubframeIdError,
    Subframe1,
    Subframe2,
    Subframe3,
    Subframe4,
    Subframe5,
    decode_subframe,
    encode_subframe,
)

SF1 = Subframe1(
    week_number_mod_1024=250, ca_or_p_on_l2=1, ura_index=2, sv_health=0,
    issue_of_data_clock=421, l2_p_data_flag=0,
    t_gd=4.656612873077393e-09,  # 10 * 2^-31
    t_oc=208800.0, a_f2=0.0,
    a_f1=-3.637978807091713e-12,  # -16 * 2^-43
    a_f0=-0.000234517455101013,  # close to a real af0
)

SF2 = Subframe2(
    issue_of_data_ephemeris=87, crs=-115.15625, delta_n=1.19e-09, m0=0.17,
    cuc=-6.03e-06, eccentricity=0.0123, cus=7.22e-06, sqrt_a=5153.6,
    t_oe=208800.0, fit_interval_flag=0, age_of_data_offset=31,
)

SF3 = Subframe3(
    cic=-1.1175870895385742e-08, omega0=-0.65, cis=2.0489e-08, i0=0.31,
    crc=221.6875, omega=-0.88, omega_dot=-2.4e-09,
    issue_of_data_ephemeris=87, idot=1.5e-10,
)


def _roundtrip(payload, tow_count=12345):
    bits = encode_subframe(payload, tow_count=tow_count)
    assert bits.shape == (300,)
    return decode_subframe(bits)


def test_subframe1_roundtrip():
    d = _roundtrip(SF1)
    assert d.handover.subframe_id == GpsSubframeId.ONE
    assert d.failed_parity_words == ()
    sf = d.subframe
    assert sf.week_number_mod_1024 == 250
    assert sf.issue_of_data_clock == 421
    np.testing.assert_allclose(sf.t_gd, SF1.t_gd, rtol=0, atol=2**-32)
    assert sf.t_oc == SF1.t_oc
    np.testing.assert_allclose(sf.a_f1, SF1.a_f1, atol=2**-44)
    np.testing.assert_allclose(sf.a_f0, SF1.a_f0, atol=2**-32)


def test_subframe2_roundtrip():
    d = _roundtrip(SF2)
    sf = d.subframe
    assert d.handover.subframe_id == GpsSubframeId.TWO
    assert sf.issue_of_data_ephemeris == 87
    assert sf.crs == SF2.crs  # exact multiple of 2^-5
    np.testing.assert_allclose(sf.m0, SF2.m0, atol=2**-31)
    np.testing.assert_allclose(sf.eccentricity, SF2.eccentricity, atol=2**-33)
    np.testing.assert_allclose(sf.sqrt_a, SF2.sqrt_a, atol=2**-19)
    assert sf.t_oe == SF2.t_oe
    assert sf.age_of_data_offset == 31


def test_subframe3_roundtrip():
    d = _roundtrip(SF3)
    sf = d.subframe
    assert d.handover.subframe_id == GpsSubframeId.THREE
    np.testing.assert_allclose(sf.omega0, SF3.omega0, atol=2**-31)
    np.testing.assert_allclose(sf.i0, SF3.i0, atol=2**-31)
    np.testing.assert_allclose(sf.omega, SF3.omega, atol=2**-31)
    np.testing.assert_allclose(sf.omega_dot, SF3.omega_dot, atol=2**-43)
    np.testing.assert_allclose(sf.idot, SF3.idot, atol=2**-43)
    assert sf.crc == SF3.crc


def test_subframe4_and_5_roundtrip():
    d4 = _roundtrip(Subframe4(data_id=1, page_id=18))
    assert d4.subframe.page_id == 18
    sf5 = Subframe5(
        data_id=1, almanac_sv_id=7, eccentricity=0.009, t_oa=208896.0,
        delta_i=0.004, omega_dot=-2.5e-09, sv_health=0, sqrt_a=5153.5,
        omega0=0.2, omega=-0.4, m0=0.9, a_f0=9.5e-05, a_f1=3.6e-12,
    )
    d5 = _roundtrip(sf5)
    np.testing.assert_allclose(d5.subframe.a_f0, sf5.a_f0, atol=2**-20)
    np.testing.assert_allclose(d5.subframe.sqrt_a, sf5.sqrt_a, atol=2**-11)
    assert d5.subframe.almanac_sv_id == 7


def test_handover_word_tow_seconds():
    d = _roundtrip(SF1, tow_count=34802)
    assert d.handover.tow_count == 34802
    # Each TOW count unit is 6 s (reference weighting 1.5*2^(i+2),
    # gypsum/navigation_message_parser.py:84-93, equals count*6).
    assert d.handover.time_of_week_seconds == 34802 * 6


def test_bad_preamble_raises():
    bits = encode_subframe(SF1, tow_count=1)
    bits[0] ^= 1  # break the preamble (word 1, bit 0; D30* = 0 so unencoded)
    with pytest.raises(IncorrectPreambleError):
        decode_subframe(bits)


def test_negative_two_complement_fields_sign():
    d = _roundtrip(SF3)
    assert d.subframe.omega0 < 0
    assert d.subframe.omega < 0
    assert d.subframe.omega_dot < 0
