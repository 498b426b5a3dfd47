"""GLONASS navigation-string codec tests (nav/glonass.py)."""

import numpy as np
import pytest

from gypsum_tpu.nav.glonass import (
    DATA_SYMBOLS,
    GLONASS_PSEUDOSYMBOLS_PER_SYMBOL as G,
    GlonassString,
    GlonassStringDecoder,
    SYMBOLS_PER_STRING,
    TIME_MARK_BITS,
    _get_bit,
    _H_POS,
    encode_string,
    frame_strings_for_ephemeris,
    kx_encode,
    kx_verify,
    parse_string,
    relative_decode,
    relative_encode,
    string_symbols,
)


def _demo_strings() -> dict[int, GlonassString]:
    return {
        1: GlonassString(m=1, fields={
            "p1": 0, "tk_raw": GlonassString.tk_raw_from_seconds(41400.0),
            "xdot_raw": -123456, "xdotdot_raw": -7, "x_raw": 12_345_678,
        }),
        2: GlonassString(m=2, fields={
            "bn": 0, "p2": 1, "tb_raw": 46,
            "ydot_raw": 654321, "ydotdot_raw": 3, "y_raw": -9_876_543,
        }),
        3: GlonassString(m=3, fields={
            "p3": 1, "gamma_raw": -512, "p": 1, "l_n": 0,
            "zdot_raw": -1, "zdotdot_raw": -15, "z_raw": 1,
        }),
        4: GlonassString(m=4, fields={
            "tau_raw": -1048575, "delta_tau_raw": 2, "e_n": 0, "p4": 0,
            "f_t": 4, "n_t": 700, "n_slot": 14, "m_type": 1,
        }),
        5: GlonassString(m=5, fields={
            "n_a": 700, "tau_c_raw": -123456789, "n4": 7,
            "tau_gps_raw": 999, "l_n": 0,
        }),
    }


def test_kx_index_sets_match_icd_c1_list():
    """The virtual-position construction must reproduce the ICD's published
    c1 coverage (string bits whose Hamming position is odd)."""
    c1_bits = [k + 9 for k in range(77) if _H_POS[k] & 1]
    assert c1_bits[:20] == [
        9, 10, 12, 13, 15, 17, 19, 20, 22, 24, 26, 28, 30, 32, 34, 35,
        37, 39, 41, 43,
    ]
    # 64 is skipped from the data numbering: 65..84 all carry bit 6 -> c7.
    c7_bits = [k + 9 for k in range(77) if (_H_POS[k] >> 6) & 1]
    assert c7_bits == list(range(66, 86))  # string bits 66..85


def test_string_field_roundtrip_all_layouts():
    for m, s in _demo_strings().items():
        bits = encode_string(s)
        assert bits.shape == (85,) and _get_bit(bits, 85) == 0
        ok, corrected, n = kx_verify(bits)
        assert ok and n == 0
        back = parse_string(corrected)
        assert back.m == m
        assert back.fields == s.fields
    # Physical scaling spot checks.
    s1 = _demo_strings()[1]
    assert parse_string(encode_string(s1)).scaled("x_raw") == 12_345_678 * 2**-11 * 1e3
    assert parse_string(encode_string(s1)).tk_seconds == 41400.0
    s2 = _demo_strings()[2]
    assert parse_string(encode_string(s2)).tb_seconds == 46 * 900.0


def test_kx_single_error_correction_every_position():
    bits = encode_string(_demo_strings()[3])
    for j in range(85):
        flipped = bits.copy()
        flipped[j] ^= 1
        ok, corrected, n = kx_verify(flipped)
        assert ok, f"position {j} not correctable"
        # Data-carrying bits must be restored exactly.
        assert parse_string(corrected).fields == _demo_strings()[3].fields


def test_kx_double_error_detected():
    bits = encode_string(_demo_strings()[4])
    rng = np.random.default_rng(5)
    detected = 0
    for _ in range(60):
        i, j = rng.choice(85, size=2, replace=False)
        flipped = bits.copy()
        flipped[i] ^= 1
        flipped[j] ^= 1
        ok, corrected, _ = kx_verify(flipped)
        if not ok:
            detected += 1
        else:
            # A "correction" of a double error must not silently corrupt the
            # parsed payload into passing as the original.
            assert parse_string(corrected).fields != _demo_strings()[4].fields
    assert detected >= 55  # SEC-DED: the vast majority are flagged


def test_relative_code_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 85).astype(np.int8)
    np.testing.assert_array_equal(relative_decode(relative_encode(bits)), bits)


def test_string_symbols_structure():
    sym = string_symbols(encode_string(_demo_strings()[1]))
    assert sym.shape == (SYMBOLS_PER_STRING,)
    # Meander: each data bit's two halves are opposite.
    assert np.all(sym[0:DATA_SYMBOLS:2] == -sym[1:DATA_SYMBOLS:2])
    np.testing.assert_array_equal(sym[DATA_SYMBOLS:], 1 - 2 * TIME_MARK_BITS)


def _pseudosymbols(strings, polarity=1):
    sym = np.concatenate([string_symbols(encode_string(s)) for s in strings])
    return polarity * np.repeat(sym.astype(np.float64), G)


def test_decoder_recovers_frame_with_offset_noise_and_polarity():
    frame = frame_strings_for_ephemeris(_demo_strings(), 41400.0)
    ps = _pseudosymbols(frame[:7], polarity=-1)
    rng = np.random.default_rng(1)
    noisy = ps + 0.8 * rng.standard_normal(len(ps))
    offset = 777  # stream starts mid-string
    noisy = noisy[offset:]
    t = 10.0 + np.arange(len(noisy)) * 1e-3
    dec = GlonassStringDecoder()
    events = []
    for lo in range(0, len(noisy), 1000):  # 1 s tracking blocks
        events += dec.process_block(noisy[lo : lo + 1000], t[lo : lo + 1000])
    assert [e.string.m for e in events] == [2, 3, 4, 5, 6]
    for e in events:
        if e.string.m in (2, 3, 4, 5):
            assert e.string.fields == _demo_strings()[e.string.m].fields
    # Trailing edges are exactly one string (2 s) apart and land on the
    # pseudosymbol grid right after each time mark.
    edges = np.array([e.trailing_edge_receiver_timestamp for e in events])
    np.testing.assert_allclose(np.diff(edges), 2.0, atol=1e-9)
    # String m's mark ends 2000 * m pseudosymbols into the frame; the stream
    # lost `offset` of them before t=10 s.
    expected_first = 10.0 + (2 * 2000 - offset) * 1e-3
    assert abs(edges[0] - expected_first) < 1e-9


def test_decoder_rejects_corrupted_string():
    frame = frame_strings_for_ephemeris(_demo_strings(), 600.0)
    ps = _pseudosymbols(frame[:4])
    # Corrupt 40 ms in the middle of string 2's data span (2 bits worth).
    ps[2300:2340] *= -1.0
    t = np.arange(len(ps)) * 1e-3
    dec = GlonassStringDecoder()
    events = dec.process_block(ps, t)
    ms = [e.string.m for e in events]
    assert 2 not in ms and {1, 3}.issubset(set(ms))
    assert dec.strings_rejected >= 1


def test_encode_string_rejects_unknown_fields():
    with pytest.raises(ValueError):
        encode_string(GlonassString(m=1, fields={"bogus": 1}))
    with pytest.raises(ValueError):
        GlonassString.tk_raw_from_seconds(41401.0)  # not a 30 s multiple
