"""C/A PRN code generation tests.

The octal watermark values are the ICD-published test vectors the reference
validates against at startup (reference: gypsum/gps_ca_prn_codes.py:190-248);
here they are explicit unit tests (SURVEY.md §4 item 1).
"""

import numpy as np
import pytest

from gypsum_tpu.core.constants import PRN_CHIP_COUNT
from gypsum_tpu.signal.prn import (
    ALL_PRN_IDS,
    ca_code,
    ca_code_table,
    replica_table,
    sampled_replica,
)


def test_table_shape_and_dtype():
    table = ca_code_table()
    assert table.shape == (32, PRN_CHIP_COUNT)
    assert table.dtype == np.int8
    assert set(np.unique(table)) == {0, 1}


def test_all_codes_pass_icd_watermark():
    # ca_code_table() itself raises on watermark mismatch; additionally verify
    # a handful of the published first-10-chip octal values independently.
    expected = {1: 0o1440, 2: 0o1620, 25: 0o1743, 28: 0o1774, 31: 0o1625, 32: 0o1712}
    for prn, want in expected.items():
        bits = ca_code(prn)[:10]
        got = int("".join(str(int(b)) for b in bits), 2)
        assert got == want, f"PRN {prn}: 0o{got:o} != 0o{want:o}"


def test_codes_are_balanced_and_distinct():
    table = ca_code_table()
    # Gold codes of length 1023 have 512 ones and 511 zeros.
    assert (table.sum(axis=1) == 512).all()
    # All 32 codes are distinct.
    assert len({bytes(row) for row in table}) == 32


def test_gold_code_cross_correlation_bounds():
    # C/A cross-correlations only take values {-65, -1, 63} (in +/-1 chips).
    a = ca_code(1).astype(np.int32) * 2 - 1
    b = ca_code(2).astype(np.int32) * 2 - 1
    xc = np.fft.ifft(np.fft.fft(a) * np.conj(np.fft.fft(b))).real
    vals = set(np.round(xc).astype(int))
    assert vals <= {-65, -1, 63}
    # And autocorrelation peaks at 1023.
    ac = np.fft.ifft(np.abs(np.fft.fft(a)) ** 2).real
    assert round(ac[0]) == PRN_CHIP_COUNT


def test_sampled_replica_matches_repeat_at_integer_ratio():
    # At an integer samples-per-chip ratio, fractional resampling must agree
    # with chip repetition (the reference's behavior, gypsum/satellite.py:26).
    for prn in (1, 17, 32):
        code = ca_code(prn).astype(np.float32) * 2 - 1
        by_repeat = np.repeat(code, 2)
        by_resample = sampled_replica(prn, 2046).real
        np.testing.assert_array_equal(by_repeat, by_resample)


def test_sampled_replica_fractional_rate():
    # A non-integer ratio (e.g. 2.5 Msps) must produce the right chip at each
    # sample time: chip index = floor(sample * chips_per_sample).
    spp = 2500
    rep = sampled_replica(7, spp).real
    code = ca_code(7).astype(np.float32) * 2 - 1
    k = np.arange(spp)
    expected = code[(k * PRN_CHIP_COUNT // spp) % PRN_CHIP_COUNT]
    np.testing.assert_array_equal(rep, expected)


def test_replica_table_consistent_with_single():
    table = replica_table(2046)
    assert table.shape == (32, 2046)
    for prn in ALL_PRN_IDS[:3]:
        np.testing.assert_array_equal(table[prn - 1], sampled_replica(prn, 2046).real)


def test_code_phase_offset_rolls_code():
    base = sampled_replica(9, 2046).real
    shifted = sampled_replica(9, 2046, code_phase_chips=3.0).real
    np.testing.assert_array_equal(shifted, np.roll(base, -6))


def test_invalid_prn_rejected():
    with pytest.raises(ValueError):
        ca_code(0)
    with pytest.raises(ValueError):
        ca_code(33)


# ----------------------------------------------------------- SBAS family


def test_sbas_codes_generate_and_watermark():
    from gypsum_tpu.signal.prn import SBAS_PRN_IDS, code_table

    table = code_table(SBAS_PRN_IDS)
    assert table.shape == (19, PRN_CHIP_COUNT)
    # PRN 120's first-10-chips octal is the published DO-229 value.
    bits = ca_code(120)[:10]
    assert int("".join(str(int(b)) for b in bits), 2) == 0o0671
    # Gold-code balance holds for the SBAS block too.
    assert (table.sum(axis=1) == 512).all()
    assert len({bytes(row) for row in table}) == 19


def test_sbas_gps_cross_family_correlation_bounded():
    # SBAS codes come from the same Gold family: cross-correlation against any
    # GPS code stays within the three-valued bound {-65, -1, 63}.
    a = ca_code(120).astype(np.int32) * 2 - 1
    b = ca_code(25).astype(np.int32) * 2 - 1
    xc = np.fft.ifft(np.fft.fft(a) * np.conj(np.fft.fft(b))).real
    assert set(np.round(xc).astype(int)) <= {-65, -1, 63}


def test_mixed_family_replica_table_rows():
    from gypsum_tpu.signal.prn import code_table

    prns = (25, 120, 138)
    reps = replica_table(2046, prns)
    assert reps.shape == (3, 2046)
    for i, prn in enumerate(prns):
        np.testing.assert_array_equal(
            reps[i], sampled_replica(prn, 2046, dtype=np.float32).real
        )
    with pytest.raises(ValueError):
        code_table((25, 119))  # 119 is not an allocated L1 C/A PRN


# ------------------------------------------------------------------ GLONASS


def test_glonass_code_msequence_properties():
    """The GLONASS SP code is the m-sequence of 1 + x^5 + x^9 (output stage
    7, all-ones start): period 511, balanced, two-level autocorrelation."""
    from gypsum_tpu.core.constants import GLONASS_CHIP_COUNT
    from gypsum_tpu.signal.prn import _glonass_code

    c = _glonass_code()
    assert c.shape == (GLONASS_CHIP_COUNT,)
    # All-ones initialization: stage 7 stays 1 for the first 7 chips.
    assert list(c[:9]) == [1, 1, 1, 1, 1, 1, 1, 0, 0]
    pm = c.astype(np.int32) * 2 - 1
    assert pm.sum() == 1  # 256 ones, 255 zeros
    acf = np.round(np.fft.ifft(np.fft.fft(pm) * np.conj(np.fft.fft(pm))).real)
    assert acf[0] == 511 and set(acf[1:].astype(int)) == {-1}


def test_glonass_code_matches_independent_generator():
    """Cross-check against scipy's maximal-length-sequence generator for the
    same primitive polynomial: the sequences must be cyclic shifts of each
    other (the output tap only sets the phase)."""
    from scipy.signal import max_len_seq

    from gypsum_tpu.signal.prn import _glonass_code

    ours = _glonass_code().astype(np.int32) * 2 - 1
    # Our generator uses the GNSS-ICD tap convention (delayed stages XOR'd
    # into the input — the same _mls structure whose (3,10) taps pass the
    # published GPS octal watermark); scipy's taps describe the RECIPROCAL
    # polynomial, so x^9 + x^5 + 1 is scipy taps=[4].
    theirs = max_len_seq(9, taps=[4])[0].astype(np.int32) * 2 - 1
    xc = np.fft.ifft(np.fft.fft(ours) * np.conj(np.fft.fft(theirs))).real
    assert int(np.round(xc.max())) == 511  # perfect alignment at some shift


def test_glonass_channel_id_mapping():
    from gypsum_tpu.signal.prn import (
        GLONASS_PRN_IDS,
        glonass_frequency_number,
        glonass_prn_id,
    )

    assert [glonass_frequency_number(p) for p in GLONASS_PRN_IDS] == list(range(-7, 7))
    for k in range(-7, 7):
        assert glonass_frequency_number(glonass_prn_id(k)) == k
    with pytest.raises(ValueError):
        glonass_prn_id(7)
    with pytest.raises(ValueError):
        glonass_frequency_number(25)


def test_glonass_replica_table_and_family_separation():
    from gypsum_tpu.signal.prn import GLONASS_PRN_IDS, code_table

    reps = replica_table(4092, GLONASS_PRN_IDS)
    assert reps.shape == (14, 4092)
    # Every FDMA channel shares the single SP code.
    assert all(np.array_equal(reps[0], reps[i]) for i in range(14))
    np.testing.assert_array_equal(
        reps[0], sampled_replica(208, 4092, dtype=np.float32).real
    )
    # Resampling at ~8.008 samples/chip (511 chips per 4092-sample ms)
    # matches the direct floor-indexed construction.
    code = ca_code(208).astype(np.float32) * 2 - 1
    idx = (np.arange(4092) * 511 // 4092) % 511
    np.testing.assert_array_equal(reps[0], code[idx])
    with pytest.raises(ValueError):
        code_table((25, 208))  # mixed 1023/511-chip families
