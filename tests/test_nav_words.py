"""Word-level parity tests (SURVEY.md §4: parity equations vs hand-built words)."""

import numpy as np
import pytest

from gypsum_tpu.nav.words import (
    ParityError,
    compute_parity,
    decode_words,
    encode_word,
    solve_parity_closing_bits,
)


def test_parity_roundtrip_random_words(rng):
    d29, d30 = 0, 0
    stream = []
    for _ in range(10):
        src = rng.integers(0, 2, 24).astype(np.int8)
        word = encode_word(src, d29, d30)
        stream.append((src, word))
        d29, d30 = int(word[-2]), int(word[-1])
    # Re-decode the chain manually.
    d29, d30 = 0, 0
    for src, word in stream:
        recovered = (word[:24] ^ d30).astype(np.int8)
        np.testing.assert_array_equal(recovered, src)
        np.testing.assert_array_equal(compute_parity(recovered, d29, d30), word[24:])
        d29, d30 = int(word[-2]), int(word[-1])


def test_complement_rule():
    # With D30* = 1 the transmitted data bits are the complement of the source.
    src = np.zeros(24, dtype=np.int8)
    word = encode_word(src, 0, 1)
    assert (word[:24] == 1).all()


def test_solve_parity_closing_bits(rng):
    for _ in range(20):
        d29, d30 = int(rng.integers(0, 2)), int(rng.integers(0, 2))
        src22 = rng.integers(0, 2, 22).astype(np.int8)
        solved = solve_parity_closing_bits(src22, d29, d30)
        parity = compute_parity(solved, d29, d30)
        assert parity[4] == 0 and parity[5] == 0
        np.testing.assert_array_equal(solved[:22], src22)


def test_decode_words_detects_corruption(rng):
    from gypsum_tpu.nav.subframes import Subframe4, encode_subframe

    bits = encode_subframe(Subframe4(data_id=1, page_id=5), tow_count=100)
    src, failed = decode_words(bits)
    assert failed == []
    corrupted = bits.copy()
    corrupted[40] ^= 1  # flip one data bit in word 2
    _, failed = decode_words(corrupted)
    assert 1 in failed
    with pytest.raises(ParityError):
        decode_words(corrupted, strict=True)
