"""Bit integrator + subframe decoder tests on synthetic symbol/bit streams."""

import numpy as np
import pytest

from gypsum_tpu.core.config import NavConfig
from gypsum_tpu.core.events import (
    BitValue,
    CannotDetermineSubframePhaseEvent,
    DeterminedSubframePhaseEvent,
    EmitNavigationBitEvent,
)
from gypsum_tpu.nav.bits import BitIntegrator
from gypsum_tpu.nav.frames import EmitSubframeEvent, SubframeDecoder
from gypsum_tpu.nav.subframes import GpsSubframeId, Subframe4, encode_subframe

SPB = 20


def _symbol_stream(bits_pm1, phase=0, flip_prob=0.0, rng=None):
    """Pseudosymbols for a bit stream, optionally offset by `phase` symbols
    (the first bit is truncated, as when tracking starts mid-bit)."""
    sym = np.repeat(np.asarray(bits_pm1, dtype=np.int8), SPB)[phase:]
    if flip_prob and rng is not None:
        flips = rng.random(len(sym)) < flip_prob
        sym = np.where(flips, -sym, sym).astype(np.int8)
    n = len(sym)
    t0 = np.arange(n) * 1e-3
    return sym, t0, t0 + 1e-3


def _feed(integrator, sym, t0, t1, chunk=200):
    events = []
    for i in range(0, len(sym), chunk):
        events.extend(integrator.process_block(sym[i : i + chunk], t0[i : i + chunk], t1[i : i + chunk]))
    return [e for e in events if isinstance(e, EmitNavigationBitEvent)]


def test_integrates_aligned_bits(rng):
    bits = rng.choice([-1, 1], 50)
    sym, t0, t1 = _symbol_stream(bits)
    got = _feed(BitIntegrator(), sym, t0, t1)
    values = [e.bit_value for e in got]
    want = [BitValue.ONE if b > 0 else BitValue.ZERO for b in bits]
    assert values == want[: len(values)]
    assert len(values) >= len(bits) - 1


def test_finds_nonzero_bit_phase(rng):
    bits = rng.choice([-1, 1], 60)
    phase = 13
    sym, t0, t1 = _feed_args = _symbol_stream(bits, phase=phase)
    integ = BitIntegrator()
    got = _feed(integ, sym, t0, t1)
    assert integ.bit_phase == (SPB - phase) % SPB
    # Emitted bits must match the truth from the first full bit onward.
    want = [BitValue.ONE if b > 0 else BitValue.ZERO for b in bits[1:]]
    values = [e.bit_value for e in got]
    # Allow the first emitted bit to be the truncated partial.
    tail = values[1:]
    assert tail == want[1 : len(tail) + 1]


def test_noisy_symbols_still_decode(rng):
    bits = rng.choice([-1, 1], 100)
    sym, t0, t1 = _symbol_stream(bits, flip_prob=0.1, rng=rng)
    got = _feed(BitIntegrator(), sym, t0, t1)
    values = [e.bit_value for e in got]
    want = [BitValue.ONE if b > 0 else BitValue.ZERO for b in bits[: len(values)]]
    agreement = np.mean([v == w for v, w in zip(values, want)])
    # With 10% symbol flips a few bits legitimately integrate to UNKNOWN.
    assert agreement > 0.94


def test_ambiguous_symbols_emit_unknown():
    # Alternating symbols within each bit integrate to ~0 -> UNKNOWN.
    sym = np.tile(np.array([1, -1], dtype=np.int8), 40 * SPB // 2)
    t0 = np.arange(len(sym)) * 1e-3
    integ = BitIntegrator()
    got = _feed(integ, sym, t0, t0 + 1e-3)
    assert got, "bits should be emitted once a phase is picked"
    assert all(e.bit_value == BitValue.UNKNOWN for e in got)
    assert integ.failed_bit_count == len(got)


def test_timestamps_span_the_bit(rng):
    bits = rng.choice([-1, 1], 30)
    sym, t0, t1 = _symbol_stream(bits)
    got = _feed(BitIntegrator(), sym, t0, t1)
    e = got[5]
    assert e.trailing_edge_receiver_timestamp - e.receiver_timestamp == pytest.approx(20e-3)


# --------------------------------------------------------------- framing


def _bit_events(bits01, polarity=1, t_start=0.0):
    out = []
    for i, b in enumerate(bits01):
        v = BitValue(b) if polarity == 1 else BitValue(b).inverted()
        out.append(
            EmitNavigationBitEvent(
                receiver_timestamp=t_start + i * 0.02,
                trailing_edge_receiver_timestamp=t_start + (i + 1) * 0.02,
                bit_value=v,
            )
        )
    return out


def _subframe_stream(n, tow0=1000):
    bits = []
    for k in range(n):
        bits.extend(encode_subframe(Subframe4(data_id=1, page_id=k + 1), tow_count=tow0 + k).tolist())
    return bits


def test_decodes_subframes_both_polarities():
    for polarity in (1, -1):
        dec = SubframeDecoder()
        events = []
        for e in _bit_events(_subframe_stream(3), polarity=polarity):
            events.extend(dec.process_bit(e))
        phases = [e for e in events if isinstance(e, DeterminedSubframePhaseEvent)]
        sfs = [e for e in events if isinstance(e, EmitSubframeEvent)]
        assert phases and phases[0].polarity == polarity
        assert [s.decoded.subframe.page_id for s in sfs] == [1, 2, 3]
        assert [s.decoded.handover.tow_count for s in sfs] == [1000, 1001, 1002]


def test_phase_offset_found_and_partial_discarded():
    stream = _subframe_stream(3)[137:]  # drop a partial leading subframe
    dec = SubframeDecoder()
    events = []
    for e in _bit_events(stream):
        events.extend(dec.process_bit(e))
    sfs = [e for e in events if isinstance(e, EmitSubframeEvent)]
    assert [s.decoded.subframe.page_id for s in sfs] == [2, 3]


def test_unknown_bit_discards_subframe_and_resets_phase():
    stream = _subframe_stream(4)
    events_in = _bit_events(stream)
    # Corrupt one bit inside the second subframe.
    bad = events_in[450]
    events_in[450] = EmitNavigationBitEvent(
        receiver_timestamp=bad.receiver_timestamp,
        trailing_edge_receiver_timestamp=bad.trailing_edge_receiver_timestamp,
        bit_value=BitValue.UNKNOWN,
    )
    dec = SubframeDecoder()
    events = []
    for e in events_in:
        events.extend(dec.process_bit(e))
    sfs = [e for e in events if isinstance(e, EmitSubframeEvent)]
    pages = [s.decoded.subframe.page_id for s in sfs]
    assert 1 in pages  # first subframe decoded
    assert 2 not in pages  # corrupted one discarded
    assert 4 in pages  # phase re-found afterwards
    assert dec.emitted_subframe_count == len(sfs)


def test_gives_up_without_preambles():
    rng = np.random.default_rng(5)
    dec = SubframeDecoder(NavConfig())
    # Random bits long enough to exceed 12 subframes' worth.
    events = []
    for e in _bit_events(list(rng.integers(0, 2, 3700))):
        events.extend(dec.process_bit(e))
        if any(isinstance(x, CannotDetermineSubframePhaseEvent) for x in events):
            break
    assert any(isinstance(x, CannotDetermineSubframePhaseEvent) for x in events)


def test_full_chain_symbols_to_subframe(rng):
    # Pseudosymbols -> bits -> subframe, through both host layers.
    stream01 = _subframe_stream(3)
    bits_pm1 = [1 if b else -1 for b in stream01]
    sym, t0, t1 = _symbol_stream(np.asarray(bits_pm1), phase=7)
    integ = BitIntegrator()
    dec = SubframeDecoder()
    sfs = []
    for i in range(0, len(sym), 500):
        for ev in integ.process_block(sym[i : i + 500], t0[i : i + 500], t1[i : i + 500]):
            if isinstance(ev, EmitNavigationBitEvent):
                sfs.extend(
                    e for e in dec.process_bit(ev) if isinstance(e, EmitSubframeEvent)
                )
    assert len(sfs) >= 2
    assert sfs[0].decoded.handover.subframe_id == GpsSubframeId.FOUR


def test_fast_block_path_matches_per_symbol_oracle():
    """process_block's batched fast path must reproduce the per-symbol walk
    exactly: same events (values + timestamps), same internal state, across
    random symbol streams, noise-flipped symbols, and odd block splits."""
    rng = np.random.default_rng(42)
    for trial in range(6):
        n = int(rng.integers(800, 4000))
        bits = rng.choice([-1, 1], size=(n // 20) + 2)
        sym = np.repeat(bits, 20)[:n].astype(np.int8)
        flips = rng.random(n) < 0.12  # noisy symbols exercise UNKNOWN paths
        sym = np.where(flips, -sym, sym)
        t0 = np.arange(n) * 1e-3
        t1 = t0 + 1e-3

        fast = BitIntegrator()
        slow = BitIntegrator()
        ev_fast, ev_slow = [], []
        lo = 0
        while lo < n:
            hi = min(n, lo + int(rng.integers(1, 700)))
            ev_fast.extend(fast.process_block(sym[lo:hi], t0[lo:hi], t1[lo:hi]))
            ev_slow.extend(
                slow._process_block_per_symbol(sym[lo:hi], t0[lo:hi], t1[lo:hi])
            )
            lo = hi

        assert len(ev_fast) == len(ev_slow)
        for a, b in zip(ev_fast, ev_slow):
            assert a.bit_value == b.bit_value
            assert a.receiver_timestamp == b.receiver_timestamp
            assert a.trailing_edge_receiver_timestamp == b.trailing_edge_receiver_timestamp
        for attr in ("bit_phase", "_previous_phase_decision", "processed_count",
                     "emitted_bit_count", "failed_bit_count",
                     "_sequential_unknown", "_cursor", "_queue_signs",
                     "_history", "_last_bits"):
            assert getattr(fast, attr) == getattr(slow, attr), attr
