"""SBAS L1 data-channel tests: FEC, CRC, framing, MT9 round-trip, and the
frame decoder against a synthesized symbol stream (DO-229 §A.4; beyond the
GPS-only reference)."""

import numpy as np
import pytest

from gypsum_tpu.nav.sbas import (
    BLOCK_BITS,
    GeoNavigationMessage,
    PREAMBLES,
    SbasFrameDecoder,
    convolutional_encode,
    crc24q,
    encode_block,
    encode_mt9_data,
    encode_symbol_stream,
    parse_mt9_data,
    viterbi_decode,
)

GEO = GeoNavigationMessage(
    prn=120,
    t0_sec_of_day=21600.0,
    ura=2,
    xyz_m=(24186456.08, 34561024.16, -24000.4),
    vel_mps=(-1.25, 0.875, 0.252),
    acc_mps2=(-0.0000875, 0.0000125, 0.000125),
    a_gf0_s=4.2e-8,
    a_gf1_ss=9.1e-13,
)


def test_convolutional_code_basics():
    bits = np.array([1, 0, 1, 1, 0, 0, 1], dtype=np.int8)
    sym, state = convolutional_encode(bits)
    assert sym.shape == (14,)
    assert set(np.unique(sym)) <= {0, 1}
    # Continuity: encoding in two halves with the carried state matches.
    s1, st = convolutional_encode(bits[:4])
    s2, _ = convolutional_encode(bits[4:], st)
    np.testing.assert_array_equal(np.concatenate([s1, s2]), sym)


def test_viterbi_recovers_bits_with_noise():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 400).astype(np.int8)
    sym, _ = convolutional_encode(bits)
    soft = (sym * 2.0 - 1.0) + rng.standard_normal(len(sym)) * 0.45
    decoded = viterbi_decode(soft)
    # Free-boundary decode: interior bits are ML; allow the last few to flap.
    np.testing.assert_array_equal(decoded[:-4], bits[:-4])


def test_viterbi_polarity_transparency():
    # Both generators have odd weight, so inverting every symbol inverts
    # every decoded bit — the property the frame decoder's polarity search
    # relies on.
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 200).astype(np.int8)
    sym, _ = convolutional_encode(bits)
    soft = sym * 2.0 - 1.0
    np.testing.assert_array_equal(viterbi_decode(-soft)[:-4], (1 - bits)[:-4])


def test_crc24q_self_consistent():
    rng = np.random.default_rng(2)
    body = rng.integers(0, 2, 226).astype(np.int8)
    crc = crc24q(body)
    full = np.concatenate(
        [body, np.array([(crc >> (23 - i)) & 1 for i in range(24)], dtype=np.int8)]
    )
    assert crc24q(full) == 0
    full[40] ^= 1
    assert crc24q(full) != 0


def test_block_layout_and_crc():
    data = np.zeros(212, dtype=np.int8)
    blk = encode_block(9, data, preamble_idx=1)
    assert blk.shape == (BLOCK_BITS,)
    pre = int("".join(str(int(b)) for b in blk[:8]), 2)
    assert pre == PREAMBLES[1]
    mt = int("".join(str(int(b)) for b in blk[8:14]), 2)
    assert mt == 9
    assert crc24q(blk) == 0


def test_mt9_round_trip():
    data = encode_mt9_data(GEO)
    assert data.shape == (212,)
    back = parse_mt9_data(data, prn=120)
    assert back.t0_sec_of_day == GEO.t0_sec_of_day
    assert back.ura == GEO.ura
    np.testing.assert_allclose(back.xyz_m, GEO.xyz_m, atol=0.2)
    np.testing.assert_allclose(back.vel_mps, GEO.vel_mps, atol=0.002)
    np.testing.assert_allclose(back.acc_mps2, GEO.acc_mps2, atol=3.2e-5)
    assert abs(back.a_gf0_s - GEO.a_gf0_s) < 2.0 ** -31
    assert abs(back.a_gf1_ss - GEO.a_gf1_ss) < 2.0 ** -40


def test_geo_position_velocity_polynomial():
    p0, v0 = GEO.position_velocity(GEO.t0_sec_of_day)
    np.testing.assert_allclose(p0, GEO.xyz_m)
    np.testing.assert_allclose(v0, GEO.vel_mps)
    p1, _ = GEO.position_velocity(GEO.t0_sec_of_day + 100.0)
    expect = (
        np.asarray(GEO.xyz_m) + np.asarray(GEO.vel_mps) * 100.0
        + 0.5 * np.asarray(GEO.acc_mps2) * 1e4
    )
    np.testing.assert_allclose(p1, expect)


def _stream_and_times(n_msgs, lead_ms=7, noise=0.0, polarity=1, seed=3):
    """A continuous multi-message symbol stream expanded to per-ms soft
    pseudosymbols with an arbitrary lead-in (unknown ms/symbol phase)."""
    rng = np.random.default_rng(seed)
    msgs = []
    for k in range(n_msgs):
        data = rng.integers(0, 2, 212).astype(np.int8)
        msgs.append((63, data))  # MT63 = null message; content arbitrary
    sym = encode_symbol_stream(msgs)  # +/-1, 500 per message
    per_ms = np.repeat(sym, 2).astype(np.float64) * polarity
    lead = rng.choice([-1.0, 1.0], size=lead_ms)
    soft = np.concatenate([lead, per_ms])
    soft = soft + rng.standard_normal(len(soft)) * noise
    times = np.arange(len(soft), dtype=np.float64) * 1e-3
    first_edges = 1e-3 * (lead_ms + 1000.0 * np.arange(n_msgs))
    return soft, times, msgs, first_edges


@pytest.mark.parametrize("polarity,lead_ms", [(1, 7), (-1, 12)])
def test_frame_decoder_syncs_and_verifies(polarity, lead_ms):
    soft, times, msgs, first_edges = _stream_and_times(
        4, lead_ms=lead_ms, noise=0.35, polarity=polarity
    )
    dec = SbasFrameDecoder(prn=122)
    got = []
    step = 250  # feed in 250 ms tracker blocks
    for lo in range(0, len(soft) - step + 1, step):
        got += dec.process_block(soft[lo : lo + step], times[lo : lo + step])
    assert len(got) >= 3, f"decoded only {len(got)} blocks"
    for blk in got:
        assert blk.message_type == 63
        assert blk.prn == 122
    # Data bits survive FEC + CRC exactly.
    decoded_by_edge = {round(b.leading_edge_timestamp, 6): b for b in got}
    matched = 0
    for k, edge in enumerate(first_edges):
        b = decoded_by_edge.get(round(edge, 6))
        if b is not None:
            np.testing.assert_array_equal(b.data_bits, msgs[k][1])
            matched += 1
    assert matched >= 3
    # Preamble indices advance modulo 3 in order.
    idxs = [b.preamble_idx for b in got]
    for a, c in zip(idxs, idxs[1:]):
        assert c == (a + 1) % 3


def test_frame_decoder_mt9_end_to_end_bits():
    # A realistic schedule: MT9 every 4th message.
    rng = np.random.default_rng(9)
    msgs = []
    for k in range(5):
        if k % 4 == 0:
            msgs.append((9, encode_mt9_data(GEO)))
        else:
            msgs.append((63, rng.integers(0, 2, 212).astype(np.int8)))
    sym = encode_symbol_stream(msgs)
    soft = np.repeat(sym, 2).astype(np.float64)
    soft += rng.standard_normal(len(soft)) * 0.3
    times = np.arange(len(soft), dtype=np.float64) * 1e-3
    dec = SbasFrameDecoder(prn=120)
    got = []
    for lo in range(0, len(soft), 500):
        got += dec.process_block(soft[lo : lo + 500], times[lo : lo + 500])
    mt9 = [b for b in got if b.message_type == 9]
    assert mt9, "no MT9 decoded"
    geo = parse_mt9_data(mt9[0].data_bits, prn=120)
    np.testing.assert_allclose(geo.xyz_m, GEO.xyz_m, atol=0.2)


# ------------------------------------------------------- end-to-end ranging


def test_sbas_geo_end_to_end_ranging():
    """Full chain for a mixed GPS+SBAS scene: the GEO is acquired and
    tracked through the ordinary family-widened path, its DO-229 frame
    decoder recovers MT9, and the position fix uses it as a fifth ranging
    source alongside the four GPS SVs."""
    from gypsum_tpu.core.config import ReceiverConfig
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import (
        ConstellationSatellite,
        SbasGeoSatellite,
        synthesize_constellation,
    )
    from gypsum_tpu.solve.geodesy import lla_to_ecef
    from tests.ephemeris_fixtures import TEST_EPHEMERIDES

    FS = 2.046e6
    rx = lla_to_ecef(51.5, -0.1, 80.0)
    gps_prns = [25, 28, 31, 32]
    sats = [
        ConstellationSatellite(prn=p, ephemeris=TEST_EPHEMERIDES[i], amplitude=0.22)
        for i, p in enumerate(gps_prns)
    ]
    # EGNOS-like GEO at 15.5 W, ~31 deg elevation from London; small
    # velocity/acceleration to exercise the MT9 polynomial.
    r_geo = 42164e3
    lon = np.deg2rad(-15.5)
    geo = GeoNavigationMessage(
        prn=120,
        t0_sec_of_day=21600.0,
        ura=2,
        xyz_m=(r_geo * np.cos(lon), r_geo * np.sin(lon), 11000.0),
        vel_mps=(0.8, -1.6, 2.4),
        acc_mps2=(-1.25e-4, 5.0e-5, 1.25e-4),
        a_gf0_s=3.1e-8,
        a_gf1_ss=0.0,
    )
    sats.append(SbasGeoSatellite(prn=120, geo=geo, amplitude=0.22, mt9_every=4))

    iq, truth = synthesize_constellation(
        sats, rx, gps_start_time_sow=21600.0, duration_s=25.0,
        sample_rate=FS, noise_sigma=0.35, subframe_pattern="123",
    )
    recv = Receiver(
        ArraySampleSource(iq, FS), ReceiverConfig(),
        eligible_prns=gps_prns + [120],
    )
    reports = recv.run()

    # Acquired at t=0 with near-zero GEO Doppler.
    first = reports[0]
    hits = {h.prn: h for h in first.newly_acquired}
    assert 120 in hits and set(gps_prns) <= set(hits)
    assert abs(hits[120].doppler_hz - truth.doppler_hz[120]) < 10.0

    # MT9 decoded and the GEO orbit stored.
    mt9 = [b for _, b in sum((r.sbas_blocks for r in reports), []) if b.message_type == 9]
    assert mt9, "no MT9 blocks decoded"
    rec = recv.world._sats[120]
    assert rec.geo is not None
    np.testing.assert_allclose(rec.geo.xyz_m, geo.xyz_m, atol=0.5)

    # The fix eventually ranges on all five satellites.
    fixes = [r.fix for r in reports if r.fix is not None]
    assert fixes, "no position fix"
    assert any(120 in f.satellites_used for f in fixes), "SBAS never entered the fix"
    last5 = [f for f in fixes if 120 in f.satellites_used][-1]
    err = float(np.linalg.norm(last5.ecef - rx))
    assert err < 5.0, f"5-SV fix error {err:.1f} m"  # measured ~0.6 m


def test_frame_decoder_resyncs_after_corruption():
    # A burst of corrupted signal (e.g. an obstruction) breaks CRC; the
    # decoder must drop sync and recover on clean symbols without manual
    # intervention.
    rng = np.random.default_rng(17)
    msgs = [(63, rng.integers(0, 2, 212).astype(np.int8)) for _ in range(8)]
    sym = encode_symbol_stream(msgs).astype(np.float64)
    soft = np.repeat(sym, 2)
    # Corrupt 1.2 s in the middle (pure noise, zero mean).
    lo = 2600
    soft[lo : lo + 2400] = rng.standard_normal(2400) * 1.5
    soft += rng.standard_normal(len(soft)) * 0.3
    times = np.arange(len(soft), dtype=np.float64) * 1e-3
    dec = SbasFrameDecoder(prn=126)
    got = []
    for i in range(0, len(soft) - 249, 250):
        got += dec.process_block(soft[i : i + 250], times[i : i + 250])
    edges = sorted(b.leading_edge_timestamp for b in got)
    # Blocks decoded both before and well after the corruption window.
    assert any(e < lo * 1e-3 for e in edges), "no blocks before the burst"
    assert any(e > (lo + 2400) * 1e-3 for e in edges), "never re-synced after the burst"
    # And every decoded block's payload is exact (CRC does its job).
    for b in got:
        k = int(round(b.leading_edge_timestamp))
        np.testing.assert_array_equal(b.data_bits, msgs[k][1])
