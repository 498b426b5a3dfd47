"""SBAS fast corrections (MT1 PRN mask + MT2 PRCs): codec, store, and the
end-to-end differential fix.

The reference has no SBAS at all; DO-229 §A.4.4.2/.3 field layouts are
exercised encode->decode against themselves, and the e2e test injects
unmodeled satellite clock errors that only the broadcast corrections can
remove."""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from gypsum_tpu.nav.sbas import (
    FastCorrections,
    PrnMask,
    UDRE_VARIANCE_M2,
    encode_fast_corrections_data,
    encode_mt1_data,
    parse_fast_corrections_data,
    parse_mt1_data,
)
from gypsum_tpu.solve.sbas_corrections import SbasCorrectionStore


def test_mt1_round_trip():
    mask = PrnMask(iodp=2, slots=(1, 5, 25, 28, 31, 32, 37, 120, 210))
    out = parse_mt1_data(encode_mt1_data(mask))
    assert out == mask


def test_mt2_round_trip():
    fc = FastCorrections(
        message_type=3, iodf=1, iodp=2,
        prc_m=(12.0, -9.125, 0.0, 255.875, -256.0) + (0.125,) * 8,
        udrei=(5, 7, 0, 13, 15) + (14,) * 8,
    )
    out = parse_fast_corrections_data(encode_fast_corrections_data(fc), 3)
    assert out == fc


def test_udre_variance_table_is_monotonic():
    assert len(UDRE_VARIANCE_M2) == 14
    assert all(b > a for a, b in zip(UDRE_VARIANCE_M2, UDRE_VARIANCE_M2[1:]))
    assert UDRE_VARIANCE_M2[0] == pytest.approx((0.75 / 3.29) ** 2)


def test_store_sequence_mapping_and_gating():
    store = SbasCorrectionStore(timeout_s=30.0)
    # Corrections before any mask are held, then applied when it arrives.
    fc = FastCorrections(
        message_type=2, iodf=0, iodp=0,
        prc_m=(4.0, -2.5, 8.0) + (0.0,) * 10,
        udrei=(5, 5, 15) + (14,) * 10,
    )
    store.handle_fast(fc, rx_time=10.0)
    assert store.correction_for(25, 11.0) is None
    store.handle_mask(PrnMask(iodp=0, slots=(25, 28, 31)))
    c = store.correction_for(25, 11.0)
    assert c is not None and c.prc_m == 4.0 and c.udrei == 5
    assert store.correction_for(28, 11.0).prc_m == -2.5
    # UDREI 15 = do not use; unmasked PRN and GEO PRNs return None.
    assert store.correction_for(31, 11.0) is None
    assert store.correction_for(32, 11.0) is None
    assert store.correction_for(120, 11.0) is None
    # Staleness: past the timeout the correction disappears.
    assert store.correction_for(25, 39.9) is not None
    assert store.correction_for(25, 40.1) is None
    # An IODP change invalidates the old slot mapping.
    store.handle_mask(PrnMask(iodp=1, slots=(25, 28)))
    assert store.correction_for(25, 11.0) is None


def test_store_mt_slot_groups():
    """MT(2+g) carries correction-sequence entries 13g+1..13g+13."""
    store = SbasCorrectionStore()
    slots = tuple(range(1, 21))  # 20 masked slots -> MT2 covers 13, MT3 next 7
    store.handle_mask(PrnMask(iodp=0, slots=slots))
    fc3 = FastCorrections(
        message_type=3, iodf=0, iodp=0,
        prc_m=tuple(float(k) for k in range(13)),
        udrei=(3,) * 13,
    )
    store.handle_fast(fc3, rx_time=0.0)
    # Sequence entry 14 (index 13) is mask slot 14 -> PRC 0.0; entry 20 -> 6.0
    assert store.correction_for(14, 1.0).prc_m == 0.0
    assert store.correction_for(20, 1.0).prc_m == 6.0
    assert store.correction_for(13, 1.0) is None  # MT2 territory, not sent


def test_fast_corrections_end_to_end():
    """Two GPS SVs carry unmodeled clock errors (+12 m, -9 m). With the
    GEO's MT1+MT2 decoded the fix must come back to meter level; with
    corrections disabled the same capture is several meters off."""
    from gypsum_tpu.core.config import ReceiverConfig, SolverConfig
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GPS_START_SOW,
        demo_constellation,
        demo_sbas_geo,
    )
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    fs = 2.046e6
    prns = [25, 28, 31, 32, 3]
    biases = {28: 12.0, 32: -9.0}
    sats = demo_constellation(prns)
    sats = [
        dataclasses.replace(s, unmodeled_clock_error_m=biases.get(s.prn, 0.0))
        for s in sats
    ]
    geo = dataclasses.replace(
        demo_sbas_geo(120), fast_corrections=biases, correction_udrei=4
    )
    truth = lla_to_ecef(51.5, -0.1, 80.0)
    iq, _ = synthesize_constellation(
        sats + [geo], truth, DEMO_GPS_START_SOW, 32.0, fs, noise_sigma=0.25,
    )

    def run(apply: bool):
        cfg = ReceiverConfig(solver=SolverConfig(apply_sbas_corrections=apply))
        recv = Receiver(ArraySampleSource(iq, fs), cfg,
                        eligible_prns=prns + [120])
        recv.run()
        assert recv.world.position_fixes, "no fix at all"
        return recv, np.linalg.norm(recv.world.position_fixes[-1].ecef - truth)

    recv_on, err_on = run(True)
    # The corrections actually arrived and were applied.
    store = recv_on.world.sbas_corrections
    assert store.mask is not None and set(store.mask.slots) == set(biases)
    last_fix = recv_on.world.position_fixes[-1]
    for p in biases:
        assert store.correction_for(p, last_fix.receiver_timestamp) is not None
    assert set(last_fix.sbas_corrected) == set(biases)

    _, err_off = run(False)
    assert err_on < 2.0, f"corrected fix off by {err_on:.2f} m"
    assert err_off > 3.0, f"biases unexpectedly harmless ({err_off:.2f} m)"
    assert err_on < err_off / 2.5
