"""Receiver checkpoint / resume.

The reference has no persistence: every run cold-starts from acquisition
(SURVEY.md §5 "Checkpoint/resume: none"). Here the complete receiver state —
tracking loop filters (host-resident numpy), navigation pipelines (bit/frame
sync), the world model (ephemerides, time bases, clock slide), and the
acquisition schedule — serializes to a single file, so long replays can stop
and resume mid-stream and a warmed receiver can re-lock instantly on
restart.

Format: a gzip'd pickle of a versioned dict. Pickle is acceptable here
because checkpoints are local artifacts produced and consumed by the same
framework version (guarded by an explicit version tag).
"""

from __future__ import annotations

import gzip
import pickle
from pathlib import Path

# Version history:
#   1 — initial format.
#   2 — WorldModel gained the almanac store; _SatelliteRecord gained
#       doppler_hz / smoothed_delay_s / smoothing_depth. A v1 checkpoint
#       would unpickle but crash later with AttributeError, so the version
#       gate rejects it cleanly instead.
#   3 — WorldModel gained the navigation EKF (_ekf, solve/ekf.py) and
#       ReceiverSolution the ``kind`` field.
#   4 — SBAS support: _SatelliteRecord gained ``geo`` (MT9 GEO navigation)
#       and _ChannelPipeline gained ``sbas`` (the DO-229 frame decoder).
#   5 — _SatelliteRecord gained ``cn0_dbhz`` (C/N0-weighted integrity).
#   6 — WorldModel gained ``sbas_corrections`` (MT1/MT2-5 fast-correction
#       store, solve/sbas_corrections.py); _SatelliteRecord gained
#       ``orbit_version`` + the per-record position/clock memo fields;
#       SolverConfig gained the SBAS-correction and geometry-reseed knobs.
#   7 — WorldModel gained assisted-GNSS state (``assist_time_origin_sow``).
#   8 — TrackState (bank_state) gained ``carrier_offset`` (GLONASS FDMA
#       sub-band offsets); a v7 bank_state would unpickle into the wrong
#       NamedTuple shape, so the gate rejects it.
#   9 — Vector coast: _ChannelPipeline gained ``last_good`` /
#       ``coast_started`` / ``coast_anchor`` and _SatelliteRecord gained
#       ``coasting`` (runtime/receiver.py, TrackingConfig.coast_*).
#  10 — Deep-integration coast measurements: _ChannelPipeline gained
#       ``coast_measured_at`` and _SatelliteRecord gained ``deep_ranging``
#       (track/deepmeas.py, TrackingConfig.coast_deep_measurement).
#  11 — Hardened deep-measurement gate: _ChannelPipeline gained
#       ``deep_candidate_hz`` / ``deep_streak`` (multi-block confirmation)
#       and ReceiverSolution gained ``raim`` (chi-square fault detection,
#       solve/integrity.py:raim_residual_test).
#  12 — GLONASS L2OF dual-frequency: _SatelliteRecord gained the ``l2_*``
#       measured-iono fields (solve/world_multiconstellation.py
#       handle_glonass_l2_block) and SolverConfig the dual_frequency_iono
#       knobs.
#  13 — FDMA cross-channel ghost veto: _SatelliteRecord gained
#       ``glonass_ghost`` (slot-collision arbitration,
#       world_multiconstellation._flag_glonass_ghosts); dual-band
#       checkpoints (``dual_bands`` blob) also landed in this version.
CHECKPOINT_VERSION = 13


def _band_blob(receiver) -> dict:
    """Per-band snapshot fields (everything but the shared world)."""
    if receiver.bank.pending_blocks:
        raise RuntimeError(
            f"{receiver.bank.pending_blocks} tracking block(s) still in "
            "flight; drain the pipeline before checkpointing"
        )
    receiver.bank.sync_host_state()
    return {
        # Excludes any undispatched read-ahead block (async_upload): it is
        # simply re-read after resume.
        "stream_seconds": receiver.stream_position_s,
        "bank_state": receiver.bank.state,
        "slot_prn": list(receiver.bank.slot_prn),
        "eligible_prns": set(receiver.eligible_prns),
        "pipelines": receiver.pipelines,
        "last_scan_time": receiver._last_scan_time,
        "subframe_count": receiver.subframe_count,
    }


def _restore_band(receiver, blob: dict) -> float:
    outside = [
        p for p in blob["slot_prn"]
        if p is not None and p not in receiver.bank._prn_row
    ]
    if outside:
        raise ValueError(
            f"checkpoint tracks PRN(s) {outside} outside this receiver's "
            "family — construct the Receiver with eligible_prns covering them"
        )
    receiver.bank.state = blob["bank_state"]
    receiver.bank.invalidate_device_state()
    receiver.bank.slot_prn = blob["slot_prn"]
    receiver.eligible_prns = blob["eligible_prns"]
    receiver.pipelines = blob["pipelines"]
    receiver._last_scan_time = blob["last_scan_time"]
    receiver.subframe_count = blob["subframe_count"]
    return float(blob["stream_seconds"])


def save_checkpoint(receiver, path: str | Path) -> None:
    """Snapshot a Receiver (runtime/receiver.py) to ``path``.

    The caller must have drained the tracking pipeline (Receiver.run does);
    a checkpoint taken with blocks in flight would otherwise skip their
    samples on resume."""
    blob = {
        "version": CHECKPOINT_VERSION,
        **_band_blob(receiver),
        "world": receiver.world,
    }
    with gzip.open(path, "wb") as f:
        pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)


#: DualBandReceiver attribute name per band key in a dual checkpoint.
_DUAL_BANDS = ("gps", "glonass", "glonass_l2")


def save_dual_checkpoint(dual, path: str | Path) -> None:
    """Snapshot a DualBandReceiver: one per-band blob each (same contents
    as a single-band checkpoint) plus the SHARED world model exactly once
    (the bands' ``world`` references are re-tied on load)."""
    bands = {
        name: _band_blob(getattr(dual, name))
        for name in _DUAL_BANDS
        if getattr(dual, name, None) is not None
    }
    blob = {
        "version": CHECKPOINT_VERSION,
        "dual_bands": bands,
        "world": dual.world,
    }
    with gzip.open(path, "wb") as f:
        pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_dual_checkpoint(dual, path: str | Path) -> dict[str, float]:
    """Restore a dual checkpoint into a freshly constructed
    DualBandReceiver with the same band set. Returns the per-band stream
    positions; the caller fast-forwards each band's source."""
    with gzip.open(path, "rb") as f:
        blob = pickle.load(f)
    if blob["version"] != CHECKPOINT_VERSION:
        raise ValueError(
            f"checkpoint version {blob['version']} != {CHECKPOINT_VERSION}"
        )
    if "dual_bands" not in blob:
        raise ValueError("not a dual-band checkpoint (use load_checkpoint)")
    have = {n for n in _DUAL_BANDS if getattr(dual, n, None) is not None}
    if have != set(blob["dual_bands"]):
        raise ValueError(
            f"checkpoint bands {sorted(blob['dual_bands'])} != receiver "
            f"bands {sorted(have)}"
        )
    out: dict[str, float] = {}
    for name, band_blob in blob["dual_bands"].items():
        out[name] = _restore_band(getattr(dual, name), band_blob)
    dual.world = blob["world"]
    for name in have:
        getattr(dual, name).world = blob["world"]
    return out


def load_checkpoint(receiver, path: str | Path) -> float:
    """Restore a snapshot into a freshly constructed Receiver whose source is
    positioned at (or seekable to) the checkpoint's stream position.

    Returns the stream timestamp the checkpoint was taken at; the caller is
    responsible for fast-forwarding the sample source to it (sources are
    sequential, matching the reference's cursor model).
    """
    with gzip.open(path, "rb") as f:
        blob = pickle.load(f)
    if blob["version"] != CHECKPOINT_VERSION:
        raise ValueError(f"checkpoint version {blob['version']} != {CHECKPOINT_VERSION}")
    if "dual_bands" in blob:
        raise ValueError(
            "dual-band checkpoint: restore through load_dual_checkpoint"
        )
    seconds = _restore_band(receiver, blob)
    receiver.world = blob["world"]
    return seconds


def fast_forward(source, seconds: float, chunk_ms: int = 1000) -> None:
    """Advance a sequential source to ``seconds`` (whole-ms resolution)."""
    remaining_ms = int(round((seconds - source.seconds_consumed) * 1000))
    while remaining_ms > 0:
        step = min(chunk_ms, remaining_ms)
        source.read_block(step)
        remaining_ms -= step
