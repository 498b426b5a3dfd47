"""Scan-based satellite tracking (Costas PLL + early/prompt/late DLL)."""

from gypsum_tpu.track.loop import TrackerBank, TrackState, TrackBlockOutputs  # noqa: F401
