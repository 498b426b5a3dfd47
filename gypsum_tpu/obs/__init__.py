"""Observability: metrics, per-satellite visualizers, web dashboard."""

from gypsum_tpu.obs.metrics import ReceiverMetrics  # noqa: F401
