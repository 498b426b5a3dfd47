"""Batched cold-start satellite acquisition."""

from gypsum_tpu.acquire.engine import AcquisitionEngine, AcquisitionResult  # noqa: F401
