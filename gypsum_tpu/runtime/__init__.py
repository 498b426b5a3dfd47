"""Receiver orchestration: the block-based master loop."""

from gypsum_tpu.runtime.receiver import Receiver, BlockReport  # noqa: F401
