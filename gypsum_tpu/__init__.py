"""gypsum_tpu — a TPU-native GPS L1 C/A software-defined-radio receiver framework.

A from-scratch re-design of the capabilities of the reference receiver
(codyd51/gypsum, mounted at /root/reference) for JAX/XLA/Pallas on TPU:

- ``signal``   : C/A PRN code generation (vectorized LFSR), replica resampling,
                 and a physically-consistent synthetic IQ signal generator.
- ``io``       : streaming IQ sample sources (file-backed w/ native C++ reader,
                 synthetic, in-memory) and the input registry.
- ``ops``      : device compute kernels — batched FFT circular correlation,
                 circulant-matmul correlation (MXU), lag-window correlators, FIR/polyphase
                 decimation.
- ``acquire``  : one-shot batched acquisition over the full
                 [satellite x Doppler x code-phase] grid with static
                 coarse->fine refinement and phase-slope Doppler interpolation.
- ``track``    : scan-based Costas PLL + early/prompt/late DLL tracking loops,
                 vmapped over satellite channels, processing block-sized chunks
                 per device dispatch.
- ``nav``      : host-side navigation layers — pseudosymbol->bit integration,
                 subframe framing, IS-GPS-200 field parsing + parity, and a
                 nav-message *encoder* used to build test fixtures.
- ``solve``    : ephemeris store, Kepler/ECEF orbit propagation, SV clock
                 correction, pseudoranges, Newton position solver, geodesy.
- ``parallel`` : device-mesh sharding — sharded acquisition grids, overlap-save
                 time-sharded streaming correlation with halo exchange.
- ``runtime``  : the receiver orchestrator (block-based master loop,
                 acquisition scheduling, drop/reacquire state machine).
- ``obs``      : metrics, per-satellite tracking dashboards, web dashboard.

Reference parity notes are cited throughout as ``reference: <file>:<lines>``
(paths relative to the reference repo root).
"""

__version__ = "0.1.0"

from gypsum_tpu.core import constants  # noqa: F401


def __getattr__(name):
    """Lazy top-level API (keeps ``import gypsum_tpu`` light — jax and the
    submodule graph load only when first touched)."""
    lazy = {
        "Receiver": ("gypsum_tpu.runtime.receiver", "Receiver"),
        "ReceiverConfig": ("gypsum_tpu.core.config", "ReceiverConfig"),
        "AcquisitionEngine": ("gypsum_tpu.acquire.engine", "AcquisitionEngine"),
        "TrackerBank": ("gypsum_tpu.track.loop", "TrackerBank"),
        "WorldModel": ("gypsum_tpu.solve.world", "WorldModel"),
        "FileSampleSource": ("gypsum_tpu.io.sources", "FileSampleSource"),
        "ArraySampleSource": ("gypsum_tpu.io.sources", "ArraySampleSource"),
        "DecimatingSampleSource": ("gypsum_tpu.io.sources", "DecimatingSampleSource"),
        "RecordingInfo": ("gypsum_tpu.io.sources", "RecordingInfo"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'gypsum_tpu' has no attribute {name!r}")
