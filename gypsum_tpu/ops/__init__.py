"""Device compute kernels: batched FFT and circulant-matmul correlation, Pallas kernels, decimation."""

from gypsum_tpu.ops.correlate import (  # noqa: F401
    circular_correlate,
    doppler_wipeoff,
    lag_window_correlate,
    noncoherent_acquisition_sweep,
)
