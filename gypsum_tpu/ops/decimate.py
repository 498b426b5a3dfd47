"""FIR decimation / rational resampling front end.

The reference only accepts capture rates that are integer multiples of the
C/A code rate and never decimates (its 8x/16x HackRF inputs are declared but
unusable, reference: gypsum/radio_input.py:62-92,
antenna_sample_provider.py:27,134-135). This front end brings arbitrary SDR
rates down to the processing rate:

- integer-factor decimation (8.184 / 16.368 -> 2.046 Msps) as a strided
  convolution (``lax.conv_general_dilated`` with window strides — XLA maps it
  onto the TPU convolution path);
- rational resampling (e.g. 10 Msps -> 2.046 Msps = x1023/5000) as a single
  dilated+strided convolution (lhs_dilation = up, stride = down): the
  classic polyphase upfirdn expressed as one XLA op.

Filters are Kaiser-windowed sincs designed host-side at setup.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gypsum_tpu.core.planes import np_to_complex, to_planes


def design_lowpass(n_taps: int, cutoff: float, beta: float = 8.6) -> np.ndarray:
    """Kaiser-windowed sinc, cutoff as a fraction of Nyquist (0..1)."""
    if n_taps % 2 == 0:
        n_taps += 1
    m = np.arange(n_taps) - (n_taps - 1) / 2
    h = np.sinc(cutoff * m) * cutoff
    h *= np.kaiser(n_taps, beta)
    return (h / h.sum()).astype(np.float32)


def decimation_filter(factor: int, taps_per_phase: int = 12) -> np.ndarray:
    """Anti-alias filter for integer decimation by ``factor``."""
    return design_lowpass(factor * taps_per_phase + 1, cutoff=0.8 / factor)


def rational_filter(up: int, down: int, taps_per_phase: int = 10) -> np.ndarray:
    """Anti-alias/interpolation filter for up/down resampling. The gain is
    ``up`` so a constant input maps to a constant output."""
    n = max(up, down) * taps_per_phase + 1
    h = design_lowpass(n, cutoff=0.8 / max(up, down) * 1.0)
    return (h * up).astype(np.float32)


def _conv_strided(planes: jax.Array, taps: jax.Array, stride: int, lhs_dilation: int = 1) -> jax.Array:
    """Real-taps convolution of an I/Q-plane signal [N, 2], strided/dilated,
    'VALID'. The two planes ride the batch axis of one f32 convolution, and
    the device boundary stays float (core/planes.py: this environment's TPU
    backend cannot transfer complex64)."""
    t = taps[None, None, :]  # [out_ch, in_ch, T]
    v = planes.T[:, None, :]  # [2, 1, N] — planes as the conv batch dim
    y = jax.lax.conv_general_dilated(
        v, t,
        window_strides=(stride,),
        padding=[(0, 0)],  # 'VALID' (the string form rejects lhs_dilation)
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0]  # [2, M]
    return y.T  # [M, 2]


@functools.partial(jax.jit, static_argnames=("factor",))
def fir_decimate_planes(planes: jax.Array, taps: jax.Array, factor: int) -> jax.Array:
    """Filter + keep every ``factor``-th sample ('VALID': the first output
    corresponds to input index T-1). [N, 2] f32 -> [(N-T)//factor + 1, 2]."""
    return _conv_strided(planes, taps, stride=factor)


@functools.partial(jax.jit, static_argnames=("up", "down"))
def resample_rational_planes(planes: jax.Array, taps: jax.Array, up: int, down: int) -> jax.Array:
    """Polyphase rational resampler (upfirdn): zero-stuff by ``up``
    (lhs_dilation), filter, keep every ``down``-th output. [N, 2] f32 in/out."""
    return _conv_strided(planes, taps, stride=down, lhs_dilation=up)


def _host_cpu_device():
    """The streaming-IO wrappers below run on the host CPU backend: they sit
    in the sample-source read path (host-side by design — per-block tunnel
    round trips to the TPU would dwarf the filter math), and this
    environment's TPU runtime cannot execute-and-fetch the generic strided
    convolution anyway (UNIMPLEMENTED at fetch). For *bulk offline*
    decimation on the TPU, call ops/pallas_kernels.py:fir_decimate_pallas
    directly (validated compiled on v5e); no streaming path routes to it."""
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def fir_decimate(x, taps, factor: int) -> np.ndarray:
    """Host convenience wrapper: complex in, complex (numpy) out."""
    with jax.default_device(_host_cpu_device()):
        y = fir_decimate_planes(jnp.asarray(to_planes(x)), jnp.asarray(taps), factor)
        return np_to_complex(jax.device_get(y))


def resample_rational(x, taps, up: int, down: int) -> np.ndarray:
    """Host convenience wrapper: complex in, complex (numpy) out."""
    with jax.default_device(_host_cpu_device()):
        y = resample_rational_planes(jnp.asarray(to_planes(x)), jnp.asarray(taps), up, down)
        return np_to_complex(jax.device_get(y))
