"""Float32 I/Q-plane packing for every device boundary.

This environment's TPU backend cannot transfer complex64 buffers between host
and device in either direction (measured: an H2D upload of a complex64 array
raises UNIMPLEMENTED and poisons the runtime session). Complex math on device
is fine — only the *boundary* is restricted — so the framework's convention
is:

- everything crossing host<->device is float32 with a trailing I/Q axis of
  size 2 (``[..., 2]``);
- jitted programs call :func:`to_complex` on their inputs as the first step
  and split results with :func:`to_planes` as the last;
- closure constants follow the same rule (a complex64 numpy constant baked
  into a program is materialized through the same transfer path).

This costs nothing: ``lax.complex``/``real``/``imag`` are free layout ops
under XLA fusion, and float-plane I/O is what the TPU transfer path is
optimized for anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def to_planes(x) -> np.ndarray | jax.Array:
    """Complex [...] -> float32 [..., 2] (works on numpy and jax arrays)."""
    if isinstance(x, jax.Array):
        return jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1).astype(jnp.float32)
    x = np.asarray(x)
    return np.stack([x.real, x.imag], axis=-1).astype(np.float32)


def to_complex(planes: jax.Array) -> jax.Array:
    """Float32 [..., 2] -> complex64 [...] (device-side)."""
    return jax.lax.complex(planes[..., 0], planes[..., 1])


def dequantize_planes(planes: jax.Array, offset: float = 0.0) -> jax.Array:
    """[..., 2] planes of any dtype -> float32, minus the ADC bias.

    Integer captures (rtl-sdr uint8 @127.5, hackrf int8, int16) upload raw
    and dequantize ON DEVICE: host->device bandwidth is the scarce resource
    on this environment (~45 MB/s through the tunnel), so 1-byte words move
    4x faster than float32 planes. float32 input passes through untouched.
    """
    if planes.dtype == jnp.float32:
        return planes
    out = planes.astype(jnp.float32)
    if offset:
        out = out - jnp.float32(offset)
    return out


def np_to_complex(planes: np.ndarray) -> np.ndarray:
    """Float32 [..., 2] -> complex64 [...] (host-side numpy)."""
    planes = np.asarray(planes)
    return (planes[..., 0] + 1j * planes[..., 1]).astype(np.complex64)
