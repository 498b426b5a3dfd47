"""Time-sharded streaming correlation with overlap-save halo exchange.

Long-capture sweeps (find every PRN appearance over minutes of signal, the
"replay farm" bench of BASELINE.json config 5) shard *signal time* across
devices: each device holds a contiguous run of 1 ms chunks. A correlation
window anchored in the last chunk of a shard extends one code period into the
next shard, so each device receives its right neighbor's first
``samples_per_prn`` samples via ``jax.lax.ppermute`` (collective permute over
ICI) before computing — the classic overlap-save boundary (SURVEY.md §5.7).

The correlation itself is *linear* (aperiodic) over a 2L window per chunk,
evaluated as a circular correlation of the zero-padded replica — exact for
every lag in [0, L), unlike per-chunk circular correlation which wraps the
chunk edge into itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def linear_replica_fft_conj(replica: np.ndarray) -> np.ndarray:
    """conj(FFT) of the replica zero-padded to 2L — the constant for
    overlap-save linear correlation."""
    length = replica.shape[-1]
    padded = np.concatenate([replica, np.zeros_like(replica)], axis=-1)
    return np.conj(np.fft.fft(padded)).astype(np.complex64)


def _chunk_linear_power(iq_ext: jax.Array, pfc2: jax.Array, length: int) -> jax.Array:
    """|linear correlation| for every chunk of a shard.

    iq_ext: [n_chunks * L + L] — the shard plus one code period of halo.
    Returns [n_chunks, L] float32: chunk i, lag s -> |sum_l iq[i*L + s + l] *
    replica[l]|.
    """
    from gypsum_tpu.ops.correlate import ifft_via_fft

    n_chunks = (iq_ext.shape[0] - length) // length
    windows = jnp.stack(
        [jax.lax.dynamic_slice(iq_ext, (i * length,), (2 * length,)) for i in range(n_chunks)]
    )  # [n_chunks, 2L]
    corr = ifft_via_fft(jnp.fft.fft(windows, axis=-1) * pfc2[None, :])
    return jnp.abs(corr[:, :length])


def time_sharded_correlation_power(
    mesh: Mesh,
    iq_planes: jax.Array,  # [n_chunks_total * L, 2] float32 I/Q planes
    replica: np.ndarray,  # [L] float32
) -> jax.Array:
    """[n_chunks_total, L] linear-correlation power, signal time sharded over
    the mesh's 'time' axis with ppermute halo exchange. The stream crosses the
    host->device boundary as float planes (core/planes.py)."""
    length = replica.shape[-1]
    n_time = mesh.shape["time"]
    total = iq_planes.shape[0]
    if total % (length * n_time):
        raise ValueError(
            f"stream of {total} samples must split into whole chunks across "
            f"{n_time} time shards"
        )
    from gypsum_tpu.core.planes import to_planes

    pfc2_planes = to_planes(linear_replica_fft_conj(replica))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(("sat", "time"), None),),
        out_specs=P(("sat", "time")),
    )
    def sweep(iq_local_planes):
        from gypsum_tpu.core.planes import to_complex

        iq_local = to_complex(iq_local_planes)
        pfc2 = to_complex(jnp.asarray(pfc2_planes))
        # Halo: first L samples of the *right* neighbor (wrapping at the end;
        # the final shard's last chunk correlates into the stream's wrap,
        # callers ignore it or pad the stream).
        n_shards = jax.lax.axis_size(("sat", "time"))
        perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        halo = jax.lax.ppermute(iq_local[:length], axis_name=("sat", "time"), perm=perm)
        ext = jnp.concatenate([iq_local, halo])
        return _chunk_linear_power(ext, pfc2, length)

    return sweep(iq_planes)
