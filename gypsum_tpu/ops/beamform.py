"""Blind power-inversion CRPA beamforming (spatial jammer nulling).

GPS signals sit ~20 dB BELOW the thermal floor, so an antenna array's
spatial covariance R = E[x x^H] is noise + jammer only — the satellites are
invisible in it. Minimizing the array output power subject to a unit
response on the reference element,

    w = R^{-1} e_0 / (e_0^H R^{-1} e_0),

therefore steers nulls onto every above-the-floor interferer while leaving
the (sub-floor) satellite signals essentially untouched: the classic blind
CRPA "power inversion" beamformer — no steering vectors, no calibration, no
knowledge of the jammer needed. An N-element array nulls up to N-1
simultaneous jammers, including the BROADBAND kind the STFT spectral-mask
excision (ops/interference.py) cannot touch without erasing the GPS band.

The beamformed stream is an ordinary single-antenna capture: it feeds the
unchanged acquisition/tracking/decode stack (CLI: `acquire/replay
--beamform` on an [N, T] .npy array capture).

Compute shape: R is N x N from a ~10-100 ms snapshot (tiny); applying
w^H x to the stream is one [N] x [N, T] contraction — memory-bound, done
in chunks on host (numpy) or jitted (apply_weights_jax) when the stream is
already device-resident.

reference: no counterpart (gypsum is single-antenna by construction).
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-12


def spatial_covariance(x: np.ndarray, diagonal_loading: float = 0.02) -> np.ndarray:
    """R = x x^H / T over an [N, T] snapshot, with diagonal loading
    ``diagonal_loading * tr(R)/N``.

    The loading does two jobs: invertibility at short snapshots, and a
    null-depth floor — sources below ~the loading level relative to the
    total power are NOT worth a degree of freedom, so the minimizer leaves
    them (and w stays ~e_0, a transparent pass-through). Real GPS signals
    sit ~20 dB under the thermal floor and are untouchable at any loading;
    the 2% default also protects the hotter-than-life synthetic fixtures
    while costing a 26 dB jammer under 1 dB of null depth."""
    x = np.asarray(x)
    n, t = x.shape
    r = (x @ x.conj().T) / max(t, 1)
    return r + (diagonal_loading * np.trace(r).real / n) * np.eye(n)


def power_inversion_weights(
    r: np.ndarray, reference_element: int = 0
) -> np.ndarray:
    """Minimum-power weights with a distortionless constraint on the
    reference element. Returns w [N] complex128; output = w^H x."""
    n = r.shape[0]
    e0 = np.zeros(n, dtype=np.complex128)
    e0[reference_element] = 1.0
    ri = np.linalg.solve(np.asarray(r, np.complex128), e0)
    return ri / (e0.conj() @ ri + _EPS)


def apply_weights(x: np.ndarray, w: np.ndarray, chunk: int = 2_000_000) -> np.ndarray:
    """y[t] = sum_e conj(w[e]) x[e, t], chunked (x can be hundreds of MB)."""
    x = np.asarray(x)
    wc = np.conj(np.asarray(w, np.complex128)).astype(x.dtype)
    out = np.empty(x.shape[1], dtype=x.dtype)
    for lo in range(0, x.shape[1], chunk):
        hi = min(lo + chunk, x.shape[1])
        out[lo:hi] = wc @ x[:, lo:hi]
    return out


def apply_weights_jax(x, w):
    """Jitted contraction for device-resident array blocks ([N, T] f32 I/Q
    planes are fine too — split the complex weights likewise)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _apply(x_, wr, wi):
        # x_: [N, T, 2] float planes; w = wr + j wi. y = conj(w) . x.
        xr, xi = x_[..., 0], x_[..., 1]
        yr = jnp.einsum("n,nt->t", wr, xr) + jnp.einsum("n,nt->t", wi, xi)
        yi = jnp.einsum("n,nt->t", wr, xi) - jnp.einsum("n,nt->t", wi, xr)
        return jnp.stack([yr, yi], axis=-1)

    w = np.asarray(w, np.complex128)
    return _apply(x, np.real(w).astype(np.float32), np.imag(w).astype(np.float32))


def estimate_doa(
    r: np.ndarray,
    elements_enu: np.ndarray,
    n_sources: int | None = None,
    az_step_deg: float = 2.0,
    el_step_deg: float = 2.0,
    el_max_deg: float = 80.0,
    wavelength_m: float | None = None,
) -> list[tuple[float, float, float]]:
    """MUSIC direction-of-arrival of the above-floor interferers.

    Eigendecompose the (unloaded) spatial covariance; eigenvalues well above
    the noise cluster count the sources, their orthogonal complement is the
    noise subspace E_n, and the MUSIC pseudospectrum
    ``P(az, el) = 1 / |E_n^H a(az, el)|^2`` peaks where a steering vector is
    orthogonal to it. Returns up to ``n_sources`` (auto from the eigen-gap
    when None) peaks as (azimuth_deg, elevation_deg, power_db), strongest
    first — so an interference/spoofing alert can carry a BEARING, not just
    a detection (reference: no counterpart at any level).

    A planar (horizontal) array cannot resolve the sign of elevation and
    blurs elevation near zenith; azimuth is the robust coordinate."""
    from gypsum_tpu.signal.array import L1_WAVELENGTH_M, direction_enu

    lam = wavelength_m or L1_WAVELENGTH_M
    elements = np.asarray(elements_enu, np.float64)
    n = r.shape[0]
    vals, vecs = np.linalg.eigh(np.asarray(r, np.complex128))
    floor = np.median(vals.real)
    k = int(np.sum(vals.real > 10.0 * floor)) if n_sources is None else n_sources
    k = max(0, min(k, n - 1))
    if k == 0:
        return []
    e_noise = vecs[:, : n - k]  # eigh sorts ascending

    azs = np.arange(0.0, 360.0, az_step_deg)
    els = np.arange(0.0, el_max_deg + 1e-9, el_step_deg)
    spec = np.empty((len(azs), len(els)))
    for i, az in enumerate(azs):
        for j, el in enumerate(els):
            a = np.exp(2j * np.pi * (elements @ direction_enu(az, el)) / lam)
            a /= np.sqrt(n)
            denom = np.sum(np.abs(e_noise.conj().T @ a) ** 2)
            spec[i, j] = 1.0 / max(denom, _EPS)

    peaks: list[tuple[float, float, float]] = []
    flat = spec.copy()
    for _ in range(k):
        i, j = np.unravel_index(np.argmax(flat), flat.shape)
        peaks.append((float(azs[i]), float(els[j]), float(10 * np.log10(spec[i, j]))))
        # Exclude a neighborhood around the taken peak (wraparound az).
        d_az = np.abs((azs[:, None] - azs[i] + 180.0) % 360.0 - 180.0)
        d_el = np.abs(els[None, :] - els[j])
        flat[(d_az < 20.0) & (d_el < 20.0)] = 0.0
    return peaks


def null_jammers(
    x: np.ndarray,
    snapshot_samples: int = 65536,
    diagonal_loading: float = 0.02,
    reference_element: int = 0,
) -> tuple[np.ndarray, np.ndarray, float]:
    """One-call CRPA front end: estimate R from the stream's head, form the
    power-inversion weights, apply to the whole stream.

    Returns (y [T], w [N], suppression_db) — suppression is the output vs
    reference-element excess-power ratio over the snapshot (0 dB means no
    above-floor interferer was present)."""
    x = np.asarray(x)
    snap = x[:, : min(snapshot_samples, x.shape[1])]
    r = spatial_covariance(snap, diagonal_loading)
    w = power_inversion_weights(r, reference_element)
    y = apply_weights(x, w)
    p_ref = float(np.mean(np.abs(snap[reference_element]) ** 2))
    p_out = float(np.mean(np.abs(y[: snap.shape[1]]) ** 2))
    suppression_db = 10.0 * np.log10(max(p_ref, _EPS) / max(p_out, _EPS))
    return y, w, suppression_db
