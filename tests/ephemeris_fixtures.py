"""Shared ephemeris fixtures: realistic broadcast orbits + their subframes.

``TEST_EPHEMERIDES`` hold GPS-like orbital elements (a ~ 26,560 km, e ~ 0.01,
i ~ 55 deg) spread in node/anomaly so that at the canonical test epoch
(t ~ 21600 s of week) at least four satellites are well-placed for a receiver
near London. ``subframes_for_ephemeris`` converts an ephemeris to transmitted
subframe payloads (ICD units + quantization), closing the encode->decode->
assemble loop the end-to-end tests rely on.
"""

from __future__ import annotations

import numpy as np

from gypsum_tpu.core.constants import GPS_PI
from gypsum_tpu.solve.ephemeris import Ephemeris


def _make_ephemeris(omega0, m0, omega=0.6, e=0.012, a_f0=1.2e-4) -> Ephemeris:
    return Ephemeris(
        sqrt_a=5153.65,
        eccentricity=e,
        i0=0.9617,  # ~55.1 deg
        omega0=omega0,
        omega=omega,
        m0=m0,
        delta_n=1.42e-09 * GPS_PI,
        idot=2.8e-10 * GPS_PI,
        omega_dot=-2.51e-09 * GPS_PI,
        cuc=-6.03e-06, cus=7.22e-06,
        crc=221.6875, crs=-115.15625,
        cic=-1.11e-08, cis=2.04e-08,
        t_oe=21600.0,
        a_f0=a_f0, a_f1=-3.6e-12, a_f2=0.0,
        t_oc=21600.0, t_gd=4.65e-09,
        week_number=250,
    )


# Node/anomaly spread chosen so SVs 1-4 are above the horizon for a London
# receiver at t ~ 21600 s (verified in tests/test_solver.py geometry).
TEST_EPHEMERIDES: list[Ephemeris] = [
    _make_ephemeris(omega0=-0.30, m0=0.40, a_f0=1.2e-4),
    _make_ephemeris(omega0=-0.90, m0=1.90, a_f0=-0.8e-4),
    _make_ephemeris(omega0=0.60, m0=0.60, a_f0=0.5e-4),
    _make_ephemeris(omega0=0.10, m0=1.10, omega=1.2, a_f0=2.0e-4),
    _make_ephemeris(omega0=-1.60, m0=2.70, a_f0=-1.5e-4),
    _make_ephemeris(omega0=1.00, m0=0.30, omega=0.2, a_f0=0.9e-4),
]


def subframes_for_ephemeris(eph: Ephemeris, iode: int = 87):
    """Subframe payloads carrying this ephemeris (ICD units, quantized)."""
    from gypsum_tpu.solve.ephemeris import subframes_from_ephemeris

    return subframes_from_ephemeris(eph, iode=iode)


def quantized_ephemeris(eph: Ephemeris) -> Ephemeris:
    """The ephemeris as a receiver would reassemble it after transmission."""
    from gypsum_tpu.solve.ephemeris import ephemeris_from_subframes

    sf1, sf2, sf3 = subframes_for_ephemeris(eph)
    return ephemeris_from_subframes(sf1, sf2, sf3)


def elevations_from(receiver_ecef: np.ndarray, t_sow: float) -> list[float]:
    """Elevation angle (deg) of each TEST_EPHEMERIDES satellite."""
    from gypsum_tpu.solve.ephemeris import satellite_position

    out = []
    up = receiver_ecef / np.linalg.norm(receiver_ecef)
    for eph in TEST_EPHEMERIDES:
        los = satellite_position(eph, t_sow) - receiver_ecef
        los = los / np.linalg.norm(los)
        out.append(float(np.degrees(np.arcsin(np.dot(los, up)))))
    return out
