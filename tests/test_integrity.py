"""Protection-level (RAIM integrity) tests — solve/integrity.py."""

import numpy as np
import pytest

from gypsum_tpu.solve.geodesy import lla_to_ecef
from gypsum_tpu.solve.integrity import (
    K_H_NPA,
    K_V,
    protection_levels,
    ura_index_to_sigma_m,
)

RX = lla_to_ecef(51.5, -0.1, 80.0)


def _sat_at(el_deg: float, az_deg: float, r: float = 22_000e3) -> np.ndarray:
    """A satellite placed at the given look angles from RX."""
    up = RX / np.linalg.norm(RX)
    east = np.cross([0.0, 0.0, 1.0], up)
    east /= np.linalg.norm(east)
    north = np.cross(up, east)
    el, az = np.deg2rad(el_deg), np.deg2rad(az_deg)
    los = (
        np.cos(el) * np.sin(az) * east
        + np.cos(el) * np.cos(az) * north
        + np.sin(el) * up
    )
    return RX + r * los


GOOD_GEOMETRY = [
    _sat_at(75, 0), _sat_at(40, 60), _sat_at(35, 150),
    _sat_at(45, 230), _sat_at(30, 310),
]


def test_ura_table():
    assert ura_index_to_sigma_m(0) == 2.4
    assert ura_index_to_sigma_m(6) == 24.0
    assert ura_index_to_sigma_m(15) == float("inf")
    assert ura_index_to_sigma_m(99) == float("inf")


def test_protection_levels_basic():
    sat = np.array(GOOD_GEOMETRY)
    pl = protection_levels(sat, RX, np.full(len(sat), 2.5))
    assert pl is not None
    # Good 5-SV geometry: HPL within k_h * sigma * (a small HDOP factor).
    assert 0.0 < pl["hpl_m"] < K_H_NPA * 2.5 * 4.0
    assert 0.0 < pl["vpl_m"] < K_V * 2.5 * 6.0
    # Vertical is the weaker axis for ground receivers (no satellites below).
    assert pl["sigma_up_m"] > pl["sigma_major_m"] * 0.7


def test_hpl_scales_linearly_with_sigma():
    sat = np.array(GOOD_GEOMETRY)
    a = protection_levels(sat, RX, np.full(len(sat), 1.0))
    b = protection_levels(sat, RX, np.full(len(sat), 3.0))
    np.testing.assert_allclose(b["hpl_m"], 3.0 * a["hpl_m"], rtol=1e-9)
    np.testing.assert_allclose(b["vpl_m"], 3.0 * a["vpl_m"], rtol=1e-9)


def test_more_satellites_tighten_the_bound():
    base = np.array(GOOD_GEOMETRY[:4])
    more = np.array(GOOD_GEOMETRY + [_sat_at(60, 120), _sat_at(55, 260)])
    a = protection_levels(base, RX, np.full(4, 2.5))
    b = protection_levels(more, RX, np.full(len(more), 2.5))
    assert b["hpl_m"] < a["hpl_m"]
    assert b["vpl_m"] < a["vpl_m"]


def test_weighting_downweights_a_coarse_satellite():
    # One satellite with URA-grade sigma barely moves the bound relative to
    # trusting it at GPS precision.
    sat = np.array(GOOD_GEOMETRY + [_sat_at(25, 180, r=38_000e3)])
    trusted = protection_levels(sat, RX, np.full(len(sat), 2.5))
    coarse = np.array([2.5] * 5 + [24.0])
    weighted = protection_levels(sat, RX, coarse)
    without = protection_levels(np.array(GOOD_GEOMETRY), RX, np.full(5, 2.5))
    # The coarse satellite still helps a little, but cannot be counted on as
    # much as a precise one.
    assert trusted["hpl_m"] <= weighted["hpl_m"] <= without["hpl_m"] * 1.001


def test_degenerate_geometry_returns_none():
    # All satellites in one plane through the receiver: normal matrix is
    # singular (or numerically explosive) — must not report a finite bound.
    sat = np.array([_sat_at(0.0, az) for az in (0, 90, 180, 270)])
    pl = protection_levels(sat, RX, np.full(4, 2.5))
    assert pl is None or pl["vpl_m"] > 1e6


def test_invalid_sigma_rejected():
    sat = np.array(GOOD_GEOMETRY)
    assert protection_levels(sat, RX, np.array([2.5, 2.5, 2.5, 2.5, np.inf])) is None
    assert protection_levels(sat[:3], RX, np.full(3, 2.5)) is None


def test_fix_carries_protection_levels():
    # The world model attaches HPL/VPL to every least-squares fix (e2e scenes
    # assert the same field; this pins the sigma routing incl. SBAS URA).
    from gypsum_tpu.core.config import SolverConfig
    from gypsum_tpu.nav.sbas import GeoNavigationMessage
    from gypsum_tpu.solve.world import WorldModel

    wm = WorldModel(SolverConfig())
    sat = np.array(GOOD_GEOMETRY)
    sig = np.full(len(sat), wm.config.pseudorange_sigma_m)
    pl = protection_levels(sat, RX, sig)
    assert pl["hpl_m"] < 60.0  # conservative default sigma, good geometry


# ------------------------------------------------- RAIM chi-square detection


def test_raim_consistent_residuals_pass():
    from gypsum_tpu.solve.integrity import raim_residual_test

    sat = np.array([_sat_at(60, 0), _sat_at(40, 90), _sat_at(35, 200),
                    _sat_at(55, 300), _sat_at(20, 150)])
    res = np.array([1.0, -2.0, 0.5, 1.5, -1.0])  # ~sigma-level residuals
    out = raim_residual_test(sat, RX, res, np.full(5, 2.5))
    assert out is not None and out["ok"], out
    assert out["dof"] == 1.0


def test_raim_inconsistent_residuals_fail_and_scale():
    from gypsum_tpu.solve.integrity import raim_residual_test

    sat = np.array([_sat_at(60, 0), _sat_at(40, 90), _sat_at(35, 200),
                    _sat_at(55, 300), _sat_at(20, 150), _sat_at(70, 250)])
    res = np.array([300.0, -500.0, 200.0, 150.0, -400.0, 100.0])  # km-fade junk
    out = raim_residual_test(sat, RX, res, np.full(6, 2.5))
    assert out is not None and not out["ok"], out
    # The sigma re-scale must be large enough that scaled protection levels
    # bound ~hundreds-of-meters errors (sqrt(SSE/dof) ~ RMS/sigma).
    assert out["sigma_scale"] > 50.0, out


def test_raim_needs_redundancy():
    from gypsum_tpu.solve.integrity import raim_residual_test

    sat = np.array([_sat_at(60, 0), _sat_at(40, 90), _sat_at(35, 200),
                    _sat_at(55, 300)])
    assert raim_residual_test(sat, RX, np.zeros(4), np.full(4, 2.5)) is None
