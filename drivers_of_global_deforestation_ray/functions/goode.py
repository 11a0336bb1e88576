"""Interrupted Goode homolosine (igh) forward/inverse transform, from scratch.

The reference's analysis grid lives in ``+proj=igh`` meters
(``Supplemental_Data_1.R:66-70``: extent x [-20037506.5671, 20042493.4328],
y [-8683205.0209, 8686794.9791], 1737x4008 10-km cells).  This module maps a
real (lat, lon) into that plane — and back — so geographic points place into
the reference's grid with its lobes and interruptions, not a linear
equirectangular stand-in.

Construction (Goode 1925 / Snyder, "Map Projections — A Working Manual",
USGS PP 1395, and the public PROJ ``igh`` composition), spherical model
R = 6378137 m (WGS84 semi-major; PROJ's igh treats the datum spherically):

- For ``|lat| <= 40d44'11.8"`` (the latitude where sinusoidal and Mollweide
  scale match): **sinusoidal** within the lobe,
  ``x = R*(cm + (lon-cm)*cos(phi))``, ``y = R*phi``.
- Poleward: **Mollweide** within the lobe, ``2t + sin(2t) = pi*sin(phi)``
  solved by Newton, ``x = R*(cm + C_MOLL*(lon-cm)*cos(t))``,
  ``y = R*(sqrt(2)*sin(t) -/+ Y_OFF)`` — ``Y_OFF`` shifts the Mollweide
  sheet so the two families meet continuously at the boundary parallel.
- Six interrupted lobes with central meridians: north (split at lon -40deg):
  -100, +30; south (splits at -100, -20, +80): -160, -60, +20, +140.

Every arithmetic step is a plain IEEE double op in a fixed order, and the
Newton solve is a FIXED 15-iteration branchless loop (step clipped to
±0.25 rad as a pole-overshoot safeguard), so a DuckDB SQL oracle can
replicate the computation operation-for-operation (see
``pipelines/queries.py`` ``goode_tiles``); outputs compared after rounding
to whole meters, absorbing cross-libm sin/cos ulp differences.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "R_SPHERE",
    "PHI_BOUND",
    "Y_OFF",
    "C_MOLL",
    "NEWTON_ITERS",
    "moll_theta",
    "igh_forward",
    "igh_inverse",
]

R_SPHERE = 6378137.0
# 40d44'11.8" — boundary parallel where sinusoidal and Mollweide meet
PHI_BOUND = (40.0 + 44.0 / 60.0 + 11.8 / 3600.0) * (np.pi / 180.0)
C_MOLL = 2.0 * np.sqrt(2.0) / np.pi  # Mollweide x scale
NEWTON_ITERS = 15


def moll_theta(phi: np.ndarray, n_iter: int = NEWTON_ITERS) -> np.ndarray:
    """Solve ``2t + sin(2t) = pi*sin(phi)`` — fixed-iteration branchless
    Newton from ``t0 = phi`` with the step clipped to ±0.25 rad (the
    derivative ``2 + 2cos(2t)`` vanishes at the poles; the clip prevents
    overshoot there without a data-dependent branch, keeping the SQL oracle
    an exact operation-for-operation twin)."""
    phi = np.asarray(phi, dtype=np.float64)
    target = np.pi * np.sin(phi)
    t = phi.copy()
    for _ in range(n_iter):
        step = (2.0 * t + np.sin(2.0 * t) - target) / (2.0 + 2.0 * np.cos(2.0 * t))
        t = t - np.minimum(np.maximum(step, -0.25), 0.25)
    return t


# Mollweide y at the boundary parallel minus sinusoidal y there (radians):
# shifts the Mollweide sheets so the families join continuously.
Y_OFF = float(np.sqrt(2.0) * np.sin(moll_theta(np.asarray([PHI_BOUND]), 60))[0] - PHI_BOUND)


def _central_meridians(lat_deg: np.ndarray, lon_like_deg: np.ndarray) -> np.ndarray:
    """Lobe central meridian (degrees) from hemisphere + longitude-like
    coordinate (true longitude on forward; x/R in degrees on inverse — the
    interruption gaps make that unambiguous)."""
    north = lat_deg >= 0.0
    cm_n = np.where(lon_like_deg < -40.0, -100.0, 30.0)
    cm_s = np.select(
        [lon_like_deg < -100.0, lon_like_deg < -20.0, lon_like_deg < 80.0],
        [-160.0, -60.0, 20.0],
        140.0,
    )
    return np.where(north, cm_n, cm_s)


def igh_forward(
    lat_deg: np.ndarray, lon_deg: np.ndarray, n_iter: int = NEWTON_ITERS
) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) degrees -> interrupted-Goode (x, y) meters.  Vectorized;
    fixed IEEE op order (SQL-oracle-reproducible)."""
    lat_deg = np.asarray(lat_deg, dtype=np.float64)
    lon_deg = np.asarray(lon_deg, dtype=np.float64)
    phi = lat_deg * (np.pi / 180.0)
    lam = lon_deg * (np.pi / 180.0)
    cm_deg = _central_meridians(lat_deg, lon_deg)
    cm = cm_deg * (np.pi / 180.0)
    dl = lam - cm
    # sinusoidal branch
    x_s = R_SPHERE * (cm + dl * np.cos(phi))
    y_s = R_SPHERE * phi
    # Mollweide branch
    t = moll_theta(phi, n_iter)
    x_m = R_SPHERE * (cm + C_MOLL * dl * np.cos(t))
    y_m = R_SPHERE * (np.sqrt(2.0) * np.sin(t) - np.sign(phi) * Y_OFF)
    moll = np.abs(phi) >= PHI_BOUND
    return np.where(moll, x_m, x_s), np.where(moll, y_m, y_s)


def igh_inverse(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) meters -> (lat, lon) degrees.  Exact closed form per zone
    (arcsin inversions; no iteration).  Points inside an interruption gap
    belong to no lobe; they resolve to the nearest lobe's meridian math
    (same convention as PROJ) — roundtrip validity holds for every (x, y)
    produced by :func:`igh_forward`."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    xr = x / R_SPHERE
    yr = y / R_SPHERE
    lat_like = np.where(y >= 0.0, 1.0, -1.0)
    cm_deg = _central_meridians(lat_like, xr * (180.0 / np.pi))
    cm = cm_deg * (np.pi / 180.0)
    moll = np.abs(yr) >= PHI_BOUND
    # sinusoidal inverse
    phi_s = yr
    with np.errstate(divide="ignore", invalid="ignore"):
        lam_s = cm + (xr - cm) / np.cos(phi_s)
        # Mollweide inverse
        yy = yr + np.sign(yr) * Y_OFF
        st = np.minimum(np.maximum(yy / np.sqrt(2.0), -1.0), 1.0)
        t = np.arcsin(st)
        s2 = (2.0 * t + np.sin(2.0 * t)) / np.pi
        phi_m = np.arcsin(np.minimum(np.maximum(s2, -1.0), 1.0))
        lam_m = cm + (xr - cm) / (C_MOLL * np.cos(t))
    phi = np.where(moll, phi_m, phi_s)
    lam = np.where(moll, lam_m, lam_s)
    return phi * (180.0 / np.pi), lam * (180.0 / np.pi)
