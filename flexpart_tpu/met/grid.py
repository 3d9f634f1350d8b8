"""Meteorological grid description.

Runtime equivalent of the reference's compile-time grid state scattered over
par_mod.f90 / com_mod.f90 (nx, ny, nuvz, dx, dy, xlon0, ylat0, akz/bkz hybrid
coefficients, xglobal/nglobal/sglobal flags — filled by
/root/reference/src/gridcheck_ecmwf.f90:244-365,480-534).

Conventions (same as the reference):
  * level index 0 is the ground (the artificial 10m-wind level with
    akz=0, bkz=1, gridcheck_ecmwf.f90:510-516); levels increase upward;
  * particle x/y positions are in mother-grid units: x = (lon-xlon0)/dx;
  * for global grids nx = nxfield+1 (an extra cyclic column, xglobal).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..constants import PI, R_EARTH, SWITCHNORTH, SWITCHSOUTH


@dataclasses.dataclass(frozen=True)
class MetGrid:
    nx: int                 # grid points in x (incl. cyclic point if xglobal)
    ny: int
    nlev: int               # number of full levels incl. ground (= nuvz = nz)
    xlon0: float
    ylat0: float
    dx: float               # deg
    dy: float               # deg
    akm: np.ndarray         # (nlev,) interface ("half level") coeffs, bottom-up
    bkm: np.ndarray         # (nlev,)
    xglobal: bool = False
    pressure_levels: bool = False   # GFS: levels ARE pressures (akm=p, bkm=0,
    #                                 no artificial ground level;
    #                                 gridcheck_gfs.f90:441-495)

    def __post_init__(self):
        object.__setattr__(self, "akm", np.asarray(self.akm, np.float64))
        object.__setattr__(self, "bkm", np.asarray(self.bkm, np.float64))

    # --- full-level coefficients (gridcheck_ecmwf.f90:510-516) ---
    @functools.cached_property
    def akz(self) -> np.ndarray:
        if self.pressure_levels:
            return self.akm.copy()
        akz = np.empty(self.nlev)
        akz[0] = 0.0
        akz[1:] = 0.5 * (self.akm[1:] + self.akm[:-1])
        return akz

    @functools.cached_property
    def bkz(self) -> np.ndarray:
        if self.pressure_levels:
            return self.bkm.copy()
        bkz = np.empty(self.nlev)
        bkz[0] = 1.0
        bkz[1:] = 0.5 * (self.bkm[1:] + self.bkm[:-1])
        return bkz

    @property
    def nwz(self) -> int:
        return self.nlev

    @property
    def nxmin1(self) -> int:
        return self.nx - 1

    @property
    def nymin1(self) -> int:
        return self.ny - 1

    @property
    def nxfield(self) -> int:
        return self.nx - 1 if self.xglobal else self.nx

    # --- metric factors (gridcheck_ecmwf.f90:311-312) ---
    @property
    def dxconst(self) -> float:
        """m -> grid-units conversion in x at the equator [gu/m]."""
        return 180.0 / (self.dx * R_EARTH * PI)

    @property
    def dyconst(self) -> float:
        return 180.0 / (self.dy * R_EARTH * PI)

    # --- polar handling (gridcheck_ecmwf.f90:356-372) ---
    @property
    def nglobal(self) -> bool:
        return self.xglobal and (self.ylat0 + (self.ny - 1) * self.dy > 89.0)

    @property
    def sglobal(self) -> bool:
        return self.xglobal and (self.ylat0 < -89.0)

    @property
    def switchnorthg(self) -> float:
        return (SWITCHNORTH - self.ylat0) / self.dy if self.nglobal else 999999.0

    @property
    def switchsouthg(self) -> float:
        return (SWITCHSOUTH - self.ylat0) / self.dy if self.sglobal else -999999.0

    @functools.cached_property
    def lons(self) -> np.ndarray:
        return self.xlon0 + np.arange(self.nx) * self.dx

    @functools.cached_property
    def lats(self) -> np.ndarray:
        return self.ylat0 + np.arange(self.ny) * self.dy

    def lonlat_to_grid(self, lon, lat):
        """Geographic coords -> mother-grid units (coordtrafo.f90)."""
        x = (np.asarray(lon) - self.xlon0) / self.dx
        if self.xglobal:
            x = np.mod(x, self.nxmin1)
        return x, (np.asarray(lat) - self.ylat0) / self.dy

    def grid_to_lonlat(self, x, y):
        return self.xlon0 + np.asarray(x) * self.dx, self.ylat0 + np.asarray(y) * self.dy


def hybrid_coefficients(nlev: int, ptop: float = 10.0,
                        p0: float = 101325.0) -> tuple[np.ndarray, np.ndarray]:
    """Generate a plausible ECMWF-style hybrid sigma-pressure coordinate for
    synthetic met data: pure sigma near the ground blending to pure pressure
    at the top.  Interface pressure p_k = akm + bkm * ps, bottom-up."""
    s = np.linspace(1.0, 0.0, nlev) ** 1.7   # interface sigma, bottom-up
    bkm = np.clip(s, 0.0, 1.0) ** 1.3
    akm = (p0 - ptop) * (s - bkm) + ptop * (1.0 - bkm)
    akm[0] = 0.0
    bkm[0] = 1.0
    return akm, bkm
