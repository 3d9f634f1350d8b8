"""OH-radical chemistry: first-order mass loss against an OH climatology.

Re-design of the reference OH stack: readOHfield.f90 (binary monthly
3-D OH climatology + monthly-mean J(O1D) photolysis rates),
gethourlyOH.f90 (hourly correction of the monthly field by the ratio of
instantaneous to monthly-mean photolysis rate), zenithangle.f90 /
photo_O1D.f90 (solar geometry + J(O1D) lookup), and ohreaction.f90
(Arrhenius rate k = C * T^N * exp(-D/T) * [OH], applied per particle).

The hourly correction is computed for the WHOLE OH grid in one jitted
call (the reference loops nxOH*nyOH*nzOH scalar function calls,
gethourlyOH.f90:66-93); the per-particle reaction is one gather over the
particle axis.  A synthetic climatology generator stands in for the
external OH_variables.bin when it is unavailable.
"""

from __future__ import annotations

import dataclasses
from datetime import datetime, timedelta

import jax
import jax.numpy as jnp
import numpy as np

PI = np.pi

# J(O1D) photolysis lookup (photo_O1D.f90)
ZANGLE = np.array([0., 10., 20., 30., 40., 50., 60., 70., 78., 86.,
                   90.0001], np.float64)
FACT_PHOTO = np.array([0.4616e-2, 0.4478e-2, 0.4131e-2, 0.3583e-2,
                       0.2867e-2, 0.2081e-2, 0.1235e-2, 0.5392e-3,
                       0.2200e-3, 0.1302e-3, 0.0902e-3], np.float64)


def zenith_angle(ylat, xlon, when: datetime):
    """Solar zenith angle [deg] (zenithangle.f90), vectorized over
    lat/lon arrays."""
    mm, dd = when.month, when.day
    ndaynum = 31 * (mm - 1) + dd
    if mm > 2:
        ndaynum -= int(0.4 * mm + 2.3)
        if when.year % 4 == 0:
            ndaynum += 1
    rnum = 2.0 * PI * ndaynum / 365.0
    rylat = PI * ylat / 180.0
    ttime = when.hour + when.minute / 60.0
    dekl = (0.396 + 3.631 * np.sin(rnum) + 0.038 * np.sin(2 * rnum)
            + 0.077 * np.sin(3 * rnum) - 22.97 * np.cos(rnum)
            - 0.389 * np.cos(2 * rnum) - 0.158 * np.cos(3 * rnum))
    rdekl = PI * dekl / 180.0
    eq = (0.003 - 7.343 * np.sin(rnum) - 9.47 * np.sin(2 * rnum)
          - 0.329 * np.sin(3 * rnum) - 0.196 * np.sin(4 * rnum)
          + 0.552 * np.cos(rnum) - 3.020 * np.cos(2 * rnum)
          - 0.076 * np.cos(3 * rnum) - 0.125 * np.cos(4 * rnum)) / 60.0
    sinsol = np.sin(rylat) * np.sin(rdekl) + np.cos(rylat) * np.cos(rdekl) \
        * np.cos((ttime - 12.0 + xlon / 15.0 + eq) * PI / 12.0)
    return 90.0 - np.degrees(np.arcsin(np.clip(sinsol, -1.0, 1.0)))


def photo_o1d(sza):
    """J(O1D) photolysis rate from zenith angle [deg] (photo_O1D.f90),
    vectorized: log-interpolation in secant of the zenith angle."""
    sza = np.asarray(sza, np.float64)
    szac = np.clip(sza, 0.0, 89.9999)
    ik = np.clip(np.searchsorted(ZANGLE, szac, side="right") - 1, 0,
                 len(ZANGLE) - 2)
    z1 = 1.0 / np.cos(np.deg2rad(ZANGLE[ik]))
    z2 = 1.0 / np.cos(np.deg2rad(ZANGLE[ik + 1]))
    zg = 1.0 / np.cos(np.deg2rad(szac))
    frac = (zg - z1) / (z2 - z1)
    f1 = np.log(FACT_PHOTO[ik])
    f2 = np.log(FACT_PHOTO[ik + 1])
    photo_no2 = 1.45e-2 * np.exp(-0.4 / np.cos(np.deg2rad(szac)))
    out = photo_no2 * np.exp(f1 + (f2 - f1) * frac)
    return np.where(sza < 90.0, out, 0.0)


@dataclasses.dataclass
class OHField:
    """Monthly OH climatology + monthly-mean J(O1D) (oh_mod.f90)."""
    lon: np.ndarray          # (nxOH,)
    lat: np.ndarray          # (nyOH,)
    alt: np.ndarray          # (nzOH,) level-center heights [m]
    oh: np.ndarray           # (nxOH, nyOH, nzOH, 12) [molecule/cm3]
    lonjr: np.ndarray        # (360,)
    latjr: np.ndarray        # (180,)
    jrate_avg: np.ndarray    # (360, 180, 12)

    @property
    def alt_top(self) -> np.ndarray:
        """Upper boundary of each layer (ohreaction.f90:117-121)."""
        a = self.alt
        top = np.empty_like(a)
        top[:-1] = a[1:] + 0.5 * (a[1:] - a[:-1])
        top[-1] = a[-1] + 0.5 * (a[-1] - a[-2])
        return top


def _fortran_records(fh):
    """Yield payloads of little-endian Fortran sequential records."""
    while True:
        head = fh.read(4)
        if len(head) < 4:
            return
        (n,) = np.frombuffer(head, "<i4")
        payload = fh.read(int(n))
        fh.read(4)
        yield payload


def read_oh_field(path) -> OHField:
    """Parse OH_variables.bin (readOHfield.f90:43-77)."""
    with open(path, "rb") as fh:
        rec = _fortran_records(fh)
        nx = int(np.frombuffer(next(rec), "<i4")[0])
        ny = int(np.frombuffer(next(rec), "<i4")[0])
        nz = int(np.frombuffer(next(rec), "<i4")[0])
        lonjr = np.frombuffer(next(rec), "<f4")
        latjr = np.frombuffer(next(rec), "<f4")
        jrate = np.frombuffer(next(rec), "<f4").reshape(12, 180, 360).T
        lon = np.frombuffer(next(rec), "<f4")
        lat = np.frombuffer(next(rec), "<f4")
        next(rec)                                  # lonOH repeated
        alt = np.frombuffer(next(rec), "<f4")
        oh = np.frombuffer(next(rec), "<f4").reshape(12, nz, ny, nx).T
    return OHField(lon=lon, lat=lat, alt=alt, oh=oh,
                   lonjr=lonjr, latjr=latjr, jrate_avg=jrate)


def synthetic_oh_field(nx=72, ny=46, nz=7) -> OHField:
    """Plausible stand-in climatology when OH_variables.bin is absent:
    tropical maximum ~2e6 molecule/cm3, decaying with altitude and
    latitude, seasonal shift following the sun."""
    lon = -180.0 + 360.0 * np.arange(nx) / nx + 180.0 / nx
    lat = -90.0 + 180.0 * np.arange(ny) / ny + 90.0 / ny
    alt = np.array([500.0, 1500.0, 3000.0, 5000.0, 7500.0, 10500.0,
                    14000.0][:nz])
    months = np.arange(12)
    sun_lat = -23.4 * np.cos(2 * PI * (months + 0.5) / 12.0)
    oh = (2.0e6
          * np.exp(-((lat[None, :, None, None]
                      - sun_lat[None, None, None, :]) / 35.0) ** 2)
          * np.exp(-alt[None, None, :, None] / 8000.0)
          * np.ones((nx, 1, 1, 1)))
    lonjr = -179.5 + np.arange(360)
    latjr = -89.5 + np.arange(180)
    jr = np.zeros((360, 180, 12))
    for m in range(12):
        # monthly-mean J(O1D): daytime average approximation
        szas = zenith_angle(latjr[None, :], lonjr[:, None],
                            datetime(2020, m + 1, 15, 12))
        jr[:, :, m] = 0.35 * photo_o1d(szas)
    jr = np.maximum(jr, 1e-12)
    return OHField(lon=lon, lat=lat, alt=alt, oh=oh.astype(np.float32),
                   lonjr=lonjr, latjr=latjr, jrate_avg=jr)


class HourlyOH:
    """Maintains the two hourly-corrected OH fields around current time
    (gethourlyOH.f90 double buffer)."""

    def __init__(self, field: OHField, bdate: datetime, ldirect: int = 1):
        self.f = field
        self.bdate = bdate
        self.ldirect = ldirect
        # nearest jrate cell for every OH cell (precomputed)
        self.ijx = np.abs(field.lonjr[None, :]
                          - field.lon[:, None]).argmin(axis=1)
        self.jjy = np.abs(field.latjr[None, :]
                          - field.lat[:, None]).argmin(axis=1)
        self.t = [None, None]
        self.oh = [None, None]

    def _field_at(self, tsec: float) -> jnp.ndarray:
        when = self.bdate + timedelta(seconds=float(tsec))
        m = when.month - 1
        sza = zenith_angle(self.f.lat[None, :], self.f.lon[:, None], when)
        jrate = photo_o1d(sza)                       # (nx, ny)
        javg = self.f.jrate_avg[self.ijx[:, None], self.jjy[None, :], m]
        corr = np.where(javg > 0.0, jrate / javg, 0.0)
        return jnp.asarray(self.f.oh[:, :, :, m]
                           * corr[:, :, None], jnp.float32)

    def fields_for(self, itime: int):
        """Returns (oh0, oh1, t0, t1) hourly bracket of itime."""
        t0 = (itime // 3600) * 3600
        if self.ldirect < 0 and itime % 3600 == 0:
            t0 = itime - 3600
        t1 = t0 + 3600
        if self.t[0] != t0:
            self.t[0] = t0
            self.oh[0] = self._field_at(t0)
        if self.t[1] != t1:
            self.t[1] = t1
            self.oh[1] = self._field_at(t1)
        return self.oh[0], self.oh[1], t0, t1


def make_ohreaction(field: OHField, grid, species):
    """Jitted per-particle OH loss (ohreaction.f90:100-160): nearest OH
    cell, hourly time interpolation, Arrhenius rate, mass decay."""
    lon_oh = jnp.asarray(field.lon, jnp.float32)
    lat_oh = jnp.asarray(field.lat, jnp.float32)
    alt_top = jnp.asarray(field.alt_top, jnp.float32)
    dx, dy = grid.dx, grid.dy
    xlon0, ylat0 = grid.xlon0, grid.ylat0
    consts = tuple((s.ohcconst, s.ohdconst, s.ohnconst) for s in species)
    any_oh = tuple(s.ohcconst > 0 for s in species)

    @jax.jit
    def ohreaction(p, oh0, oh1, t0, t1, itime, temps, ltsample):
        xlon = p.x * dx + xlon0
        xlon = jnp.where(xlon > 180.0, xlon - 360.0, xlon)
        ylat = p.y * dy + ylat0
        ix = jnp.argmin(jnp.abs(lon_oh[None, :] - xlon[:, None]), axis=1)
        jy = jnp.argmin(jnp.abs(lat_oh[None, :] - ylat[:, None]), axis=1)
        kz = jnp.argmin(jnp.abs(alt_top[None, :] - p.z[:, None]), axis=1)
        w = (itime - t0).astype(jnp.float32) / (t1 - t0).astype(jnp.float32)
        oh_avg = oh0[ix, jy, kz] * (1.0 - w) + oh1[ix, jy, kz] * w
        oh_avg = jnp.maximum(oh_avg, 0.0)

        mass = p.mass
        for k, (c, d, n_) in enumerate(consts):
            if not any_oh[k]:
                continue
            rate = c * temps ** n_ * jnp.exp(-d / temps) * oh_avg
            fac = jnp.exp(-rate * jnp.abs(ltsample).astype(jnp.float32))
            newm = mass[:, k] * fac
            newm = jnp.where(newm > jnp.finfo(jnp.float32).tiny, newm, 0.0)
            newm = jnp.where(p.active & (oh_avg > 0.0), newm, mass[:, k])
            mass = mass.at[:, k].set(newm)
        return p._replace(mass=mass)

    return ohreaction
