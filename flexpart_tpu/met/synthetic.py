"""Synthetic met backend.

The reference can only ingest real ECMWF/GFS GRIB via eccodes
(/root/reference/src/readwind_ecmwf.f90).  For development, testing and
benchmarking without met archives we provide an analytic, time-smooth,
physically plausible atmosphere on the same hybrid-eta layout the GRIB
reader produces: a mid-latitude jet with meanders, a realistic T/q/ps
structure, diurnal surface fluxes and precip bands.  Same contract as any
met backend: ``fetch(time) -> EtaFields``.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .fields import EtaFields, eta_from_numpy
from .grid import MetGrid, hybrid_coefficients


def make_grid(nx: int = 73, ny: int = 37, nlev: int = 28,
              dx: float = 5.0, dy: float = 5.0,
              xlon0: float = -180.0, ylat0: float = -90.0,
              xglobal: bool | None = None) -> MetGrid:
    if xglobal is None:
        xglobal = abs((nx - 1) * dx - 360.0) < 1e-6
    akm, bkm = hybrid_coefficients(nlev)
    return MetGrid(nx=nx, ny=ny, nlev=nlev, xlon0=xlon0, ylat0=ylat0,
                   dx=dx, dy=dy, akm=akm, bkm=bkm, xglobal=xglobal)


@dataclasses.dataclass
class SyntheticMet:
    """Analytic atmosphere; ``time`` is seconds since simulation start."""
    grid: MetGrid
    u_jet: float = 25.0         # jet max [m/s]
    seed: int = 0

    def fetch(self, time: float) -> EtaFields:
        g = self.grid
        nx, ny, nlev = g.nx, g.ny, g.nlev
        lon = g.lons[None, :] * np.ones((ny, 1))
        lat = g.lats[:, None] * np.ones((1, nx))
        lam = np.deg2rad(lon)
        phi = np.deg2rad(lat)
        t = float(time)

        # surface pressure: flat with weak synoptic wave
        ps = 101325.0 - 800.0 * np.cos(2 * lam - 1e-5 * t) * np.sin(2 * phi) ** 2

        # temperature: lat gradient + lapse rate applied on eta levels
        tt2 = 300.0 - 45.0 * np.sin(phi) ** 2 + 2.0 * np.sin(lam + 7.3e-5 * t)
        td2 = tt2 - 2.0 - 6.0 * np.sin(phi) ** 2

        # approximate level heights for the analytic profiles
        p_full = g.akz[:, None, None] + g.bkz[:, None, None] * ps[None]
        zapprox = -7500.0 * np.log(np.maximum(p_full, 1.0) / ps[None])

        lapse = 6.5e-3
        tth = tt2[None] - lapse * zapprox
        tth = np.maximum(tth, 216.0)  # isothermal stratosphere
        # humidity from actual saturation (Magnus) so the tropics are
        # conditionally unstable and the Emanuel scheme has work to do
        tc_h = tth - 273.15
        es = 611.2 * np.exp(17.67 * tc_h / (243.5 + tc_h))
        qsat = 0.622 * es / np.maximum(p_full - 0.378 * es, 1.0)
        # moist where it rains (the storm-track bands below) so the cloud
        # classification used by wet scavenging sees actual clouds
        rainband = np.exp(-((np.abs(lat) - 50.0) / 8.0) ** 2)
        storm = rainband * np.maximum(np.sin(3 * lam - 1.2e-5 * t), 0.0)
        rh_prof = (0.35 + 0.55 * np.cos(phi)[None] ** 2 + 0.55 * storm[None]) \
            * np.exp(-zapprox / 9000.0)
        qvh = np.clip(rh_prof, 0.02, 0.93) * qsat

        # winds: subtropical jets at ±45deg peaking near z=10km, plus meander
        jet = np.exp(-((np.abs(lat) - 45.0) / 12.0) ** 2)
        zshape = np.exp(-((zapprox - 10000.0) / 5000.0) ** 2)
        meander = 1.0 + 0.3 * np.sin(3 * lam + 1.2e-5 * t)
        uuh = self.u_jet * jet[None] * (0.15 + 0.85 * zshape) * meander
        vvh = 6.0 * np.sin(3 * lam - 1.2e-5 * t) * np.cos(phi)[None] ** 2 * zshape
        # surface level = 10m winds
        uuh[0] = 0.4 * uuh[1]
        vvh[0] = 0.4 * vvh[1]

        # etadot [Pa/s] on half levels: gentle synoptic vertical motion
        p_half = g.akm[:, None, None] + g.bkm[:, None, None] * ps[None]
        wshape = np.sin(np.pi * np.clip(1.0 - p_half / ps[None], 0.0, 1.0))
        wwh = -0.08 * np.sin(2 * lam + 1e-5 * t) * np.cos(phi)[None] * wshape
        wwh[0] = 0.0

        # surface energy budget: flux negative (upward) over "land" by day
        lsm = (np.sin(2 * phi) * np.cos(lam) > 0.1).astype(float)
        diurnal = np.cos(lam + 2 * np.pi * t / 86400.0)
        sshf = -120.0 * np.maximum(diurnal, -0.3) * (0.3 + 0.7 * lsm)
        ssr = 600.0 * np.maximum(diurnal, 0.0)
        surfstr = 0.08 + 0.12 * (uuh[1] ** 2 + vvh[1] ** 2) / 100.0

        # precip bands along the jet meander trough (same pattern as the
        # humidity enhancement above)
        lsprec = 2.0 * storm
        convprec = 1.0 * np.cos(phi) ** 4 * np.maximum(np.sin(2 * lam + 5e-6 * t), 0.0)
        tcc = np.clip(0.2 + 0.8 * (lsprec + convprec), 0.0, 1.0)

        rh = np.clip(qvh / np.maximum(qsat, 1e-9), 0.0, 1.0)
        clwch = np.where(rh > 0.85, 2.0e-4 * (rh - 0.85) / 0.15, 0.0) \
            * np.exp(-((zapprox - 4000.0) / 3000.0) ** 2)

        zero = np.zeros((ny, nx))
        d = dict(
            ps=ps, tt2=tt2, td2=td2, sshf=sshf, surfstr=surfstr, ssr=ssr,
            lsprec=lsprec, convprec=convprec, tcc=tcc, sd=zero,
            oro=zero, excessoro=zero + 50.0, lsm=lsm,
            tth=tth, qvh=qvh, uuh=uuh, vvh=vvh, wwh=wwh, clwch=clwch,
        )
        if self.grid.xglobal:
            for k, v in d.items():
                v[..., -1] = v[..., 0]  # cyclic column
        return eta_from_numpy(d)


def uniform_wind_met(grid: MetGrid, u: float = 10.0, v: float = 0.0,
                     w: float = 0.0):
    """Trivial constant-wind backend for exactness tests: neutral PBL,
    uniform T structure, no precip."""

    class _Uniform:
        def __init__(self, grid):
            self.grid = grid

        def fetch(self, time: float) -> EtaFields:
            g = self.grid
            ny, nx, nlev = g.ny, g.nx, g.nlev
            ps = np.full((ny, nx), 101325.0)
            tt2 = np.full((ny, nx), 288.0)
            td2 = tt2 - 5.0
            p_full = g.akz[:, None, None] + g.bkz[:, None, None] * ps[None]
            zapprox = -7500.0 * np.log(np.maximum(p_full, 1.0) / ps[None])
            tth = np.maximum(tt2[None] - 6.5e-3 * zapprox, 216.0)
            qvh = np.full((nlev, ny, nx), 1e-4)
            zero = np.zeros((ny, nx))
            d = dict(
                ps=ps, tt2=tt2, td2=td2, sshf=zero + 1.0, surfstr=zero + 0.1,
                ssr=zero, lsprec=zero, convprec=zero, tcc=zero, sd=zero,
                oro=zero, excessoro=zero, lsm=zero,
                tth=tth, qvh=qvh,
                uuh=np.full((nlev, ny, nx), u),
                vvh=np.full((nlev, ny, nx), v),
                wwh=np.zeros((nlev, ny, nx)),
                clwch=np.zeros((nlev, ny, nx)),
            )
            return eta_from_numpy(d)

    return _Uniform(grid)


def solid_rotation_met(grid: MetGrid, vmax: float = 20.0,
                       axis_lon: float = -80.0):
    """Solid-body rotation about an equatorial axis at ``axis_lon``:
    a non-divergent great-circle flow that crosses the poles.  In
    geographic components u = -vmax sin(lat) cos(lon-axis_lon),
    v = vmax sin(lon-axis_lon).  Particles on the meridian
    ``axis_lon + 90`` move due north, straight across the pole, and
    continue south on the far side — the exactness test for the
    polar-stereographic advance branch (advance.f90:754-778)."""

    class _Solid:
        def __init__(self, grid):
            self.grid = grid

        def fetch(self, time: float) -> EtaFields:
            g = self.grid
            ny, nx, nlev = g.ny, g.nx, g.nlev
            lam = np.deg2rad(g.lons[None, :] * np.ones((ny, 1)))
            phi = np.deg2rad(g.lats[:, None] * np.ones((1, nx)))
            la = np.deg2rad(axis_lon)
            u2 = -vmax * np.sin(phi) * np.cos(lam - la)
            v2 = vmax * np.sin(lam - la)
            ps = np.full((ny, nx), 101325.0)
            tt2 = np.full((ny, nx), 288.0)
            td2 = tt2 - 5.0
            p_full = g.akz[:, None, None] + g.bkz[:, None, None] * ps[None]
            zapprox = -7500.0 * np.log(np.maximum(p_full, 1.0) / ps[None])
            tth = np.maximum(tt2[None] - 6.5e-3 * zapprox, 216.0)
            qvh = np.full((nlev, ny, nx), 1e-4)
            zero = np.zeros((ny, nx))
            d = dict(
                ps=ps, tt2=tt2, td2=td2, sshf=zero + 1.0,
                surfstr=zero + 0.1, ssr=zero, lsprec=zero, convprec=zero,
                tcc=zero, sd=zero, oro=zero, excessoro=zero, lsm=zero,
                tth=tth, qvh=qvh,
                uuh=np.broadcast_to(u2, (nlev, ny, nx)).copy(),
                vvh=np.broadcast_to(v2, (nlev, ny, nx)).copy(),
                wwh=np.zeros((nlev, ny, nx)),
                clwch=np.zeros((nlev, ny, nx)),
            )
            return eta_from_numpy(d)

    return _Solid(grid)
