"""Domain-filling mode (MDOMAINFILL=1/2).

Re-design of init_domainfill.f90: the entire (global) domain is filled
with particles of equal air mass, distributed horizontally proportional
to the air column mass and vertically uniform in pressure; MDOMAINFILL=2
keeps only stratospheric particles (z > 3 km, |PV| > pvcrit) and weights
their mass by the PV-based ozone proxy.  The reference's triple nested
loop with per-particle goto bookkeeping becomes a handful of vectorized
numpy passes (runs once at init, host-side).

Boundary particle creation/destruction for REGIONAL domain-filling
(boundcond_domainfill.f90) is not implemented yet: supported domains
are global (gdomainfill), where no boundary fluxes exist.
"""

from __future__ import annotations

import numpy as np

from ..constants import GA, PI, R_AIR, R_EARTH
from ..met.fields import F3_PV, F3_RHO, F3_TT
from .state import Particles, empty_particles

PVCRIT = 2.0           # par_mod pvcrit [pvu]
OZONESCALE = 60.0      # ng O3 / m3 / pvu (par_mod)


def _gridarea(grid) -> np.ndarray:
    """Cell areas per latitude row (init_domainfill.f90:44-85), with the
    pole-cap rows treated as spherical caps."""
    jy = np.arange(grid.ny)
    ylat = grid.ylat0 + jy * grid.dy
    ylatp = np.minimum(ylat + 0.5 * grid.dy, 90.0)
    ylatm = np.maximum(ylat - 0.5 * grid.dy, -90.0)
    cosp = np.cos(np.deg2rad(ylatp)) * R_EARTH
    cosm = np.cos(np.deg2rad(ylatm)) * R_EARTH
    opposite = (ylatm < 0.0) & (ylatp > 0.0)
    hzone = np.where(
        opposite,
        R_EARTH * np.deg2rad(grid.dy),
        np.abs(np.sqrt(np.maximum(R_EARTH ** 2 - cosp ** 2, 0.0))
               - np.sqrt(np.maximum(R_EARTH ** 2 - cosm ** 2, 0.0))))
    return 2.0 * PI * R_EARTH * hzone * grid.dx / 360.0


def init_domainfill(grid, zf, npart: int, mdomainfill: int = 1,
                    nclassunc: int = 1, seed: int = 17,
                    capacity: int | None = None):
    """Build the filled-domain particle population from the first wind
    field.  Returns (Particles, total_air_mass_kg)."""
    rho = np.asarray(zf.f3d[F3_RHO])          # (nz, ny, nx)
    tt = np.asarray(zf.f3d[F3_TT])
    pv = np.asarray(zf.f3d[F3_PV])
    height = np.asarray(zf.height)
    nz, ny, nx = rho.shape
    nxm = nx - 1 if grid.xglobal else nx      # skip duplicated column
    rng = np.random.default_rng(seed)

    # pseudo-pressure profile p(kz) = rho*R*T (init_domainfill.f90:92-98)
    pp = rho * R_AIR * tt                      # (nz, ny, nx)
    area = _gridarea(grid)                     # (ny,)
    colmass = (pp[0] - pp[-1]) / GA * area[:, None]      # (ny, nx)
    colmass = colmass[:, :nxm]
    total = float(colmass.sum())

    ncolumn = np.rint(0.999 * npart * colmass / total).astype(np.int64)
    n_total = int(ncolumn.sum())

    # expand to per-particle column indices
    flat_cols = np.nonzero(ncolumn.ravel())[0]
    counts = ncolumn.ravel()[flat_cols]
    col_of = np.repeat(flat_cols, counts)              # (N,)
    jy = (col_of // nxm).astype(np.int64)
    ix = (col_of % nxm).astype(np.int64)
    # index-within-column 0..ncolumn-1
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    j_in = np.arange(n_total) - np.repeat(starts, counts)

    pp1 = pp[0, jy, ix]
    ppn = pp[-1, jy, ix]
    ncol_p = np.repeat(counts, counts).astype(np.float64)
    deltacol = (pp1 - ppn) / ncol_p
    # regular pressure spacing for populous columns, random for sparse
    # ones (init_domainfill.f90:120-128)
    pnew_reg = pp1 - (j_in + 0.5) * deltacol
    pnew_rnd = pp1 - rng.random(n_total) * (pp1 - ppn)
    pnew = np.where(ncol_p > 20, pnew_reg, pnew_rnd)

    # vertical interpolation of pnew in the column profile
    prof = pp[:, jy, ix]                               # (nz, N)
    kz = np.clip((prof >= pnew[None, :]).sum(axis=0) - 1, 0, nz - 2)
    idx = np.arange(n_total)
    dz1 = prof[kz, idx] - pnew
    dz2 = pnew - prof[kz + 1, idx]
    dz = 1.0 / np.maximum(dz1 + dz2, 1e-10)
    z = (height[kz] * dz2 + height[kz + 1] * dz1) * dz
    z = np.minimum(z, height[-1] - 0.5)

    x = ix - 0.5 + rng.random(n_total)
    x = np.where(ix == 0, rng.random(n_total), x)
    x = np.where(ix == nxm - 1, nxm - 1 - rng.random(n_total), x)
    y = jy - 0.5 + rng.random(n_total)
    y = np.clip(y, 0.0, ny - 1 - 1e-4)

    mass = (colmass[jy, ix] / ncol_p).astype(np.float32)

    keep = np.ones(n_total, bool)
    if mdomainfill == 2:
        # stratospheric ozone proxy (init_domainfill.f90:186-203)
        pvf = pv[:, jy, ix]
        pvpart = (pvf[kz, idx] * dz2 + pvf[kz + 1, idx] * dz1) * dz
        ylat = grid.ylat0 + y * grid.dy
        pvpart = np.where(ylat < 0.0, -pvpart, pvpart)
        keep = (z > 3000.0) & (pvpart > PVCRIT)
        mass = mass * pvpart * 48.0 / 29.0 * OZONESCALE / 1.0e9

    n_keep = int(keep.sum())
    if capacity is None:
        capacity = n_keep
    p = empty_particles(capacity, 1)
    sl = np.nonzero(keep)[0]
    out = np.arange(n_keep)
    m2 = mass[sl][:, None]
    return p._replace(
        x_hi=p.x_hi.at[out].set(x[sl].astype(np.float32)),
        y_hi=p.y_hi.at[out].set(y[sl].astype(np.float32)),
        z=p.z.at[out].set(z[sl].astype(np.float32)),
        itra=p.itra.at[out].set(0),
        itramem=p.itramem.at[out].set(0),
        npoint=p.npoint.at[out].set(0),
        nclass=p.nclass.at[out].set(
            rng.integers(0, nclassunc, size=n_keep).astype(np.int32)),
        mass=p.mass.at[out].set(m2),
        mass0=p.mass0.at[out].set(m2),
        active=p.active.at[out].set(False),  # activated at itime=0
    ), total
