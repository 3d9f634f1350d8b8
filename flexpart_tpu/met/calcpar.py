"""Boundary-layer parameters over the whole grid.

Vectorized, jitted re-design of /root/reference/src/calcpar.f90 and its
helpers: scalev.f90 (friction velocity), obukhov.f90 (Obukhov length),
richardson.f90 (critical-Richardson mixing height + convective velocity
scale, with the 3-iteration excess-temperature correction), and the Hoinka
thermal-tropopause search (calcpar.f90:194-266).  The reference loops over
columns with early-exit scans; here every column runs the same fixed-shape
masked computation — ideal for the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import (CPA, GA, HMIXMAX, HMIXMIN, KARMAN, R_AIR, CONVKE)
from .fields import (ZFields, F2_PS, F2_TT2, F2_TD2, F2_SSHF, F2_HMIX,
                     F2_TROPO, F2_USTAR, F2_WSTAR, F2_OLI, F2_EXCESSORO)
from .grid import MetGrid
from .thermo import ew

CONST = R_AIR / GA
RIC = 0.25     # critical Richardson number (richardson.f90:72)
B_COEF = 100.0
BS_COEF = 8.5
ITMAX = 3


def ustar_from_stress(ps, tt2, td2, stress):
    """scalev.f90: u* = sqrt(|stress| / rho)."""
    tv = tt2 * (1.0 + 0.378 * ew(td2) / ps)
    rhoa = ps / (R_AIR * tv)
    ust = jnp.sqrt(jnp.abs(stress) / rhoa)
    return jnp.maximum(ust, 1.0e-8)


def obukhov_length(ps, tt2, td2, tlev, ustar, hf, plev1):
    """obukhov.f90: Obukhov length from surface data + sensible heat flux.
    tlev/plev1: temperature/pressure at the first model level above ground."""
    e = ew(td2)
    tv = tt2 * (1.0 + 0.378 * e / ps)
    rhoa = ps / (R_AIR * tv)
    theta = tlev * (100000.0 / plev1) ** (R_AIR / CPA)
    thetastar = hf / (rhoa * CPA * jnp.maximum(ustar, 1.0e-8))
    ol = jnp.where(jnp.abs(thetastar) > 1.0e-10,
                   theta * ustar ** 2 / (KARMAN * GA * thetastar), 9999.0)
    return jnp.clip(ol, -9999.0, 9999.0)


def _col_heights_theta(akz, bkz, ps, tt2, td2, tth, qvh, z0,
                       clamp_ps: bool = False):
    """Per-level z (from reference height z0) and virtual potential
    temperature, whole grid.  Returns z (nlev,ny,nx), theta, pint.

    clamp_ps (GFS isobaric levels): pressures are capped at the surface
    pressure so below-ground levels contribute zero thickness — the
    branch-free analog of the reference's per-column llev loop start
    (richardson.f90:77-110); callers pass fields already collapsed onto
    the first above-ground level."""
    pint = akz[:, None, None] + bkz[:, None, None] * ps[None]
    if clamp_ps:
        pint = jnp.minimum(pint, ps[None])
    tv = tth * (1.0 + 0.608 * qvh)
    tv0 = tt2 * (1.0 + 0.378 * ew(td2) / ps)
    tv = tv.at[0].set(tv0)
    dz_grad = CONST * jnp.log(pint[:-1] / pint[1:]) * (tv[1:] - tv[:-1]) \
        / jnp.log(tv[1:] / tv[:-1])
    dz_iso = CONST * jnp.log(pint[:-1] / pint[1:]) * tv[1:]
    dz = jnp.where(jnp.abs(tv[1:] - tv[:-1]) > 0.2, dz_grad, dz_iso)
    z = jnp.concatenate([jnp.full_like(ps, z0)[None],
                         z0 + jnp.cumsum(dz, axis=0)], axis=0)
    theta = tv * (100000.0 / pint) ** (R_AIR / CPA)
    return z, theta, pint


def richardson_hmix(akz, bkz, ps, ustar, tth, qvh, uuh, vvh, sshf, tt2, td2,
                    clamp_ps: bool = False):
    """richardson.f90: mixing height by bulk-Richardson with excess-T
    iteration; also w* and the subgrid lifting limit hmixplus.

    clamp_ps: GFS isobaric mode — fields must be pre-collapsed onto the
    first above-ground level (calcpar llev, richardson.f90:77-84) and
    pressures are capped at ps, so the Ri scan effectively starts at
    llev like the reference's loop_start.

    Returns (hmix, wstar, hmixplus), each (ny, nx)."""
    nlev = akz.shape[0]

    def one_pass(excess):
        z, theta, _ = _col_heights_theta(akz, bkz, ps, tt2, td2, tth, qvh,
                                         2.0, clamp_ps=clamp_ps)
        thetaref = theta[0] + excess
        zref = 2.0
        du = uuh - uuh[1][None]
        dv = vvh - vvh[1][None]
        denom = jnp.maximum(du ** 2 + dv ** 2 + B_COEF * ustar[None] ** 2, 0.1)
        ri = GA / thetaref[None] * (theta - thetaref[None]) * (z - zref) / denom

        # first level (k>=1) with Ri > RIC and theta increasing
        theta_prev = jnp.concatenate([theta[0:1], theta[:-1]], axis=0)
        crossed = (ri > RIC) & (theta_prev < theta)
        crossed = crossed.at[0].set(False)
        any_cross = jnp.any(crossed, axis=0)
        k = jnp.where(any_cross, jnp.argmax(crossed, axis=0), nlev - 1)
        k = jnp.clip(k, 1, nlev - 1)

        def gat(f, idx):
            return jnp.take_along_axis(f, idx[None], axis=0)[0]

        z_lo, z_hi = gat(z, k - 1), gat(z, k)
        th_lo, th_hi = gat(theta, k - 1), gat(theta, k)
        u_lo, u_hi = gat(uuh, k - 1), gat(uuh, k)
        v_lo, v_hi = gat(vvh, k - 1), gat(vvh, k)

        # 20-point refinement between the critical levels (richardson.f90:152-168)
        frac = (jnp.arange(1, 21) / 20.0)[:, None, None]
        zl = z_lo[None] + frac * (z_hi - z_lo)[None]
        ul = u_lo[None] + frac * (u_hi - u_lo)[None]
        vl = v_lo[None] + frac * (v_hi - v_lo)[None]
        thl = th_lo[None] + frac * (th_hi - th_lo)[None]
        den = jnp.maximum((ul - uuh[1][None]) ** 2 + (vl - vvh[1][None]) ** 2
                          + B_COEF * ustar[None] ** 2, 0.1)
        ril = GA / thetaref[None] * (thl - thetaref[None]) * (zl - zref) / den
        over = ril > RIC
        any_over = jnp.any(over, axis=0)
        i = jnp.where(any_over, jnp.argmax(over, axis=0), 19)

        def gat20(f, idx):
            return jnp.take_along_axis(f, idx[None], axis=0)[0]

        h = gat20(zl, i)
        zl2, th2 = h, gat20(thl, i)
        zl1 = jnp.where(i > 0, gat20(zl, jnp.maximum(i - 1, 0)), z_lo)
        th1 = jnp.where(i > 0, gat20(thl, jnp.maximum(i - 1, 0)), th_lo)

        thetam = 0.5 * (th1 + th2)
        ul_i, vl_i = gat20(ul, i), gat20(vl, i)
        wspeed = jnp.sqrt(ul_i ** 2 + vl_i ** 2)
        bvfsq = (GA / thetam) * (th2 - th1) / jnp.maximum(zl2 - zl1, 1e-3)
        hmixplus = jnp.where(bvfsq <= 0.0, 9999.0,
                             wspeed / jnp.sqrt(jnp.maximum(bvfsq, 1e-12)) * CONVKE)

        wst = jnp.where(sshf < 0.0,
                        (-h * GA / thetaref * sshf / CPA) ** (1.0 / 3.0), 0.0)
        new_excess = jnp.where(sshf < 0.0,
                               -BS_COEF * sshf / CPA / jnp.maximum(wst, 1e-8), 0.0)
        return h, wst, hmixplus, new_excess

    excess = jnp.zeros_like(ps)
    h = wst = hplus = None
    for it in range(ITMAX):
        h, wst, hplus, new_excess = one_pass(excess)
        excess = new_excess
    return h, wst, hplus


def tropopause_height(akz, bkz, ps, tt2, td2, tth, qvh, lats,
                      clamp_ps: bool = False):
    """Hoinka thermal tropopause (calcpar.f90:194-266), whole grid.
    clamp_ps: see richardson_hmix (below-ground levels get z=0 < altmin
    and are excluded, matching the reference's loop_start=llev,
    calcpar.f90:205-229)."""
    nlev = akz.shape[0]
    z, _, _ = _col_heights_theta(akz, bkz, ps, tt2, td2, tth, qvh, 0.0,
                                 clamp_ps=clamp_ps)

    alat = jnp.abs(lats)
    altmin = jnp.where(alat <= 20.0, 5000.0,
                       jnp.where(alat < 40.0, 2500.0 + (40.0 - alat) * 125.0,
                                 2500.0))[None, :, None]

    ny, nx = ps.shape
    cols = z.reshape(nlev, -1).T  # (ncol, nlev)
    # lz = first level with z(lz) - z(kz) > 2000
    lz = jax.vmap(lambda p: jnp.searchsorted(p, p + 2000.0, side="right"))(cols)
    lz = jnp.clip(lz.T.reshape(nlev, ny, nx), 0, nlev - 1)
    t_kz = tth
    z_kz = z
    t_lz = jnp.take_along_axis(tth, lz, axis=0)
    z_lz = jnp.take_along_axis(z, lz, axis=0)
    lapse = (t_kz - t_lz) / jnp.maximum(z_lz - z_kz, 1.0)
    ok = (lapse < 0.002) & (z_kz >= altmin) & (z_lz - z_kz > 2000.0)
    anyok = jnp.any(ok, axis=0)
    kz = jnp.where(anyok, jnp.argmax(ok, axis=0), nlev - 1)
    return jnp.take_along_axis(z, kz[None], axis=0)[0]


@functools.partial(jax.jit, static_argnames=("lsubgrid", "pressure_levels"))
def _calcpar_jit(akz, bkz, eta_ps, eta_tt2, eta_td2, eta_sshf, eta_surfstr,
                 tth, qvh, uuh, vvh, excessoro, lats, lsubgrid: bool,
                 pressure_levels: bool = False):
    ustar = ustar_from_stress(eta_ps, eta_tt2, eta_td2, eta_surfstr)

    if pressure_levels:
        # GFS isobaric levels can lie below the terrain: collapse every
        # field onto the first above-ground level llev per column
        # (calcpar.f90:111-123, richardson.f90:77-84) so the Richardson
        # scan, Obukhov length and tropopause search start there
        nlev = akz.shape[0]
        kidx = jnp.arange(nlev)[:, None, None]
        llev = jnp.clip(
            jnp.sum((akz[:, None, None] >= eta_ps[None]), axis=0),
            1, nlev - 1)
        eff = jnp.maximum(kidx, llev[None])
        tth = jnp.take_along_axis(tth, eff, axis=0)
        qvh = jnp.take_along_axis(qvh, eff, axis=0)
        uuh = jnp.take_along_axis(uuh, eff, axis=0)
        vvh = jnp.take_along_axis(vvh, eff, axis=0)
        plev1 = akz[llev]                      # akz(llev), calcpar.f90:121
        tlev = tth[1]                          # == tth[llev] after collapse
    else:
        plev1 = 0.5 * (akz[1] + akz[2]) + 0.5 * (bkz[1] + bkz[2]) * eta_ps
        tlev = tth[1]
    ol = obukhov_length(eta_ps, eta_tt2, eta_td2, tlev, ustar, eta_sshf,
                        plev1)
    oli = jnp.where(ol != 0.0, 1.0 / ol, 99999.0)

    hmix, wstar, hmixplus = richardson_hmix(
        akz, bkz, eta_ps, ustar, tth, qvh, uuh, vvh, eta_sshf, eta_tt2,
        eta_td2, clamp_ps=pressure_levels)
    if lsubgrid:
        hmix = hmix + jnp.minimum(excessoro, hmixplus)
    hmix = jnp.clip(hmix, HMIXMIN, HMIXMAX)

    tropo = tropopause_height(akz, bkz, eta_ps, eta_tt2, eta_td2, tth, qvh,
                              lats, clamp_ps=pressure_levels)
    return ustar, oli, hmix, wstar, tropo


def calcpar(grid: MetGrid, eta, z: ZFields, lsubgrid: bool = False,
            vdep_kernel=None) -> ZFields:
    """Fill the calcpar surface fields of a processed ZFields.

    vdep_kernel: optional jitted dry-deposition-velocity kernel from
    physics.drydepo.make_vdep_kernel; when given, the per-species vdep
    field is computed exactly like calcpar.f90:170-186."""
    akz = jnp.asarray(grid.akz, jnp.float32)
    bkz = jnp.asarray(grid.bkz, jnp.float32)
    lats = jnp.asarray(grid.lats, jnp.float32)
    ustar, oli, hmix, wstar, tropo = _calcpar_jit(
        akz, bkz, eta.ps, eta.tt2, eta.td2, eta.sshf, eta.surfstr,
        eta.tth, eta.qvh, eta.uuh, eta.vvh, eta.excessoro, lats,
        lsubgrid=lsubgrid,
        pressure_levels=bool(getattr(grid, "pressure_levels", False)))
    f2d = z.f2d
    f2d = f2d.at[F2_USTAR].set(ustar).at[F2_OLI].set(oli)
    f2d = f2d.at[F2_HMIX].set(hmix).at[F2_WSTAR].set(wstar)
    f2d = f2d.at[F2_TROPO].set(tropo)
    z = z._replace(f2d=f2d)
    if vdep_kernel is not None:
        rh = ew(eta.td2) / ew(eta.tt2)          # calcpar.f90:172-175
        vdep = vdep_kernel(ustar, eta.tt2, rh, eta.ps, oli, eta.ssr,
                           eta.lsprec + eta.convprec, eta.sd)
        z = z._replace(vdep=vdep)
    return z
