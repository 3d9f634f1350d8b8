"""Potential vorticity on the eta levels.

Re-design of calcpv.f90: PV = dtheta/dp * (f + (dv/dx / cos(phi) - du/dy
+ u tan(phi))/R) * (-1e6 g), with the horizontal wind shear evaluated ON
THE ISENTROPE through each point — neighbor winds are interpolated to
the local potential temperature before differencing (calcpv.f90:85-210).

The reference's per-point bidirectional level search (nearest bracketing
theta within nuvz/3 levels) becomes a vectorized linear interpolation of
the neighbor wind profile in theta coordinate: theta is monotonic in the
free atmosphere where PV matters; inside a mixed layer the reference's
search and this interpolation both degenerate to a near-level value.
Polar-cap rows are replaced by the zonal mean of the adjacent row
(calcpv.f90:219-245).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GA, KAPPA, PI180, R_EARTH


@functools.partial(jax.jit, static_argnames=("xglobal", "sglobal",
                                             "nglobal"))
def _calcpv_jit(akz, bkz, ps, tth, uuh, vvh, lats, dx, dy,
                xglobal: bool, sglobal: bool, nglobal: bool):
    nz, ny, nx = tth.shape
    ppml = akz[:, None, None] + bkz[:, None, None] * ps[None]
    theta = tth * (1.0e5 / ppml) ** KAPPA            # (nz, ny, nx)

    # dtheta/dp with one-sided ends (calcpv.f90:76-83)
    th_p = jnp.concatenate([theta[1:], theta[-1:]], axis=0)
    th_m = jnp.concatenate([theta[:1], theta[:-1]], axis=0)
    pp_p = jnp.concatenate([ppml[1:], ppml[-1:]], axis=0)
    pp_m = jnp.concatenate([ppml[:1], ppml[:-1]], axis=0)
    dthetadp = (th_p - th_m) / jnp.where(
        jnp.abs(pp_p - pp_m) < 1e-3, 1e-3, pp_p - pp_m)

    def on_isentrope(field, theta_nb):
        """Interpolate neighbor profiles to the local theta values."""
        c = ny * nx
        tt_t = theta.reshape(nz, c)
        tt_n = theta_nb.reshape(nz, c)
        f_n = field.reshape(nz, c)
        out = jax.vmap(jnp.interp, in_axes=(1, 1, 1),
                       out_axes=1)(tt_t, tt_n, f_n)
        return out.reshape(nz, ny, nx)

    def shift_x(a, s):
        if xglobal:
            # physical domain is columns 0..nx-2 (nx-1 duplicates 0)
            core = a[..., :nx - 1]
            rolled = jnp.roll(core, -s, axis=-1)
            return jnp.concatenate([rolled, rolled[..., :1]], axis=-1)
        pad = a[..., -1:] if s > 0 else a[..., :1]
        return (jnp.concatenate([a[..., 1:], pad], axis=-1) if s > 0
                else jnp.concatenate([pad, a[..., :-1]], axis=-1))

    def shift_y(a, s):
        pad = a[:, -1:, :] if s > 0 else a[:, :1, :]
        return (jnp.concatenate([a[:, 1:, :], pad], axis=1) if s > 0
                else jnp.concatenate([pad, a[:, :-1, :]], axis=1))

    dxrad = dx * PI180
    dyrad = dy * PI180
    v_e = on_isentrope(shift_x(vvh, +1), shift_x(theta, +1))
    v_w = on_isentrope(shift_x(vvh, -1), shift_x(theta, -1))
    u_n = on_isentrope(shift_y(uuh, +1), shift_y(theta, +1))
    u_s = on_isentrope(shift_y(uuh, -1), shift_y(theta, -1))
    jumpx = 2.0 if xglobal else jnp.where(
        (jnp.arange(nx) == 0) | (jnp.arange(nx) == nx - 1), 1.0, 2.0
    )[None, None, :]
    jumpy = jnp.where((jnp.arange(ny) == 0) | (jnp.arange(ny) == ny - 1),
                      1.0, 2.0)[None, :, None]
    dvdx = (v_e - v_w) / jumpx / dxrad
    dudy = (u_n - u_s) / jumpy / dyrad

    phi = lats * PI180
    f_cor = 1.4585e-4 * jnp.sin(phi)[None, :, None]
    cosphi = jnp.cos(phi)[None, :, None]
    tanphi = jnp.tan(phi)[None, :, None]
    # keep the metric finite at the poles; those rows are replaced below
    cosphi = jnp.where(jnp.abs(cosphi) < 1e-6, 1e-6, cosphi)
    tanphi = jnp.clip(tanphi, -1e6, 1e6)

    pv = dthetadp * (f_cor + (dvdx / cosphi - dudy
                              + uuh * tanphi) / R_EARTH) * (-1.0e6) * GA

    if sglobal:
        pv = pv.at[:, 0, :].set(jnp.mean(pv[:, 1, :], axis=-1,
                                         keepdims=True))
    if nglobal:
        pv = pv.at[:, -1, :].set(jnp.mean(pv[:, -2, :], axis=-1,
                                          keepdims=True))
    return pv


def calcpv(grid, eta) -> jnp.ndarray:
    """PV [pvu] on the eta levels, (nlev, ny, nx)."""
    return _calcpv_jit(
        jnp.asarray(grid.akz, jnp.float32), jnp.asarray(grid.bkz,
                                                        jnp.float32),
        eta.ps, eta.tth, eta.uuh, eta.vvh,
        jnp.asarray(grid.lats, jnp.float32),
        jnp.float32(grid.dx), jnp.float32(grid.dy),
        xglobal=grid.xglobal, sglobal=grid.sglobal, nglobal=grid.nglobal)
