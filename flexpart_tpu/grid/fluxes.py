"""Gross mass fluxes through output-cell faces (iflux=1).

Vectorized re-design of calcfluxes.f90 + fluxoutput.f90: per particle
per step, the mass crossing E/W/N/S/up/down faces between the old and
new position is scatter-added into flux(6, nage, kp, kz, jy, ix, ks).
The reference's variable-length per-particle cell-range loops
(calcfluxes.f90:93-160) become a fixed small number of masked scatter
passes (particle displacement per sync step is CFL-bounded to a few
output cells).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import Particles

MAX_SPAN = 6   # max output-cell faces crossed per step per direction


class FluxConfig(NamedTuple):
    nxg: int
    nyg: int
    nzg: int
    npointspec: int
    nage: int
    dxout: float
    dyout: float
    xoutshift: float
    youtshift: float
    dx_met: float
    dy_met: float
    nx_met: int


def zero_flux(cfg: FluxConfig, nspec: int):
    return jnp.zeros((6, cfg.nage, cfg.npointspec, cfg.nzg, cfg.nyg,
                      cfg.nxg, nspec), jnp.float32)


def make_calcfluxes(outheights):
    oh = jnp.asarray(np.asarray(outheights, np.float32))
    ohhalf = jnp.concatenate([jnp.zeros(1),
                              0.5 * (oh[:-1] + oh[1:]),
                              oh[-1:] * 2.0])        # (nz+1,) half levels

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def calcfluxes(flux, p: Particles, xold, yold, zold, nage_idx, kp,
                   itime, cfg: FluxConfig):
        """One step's face crossings (calcfluxes.f90:40-169)."""
        live = p.active & (p.itra == itime)
        x, y, z = p.x, p.y, p.z
        xmean = 0.5 * (xold + x)
        ymean = 0.5 * (yold + y)
        ixave = jnp.floor((xmean * cfg.dx_met + cfg.xoutshift)
                          / cfg.dxout).astype(jnp.int32)
        jyave = jnp.floor((ymean * cfg.dy_met + cfg.youtshift)
                          / cfg.dyout).astype(jnp.int32)
        kzave = jnp.searchsorted(oh, z, side="right")       # 0-based layer
        kzave = jnp.minimum(kzave, cfg.nzg - 1)
        in_h = (ixave >= 0) & (ixave < cfg.nxg) \
            & (jyave >= 0) & (jyave < cfg.nyg)

        base_cell = ((nage_idx * cfg.npointspec + kp) * cfg.nzg)
        nyx = cfg.nyg * cfg.nxg
        nspec = p.nspec
        fshape = flux.shape
        flat = flux.reshape(6, -1, nspec)

        def scatter(face, cell_lin, valid):
            lin = jnp.where(valid & live, cell_lin, 2 ** 30)
            contrib = jnp.where((valid & live)[:, None], p.mass, 0.0)
            return flat.at[face, lin].add(contrib, mode="drop")

        # ---- vertical faces (faces 4=up, 5=down; calcfluxes.f90:70-82)
        k1 = jnp.searchsorted(ohhalf, zold, side="right")
        k1 = jnp.minimum(k1, cfg.nzg)
        k2 = jnp.searchsorted(ohhalf, z, side="right")
        k2 = jnp.minimum(k2, cfg.nzg)
        for s in range(MAX_SPAN):
            kz_u = k1 - 1 + s                   # upward: k1..k2-1 (1-based)
            v_u = in_h & (kz_u >= k1 - 1) & (kz_u <= k2 - 2) \
                & (kz_u >= 0) & (kz_u < cfg.nzg)
            lin_u = (base_cell + kz_u) * nyx + jyave * cfg.nxg + ixave
            flat = scatter(4, lin_u, v_u)
            kz_d = k2 - 1 + s                   # downward: k2..k1-1
            v_d = in_h & (kz_d >= k2 - 1) & (kz_d <= k1 - 2) \
                & (kz_d >= 0) & (kz_d < cfg.nzg)
            lin_d = (base_cell + kz_d) * nyx + jyave * cfg.nxg + ixave
            flat = scatter(5, lin_d, v_d)

        # ---- east/west faces (faces 0=E, 1=W; calcfluxes.f90:88-131)
        no_wrap = jnp.abs(xold - x) < cfg.nx_met / 2.0
        ix1 = jnp.floor((xold * cfg.dx_met + cfg.xoutshift) / cfg.dxout
                        + 0.5).astype(jnp.int32)
        ix2 = jnp.floor((x * cfg.dx_met + cfg.xoutshift) / cfg.dxout
                        + 0.5).astype(jnp.int32)
        ok_y = (jyave >= 0) & (jyave < cfg.nyg) & (kzave < cfg.nzg)
        for s in range(MAX_SPAN):
            ix_e = ix1 + s
            v_e = no_wrap & ok_y & (ix_e <= ix2 - 1) & (ix_e >= 0) \
                & (ix_e < cfg.nxg)
            lin_e = (base_cell + kzave) * nyx + jyave * cfg.nxg + ix_e
            flat = scatter(0, lin_e, v_e)
            ix_w = ix2 + s
            v_w = no_wrap & ok_y & (ix_w <= ix1 - 1) & (ix_w >= 0) \
                & (ix_w < cfg.nxg)
            lin_w = (base_cell + kzave) * nyx + jyave * cfg.nxg + ix_w
            flat = scatter(1, lin_w, v_w)

        # ---- north/south faces (faces 2=N, 3=S; calcfluxes.f90:138-163)
        jy1 = jnp.floor((yold * cfg.dy_met + cfg.youtshift) / cfg.dyout
                        + 0.5).astype(jnp.int32)
        jy2 = jnp.floor((y * cfg.dy_met + cfg.youtshift) / cfg.dyout
                        + 0.5).astype(jnp.int32)
        ok_x = (ixave >= 0) & (ixave < cfg.nxg) & (kzave < cfg.nzg)
        for s in range(MAX_SPAN):
            jy_n = jy1 + s
            v_n = ok_x & (jy_n <= jy2 - 1) & (jy_n >= 0) & (jy_n < cfg.nyg)
            lin_n = (base_cell + kzave) * nyx + jy_n * cfg.nxg + ixave
            flat = scatter(2, lin_n, v_n)
            jy_s = jy2 + s
            v_s = ok_x & (jy_s <= jy1 - 1) & (jy_s >= 0) & (jy_s < cfg.nyg)
            lin_s = (base_cell + kzave) * nyx + jy_s * cfg.nxg + ixave
            flat = scatter(3, lin_s, v_s)

        return flat.reshape(fshape)

    return calcfluxes
