"""Hanna (1982) boundary-layer turbulence parameterization, vectorized.

Re-design of hanna.f90 / hanna1.f90 / hanna_short.f90: the reference picks
one of three stability regimes per particle with if/else; here all regimes
are computed branch-free and combined with `jnp.where` on the VPU.

Inputs per particle: z (height AGL), h (PBL depth), ust (u*), wst (w*),
ol (Obukhov length).  Outputs: sigma_u/v/w, Lagrangian time scales
tlu/tlv/tlw, and the sigw gradient (dsigwdz for the `hanna` form used when
turbswitch, dsigw2dz for the `hanna1` form).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Turb(NamedTuple):
    sigu: jnp.ndarray
    sigv: jnp.ndarray
    sigw: jnp.ndarray
    dsigwdz: jnp.ndarray    # d(sigw)/dz   (hanna form)
    dsigw2dz: jnp.ndarray   # d(sigw^2)/dz (hanna1 form)
    tlu: jnp.ndarray
    tlv: jnp.ndarray
    tlw: jnp.ndarray


def _regimes(h, ol):
    neutral = h / jnp.abs(ol) < 1.0
    unstable = (~neutral) & (ol < 0.0)
    stable = (~neutral) & (~unstable)
    return neutral, unstable, stable


def _tlw_unstable(z, zeta, ol, h, sigw):
    """Unstable-regime TL_w (identical in hanna/hanna1, hanna.f90:76-83)."""
    sigw = jnp.maximum(sigw, 1.0e-6)
    t1 = 0.1 * z / (sigw * (0.55 - 0.38 * jnp.abs(z / ol)))
    t2 = 0.59 * z / sigw
    t3 = 0.15 * h / sigw * (1.0 - jnp.exp(-5.0 * zeta))
    return jnp.where(z < jnp.abs(ol), t1, jnp.where(zeta < 0.1, t2, t3))


def hanna(z, h, ust, wst, ol) -> Turb:
    """turbswitch form (hanna.f90): wp is normalized by sigw in the Langevin
    update, so dsigwdz (not dsigw2dz) drives the drift term."""
    zeta = jnp.clip(z / h, 0.0, 1.0)
    ust = jnp.maximum(ust, 1.0e-4)
    ols = jnp.where(jnp.abs(ol) < 1e-6, jnp.sign(ol) * 1e-6 + 1e-12, ol)
    neutral, unstable, stable = _regimes(h, ols)

    # --- neutral (hanna.f90:41-52) ---
    corr = z / ust
    sigu_n = 1.0e-2 + 2.0 * ust * jnp.exp(-3.0e-4 * corr)
    sigw_n0 = 1.3 * ust * jnp.exp(-2.0e-4 * corr)
    dsigwdz_n = -2.0e-4 * sigw_n0
    sigw_n = sigw_n0 + 1.0e-2
    tlu_n = 0.5 * z / sigw_n / (1.0 + 1.5e-3 * corr)

    # --- unstable (hanna.f90:58-83) ---
    sigu_u = 1.0e-2 + ust * (12.0 - 0.5 * h / ols) ** (1.0 / 3.0)
    zeta_c = jnp.maximum(zeta, 1.0e-3)
    sigw_u = jnp.sqrt(jnp.maximum(
        1.2 * wst ** 2 * (1.0 - 0.9 * zeta) * zeta_c ** (2.0 / 3.0)
        + (1.8 - 1.4 * zeta) * ust ** 2, 1e-12)) + 1.0e-2
    dsigwdz_u = 0.5 / sigw_u / h * (
        -1.4 * ust ** 2 + wst ** 2
        * (0.8 * zeta_c ** (-1.0 / 3.0) - 1.8 * zeta_c ** (2.0 / 3.0)))
    tlu_u = 0.15 * h / sigu_u
    tlw_u = _tlw_unstable(z, zeta, ols, h, sigw_u)

    # --- stable (hanna.f90:89-98) ---
    sigu_s = 1.0e-2 + 2.0 * ust * (1.0 - zeta)
    sigv_s = 1.0e-2 + 1.3 * ust * (1.0 - zeta)
    dsigwdz_s = -1.3 * ust / h
    tlu_s = 0.15 * h / jnp.maximum(sigu_s, 1e-6) * jnp.sqrt(zeta_c)
    tlw_s = 0.1 * h / jnp.maximum(sigv_s, 1e-6) * zeta_c ** 0.8

    sigu = jnp.where(neutral, sigu_n, jnp.where(unstable, sigu_u, sigu_s))
    sigv = jnp.where(neutral, sigw_n, jnp.where(unstable, sigu_u, sigv_s))
    sigw = jnp.where(neutral, sigw_n, jnp.where(unstable, sigw_u, sigv_s))
    dsigwdz = jnp.where(neutral, dsigwdz_n,
                        jnp.where(unstable, dsigwdz_u, dsigwdz_s))
    tlu = jnp.where(neutral, tlu_n, jnp.where(unstable, tlu_u, tlu_s))
    tlv = jnp.where(stable, 0.467 * tlu_s, tlu)
    tlw = jnp.where(neutral, tlu_n, jnp.where(unstable, tlw_u, tlw_s))

    tlu = jnp.maximum(10.0, tlu)
    tlv = jnp.maximum(10.0, tlv)
    tlw = jnp.maximum(30.0, tlw)
    dsigwdz = jnp.where(dsigwdz == 0.0, 1.0e-10, dsigwdz)
    return Turb(sigu, sigv, sigw, dsigwdz, jnp.zeros_like(sigw), tlu, tlv, tlw)


def hanna1(z, h, ust, wst, ol) -> Turb:
    """non-turbswitch form (hanna1.f90): wp in m/s, drift uses dsigw2dz."""
    zeta = jnp.clip(z / h, 0.0, 1.0)
    ust = jnp.maximum(ust, 1.0e-4)
    ols = jnp.where(jnp.abs(ol) < 1e-6, jnp.sign(ol) * 1e-6 + 1e-12, ol)
    neutral, unstable, stable = _regimes(h, ols)

    # --- neutral (hanna1.f90:41-52) ---
    corr = z / ust
    sigu_n = jnp.maximum(2.0 * ust * jnp.exp(-3.0e-4 * corr), 1.0e-5)
    sigv_n = jnp.maximum(1.3 * ust * jnp.exp(-2.0e-4 * corr), 1.0e-5)
    dsigw2dz_n = -6.76e-4 * ust * jnp.exp(-4.0e-4 * corr)
    tlu_n = 0.5 * z / sigv_n / (1.0 + 1.5e-3 * corr)

    # --- unstable (hanna1.f90:60-100): piecewise sigw(zeta) ---
    sigu_u = jnp.maximum(ust * (12.0 - 0.5 * h / ols) ** (1.0 / 3.0), 1.0e-6)
    zeta_c = jnp.maximum(zeta, 1.0e-4)
    a = jnp.maximum(3.0 * zeta_c - ols / h, 1e-8)
    s1 = 0.96 * a ** (1.0 / 3.0)
    ds1 = 1.8432 * wst * wst / h * a ** (-1.0 / 3.0)
    s2 = 0.763 * zeta_c ** 0.175
    ds2 = 0.203759 * wst * wst / h * zeta_c ** (-0.65)
    s3 = 0.722 * jnp.maximum(1.0 - zeta, 1e-6) ** 0.207
    ds3 = -0.215812 * wst * wst / h * jnp.maximum(1.0 - zeta, 1e-6) ** (-0.586)
    s4 = jnp.full_like(zeta, 0.37)
    ds4 = jnp.zeros_like(zeta)

    use_s1 = zeta < 0.03
    use_s12 = (zeta >= 0.03) & (zeta < 0.4)
    pick_s1 = s1 < s2
    use_s3 = (zeta >= 0.4) & (zeta < 0.96)
    sigw_fac = jnp.where(use_s1, s1,
                jnp.where(use_s12, jnp.where(pick_s1, s1, s2),
                 jnp.where(use_s3, s3, s4)))
    dsigw2dz_u = jnp.where(use_s1, ds1,
                  jnp.where(use_s12, jnp.where(pick_s1, ds1, ds2),
                   jnp.where(use_s3, ds3, ds4)))
    sigw_u = jnp.maximum(wst * sigw_fac, 1.0e-6)
    tlu_u = 0.15 * h / sigu_u
    tlw_u = _tlw_unstable(z, zeta, ols, h, sigw_u)

    # --- stable (hanna1.f90:108-118) ---
    sigu_s = jnp.maximum(2.0 * ust * (1.0 - zeta), 1.0e-6)
    sigv_s = jnp.maximum(1.3 * ust * (1.0 - zeta), 1.0e-6)
    dsigw2dz_s = 3.38 * ust * ust * (zeta - 1.0) / h
    tlu_s = 0.15 * h / sigu_s * jnp.sqrt(jnp.maximum(zeta, 1e-8))
    tlw_s = 0.1 * h / sigv_s * jnp.maximum(zeta, 1e-8) ** 0.8

    sigu = jnp.where(neutral, sigu_n, jnp.where(unstable, sigu_u, sigu_s))
    sigv = jnp.where(neutral, sigv_n, jnp.where(unstable, sigu_u, sigv_s))
    sigw = jnp.where(neutral, sigv_n, jnp.where(unstable, sigw_u, sigv_s))
    dsigw2dz = jnp.where(neutral, dsigw2dz_n,
                         jnp.where(unstable, dsigw2dz_u, dsigw2dz_s))
    tlu = jnp.where(neutral, tlu_n, jnp.where(unstable, tlu_u, tlu_s))
    tlv = jnp.where(stable, 0.467 * tlu_s, tlu)
    tlw = jnp.where(neutral, tlu_n, jnp.where(unstable, tlw_u, tlw_s))

    tlu = jnp.maximum(10.0, tlu)
    tlv = jnp.maximum(10.0, tlv)
    tlw = jnp.maximum(30.0, tlw)
    return Turb(sigu, sigv, sigw, jnp.zeros_like(sigw), dsigw2dz,
                tlu, tlv, tlw)
