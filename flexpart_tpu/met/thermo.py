"""Thermodynamic helper functions (vectorized, jit-friendly).

Equivalents of the reference's scalar helpers: saturation vapour pressure
``ew`` (Goff-Gratch, /root/reference/src/ew.f90) and saturation specific
humidity ``f_qvsat`` (enhanced Teten, /root/reference/src/qvsat.f90).
"""

from __future__ import annotations

import jax.numpy as jnp


def ew(t):
    """Saturation vapour pressure over water [Pa]; t in K (ew.f90)."""
    y = 373.16 / t
    a = -7.90298 * (y - 1.0) + 5.02808 * 0.43429 * jnp.log(y)
    c = (1.0 - 1.0 / y) * 11.344
    c = -1.3816e-7 * (10.0 ** c - 1.0)
    d = (1.0 - y) * 3.49149
    d = 8.1328e-3 * (10.0 ** d - 1.0)
    return 101324.6 * 10.0 ** (a + c + d)


def f_esl(p, t):
    """Sat. vapour pressure over liquid water [Pa] (qvsat.f90 f_esl)."""
    f = 1.0007 + 3.46e-8 * p
    return f * 611.21 * jnp.exp(17.502 * (t - 273.15) / (t - 32.18))


def f_esi(p, t):
    """Sat. vapour pressure over ice [Pa] (qvsat.f90 f_esi)."""
    f = 1.0003 + 4.18e-8 * p
    return f * 611.15 * jnp.exp(22.452 * (t - 273.15) / (t - 0.6))


def f_qvsat(p, t):
    """Saturation specific humidity [kg/kg] (qvsat.f90 f_qvsat); uses the
    ice branch below 253.15 K as in the reference."""
    rddrv = 287.0 / 461.0
    es = jnp.where(t >= 253.15, f_esl(p, t), f_esi(p, t))
    denom = p - (1.0 - rddrv) * es
    return jnp.where(denom == 0.0, 1.0, rddrv * es / denom)


def virtual_temperature_surface(t2, td2, ps):
    """Virtual temperature from 2m T, dewpoint, surface pressure
    (pattern used throughout calcpar/obukhov/scalev)."""
    return t2 * (1.0 + 0.378 * ew(td2) / ps)
