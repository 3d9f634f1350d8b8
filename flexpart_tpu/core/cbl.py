"""Skewed convective-boundary-layer Langevin scheme (CBLFLAG=1).

Vectorized re-design of cbl.f90 + re_initialize_particle.f90 (Cassiani
et al. 2015 / LHH bi-Gaussian closure): drift `ath` and diffusion `bth`
terms of the non-Gaussian vertical Langevin equation, from the
analytically-differentiated two-Gaussian representation of the skewed
vertical-velocity pdf in the CBL.  The reference's per-particle early
flag + goto-redraw loops become masks and a fixed two-try redraw.

wp here is the RAW vertical velocity [m/s] (the reference's CBL branch
convention, advance.f90:405-442), unlike the sigw-normalized wp of the
Gaussian turbswitch path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

USURAD2 = 0.7071067812
USURAD2P = 0.3989422804
C0 = 3.0
COSTLUAR4 = 0.66667
EPS_C = 1e-6


def _cuberoot(x):
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def _skew_params(z, h, wst, sigw, dsigwdz, ol):
    """Shared bi-Gaussian parameters (cbl.f90:70-170 and
    re_initialize_particle.f90:40-60).  All (N,)."""
    zeta = z / h
    transition = jnp.where(
        -h / ol < 15.0,
        jnp.sin(((-h / ol) + 10.0) / 10.0 * jnp.pi) / 2.0 + 0.5, 1.0)
    w2 = sigw * sigw
    dw2 = 2.0 * sigw * dsigwdz
    w3 = ((1.2 * zeta * (jnp.maximum(1.0 - zeta, 0.0) ** 1.5)) + EPS_C) \
        * wst ** 3 * transition
    dw3 = (1.2 * ((jnp.maximum(1.0 - zeta, 0.0) ** 1.5)
                  - zeta * 1.5 * jnp.sqrt(jnp.maximum(1.0 - zeta, 0.0)))) \
        * wst ** 3 / h * transition
    skew = w3 / w2 ** 1.5
    skew2 = skew * skew
    dskew = (dw3 * w2 ** 1.5 - w3 * 1.5 * jnp.sqrt(w2) * dw2) / w2 ** 3
    radw2 = jnp.sqrt(w2)
    dradw2 = 0.5 * dw2 / jnp.sqrt(w2)
    fluarw = COSTLUAR4 * _cuberoot(skew)
    fluarw2 = fluarw * fluarw
    nz = skew != 0.0
    safe = jnp.where(nz, skew, 1.0)
    dfluarw = jnp.where(
        nz, COSTLUAR4 / 3.0 * _cuberoot(safe ** -2.0) * dskew, 0.0)
    f2p1 = 1.0 + fluarw2
    f2p3 = 3.0 + fluarw2
    fl_s = jnp.where(nz, fluarw, 1.0)
    rluarw = jnp.where(nz, f2p1 ** 3 * skew2 / (f2p3 ** 2 * fluarw2), 0.0)
    xluarw = jnp.where(nz, f2p1 ** 1.5 * skew / (f2p3 * fl_s), 0.0)
    drluarw = jnp.where(nz, (
        ((3.0 * f2p1 ** 2 * (2.0 * fluarw * dfluarw) * skew2)
         + f2p1 ** 3 * 2.0 * skew * dskew) * f2p3 ** 2 * fluarw2
        - f2p1 ** 3 * skew2
        * ((2.0 * f2p3 * (2.0 * fluarw * dfluarw) * fluarw2)
           + f2p3 ** 2 * 2.0 * fluarw * dfluarw))
        / jnp.maximum((f2p3 ** 2 * fluarw2) ** 2, 1e-30), 0.0)
    dxluarw = jnp.where(nz, (
        ((1.5 * jnp.sqrt(f2p1) * (2.0 * fluarw * dfluarw) * skew)
         + f2p1 ** 1.5 * dskew) * f2p3 * fl_s
        - f2p1 ** 1.5 * skew * (3.0 * dfluarw + 3.0 * fluarw2 * dfluarw))
        / jnp.maximum((f2p3 * fl_s) ** 2, 1e-30), 0.0)

    aluarw = 0.5 * (1.0 - xluarw / jnp.sqrt(4.0 + rluarw))
    bluarw = 1.0 - aluarw
    daluarw = -0.5 * ((dxluarw * jnp.sqrt(4.0 + rluarw))
                      - (0.5 * xluarw * drluarw
                         / jnp.sqrt(4.0 + rluarw))) / (4.0 + rluarw)
    dbluarw = -daluarw
    al_s = jnp.maximum(aluarw, 1e-6)
    bl_s = jnp.maximum(bluarw, 1e-6)
    sigmawa = radw2 * jnp.sqrt(bl_s / (al_s * f2p1))
    sigmawb = radw2 * jnp.sqrt(al_s / (bl_s * f2p1))
    dsigmawa = dradw2 * jnp.sqrt(bl_s / (al_s * f2p1)) + radw2 * (
        0.5 / jnp.sqrt(bl_s / (al_s * f2p1))
        * ((dbluarw * (al_s * f2p1)
            - bl_s * (daluarw * f2p1 + al_s * 2.0 * fluarw * dfluarw))
           / (al_s * f2p1) ** 2))
    dsigmawb = dradw2 * jnp.sqrt(al_s / (bl_s * f2p1)) + radw2 * (
        0.5 / jnp.sqrt(al_s / (bl_s * f2p1))
        * ((daluarw * (bl_s * f2p1)
            - al_s * (dbluarw * f2p1 + bl_s * 2.0 * fluarw * dfluarw))
           / (bl_s * f2p1) ** 2))
    wa = fluarw * sigmawa
    wb = fluarw * sigmawb
    dwa = dfluarw * sigmawa + fluarw * dsigmawa
    dwb = dfluarw * sigmawb + fluarw * dsigmawb
    return (aluarw, bluarw, daluarw, dbluarw, sigmawa, sigmawb,
            dsigmawa, dsigmawb, wa, wb, dwa, dwb)


def cbl_terms(wp, z, wst, h, rhoa, rhograd, sigw, dsigwdz, tlw, ol,
              ldirect: int):
    """Drift/diffusion terms (cbl.f90): returns (ath, bth, flagrein)."""
    timedir = float(ldirect)
    (alu, blu, dalu, dblu, sa, sb, dsa, dsb, wa, wb, dwa,
     dwb) = _skew_params(z, h, wst, sigw, dsigwdz, ol)
    dens, ddens = rhoa, rhograd
    alfa = 2.0 * sigw * sigw / (C0 * tlw)
    wold = timedir * wp
    deltawa = wold - wa
    deltawb = wold + wb
    wold2 = wold * wold
    sa2 = sa * sa
    sb2 = sb * sb
    flagrein = (jnp.abs(deltawa) > 6.0 * sa) & (jnp.abs(deltawb) > 6.0 * sb)
    pa = USURAD2P / sa * jnp.exp(-0.5 * (deltawa / sa) ** 2)
    pb = USURAD2P / sb * jnp.exp(-0.5 * (deltawb / sb) ** 2)
    ptot = jnp.maximum(dens * alu * pa + dens * blu * pb, 1e-30)
    aperfa = deltawa * USURAD2 / sa
    aperfb = deltawb * USURAD2 / sb
    phi = (-0.5 * (alu * dens * dwa + dens * wa * dalu + alu * wa * ddens)
           * jax.scipy.special.erf(aperfa)
           + sa * (alu * dens * dsa * (wold2 / sa2 + 1.0)
                   + sa * dens * dalu + sa * ddens * alu
                   + alu * wold * dens / sa2 * (sa * dwa - wa * dsa)) * pa
           + 0.5 * (blu * dens * dwb + wb * dens * dblu + wb * blu * ddens)
           * jax.scipy.special.erf(aperfb)
           + sb * (blu * dens * dsb * (wold2 / sb2 + 1.0)
                   + sb * dens * dblu + sb * ddens * blu
                   + blu * wold * dens / sb2 * (-sb * dwb + wb * dsb)) * pb)
    q = timedir * ((alu * dens * deltawa / sa2) * pa
                   + (blu * dens * deltawb / sb2) * pb)
    ath = (1.0 / ptot) * (-(C0 / 2.0) * alfa * q + phi)
    bth = jnp.sqrt(C0 * alfa)
    return ath, bth, flagrein


def init_cbl_wp(dcas, dcas1, z, wst, h, sigw, dsigwdz, ol, ldirect: int):
    """Fresh-particle raw vertical velocity from the skewed bi-Gaussian
    pdf (initialize_cbl_vel.f90): `dcas` (uniform) picks the up/downdraft
    population by area weight, `dcas1` (gaussian) draws within it."""
    timedir = float(ldirect)
    (alu, blu, _, _, sa, sb, _, _, wa, wb, _, _) = _skew_params(
        z, h, wst, sigw, dsigwdz, ol)
    return jnp.where(dcas <= alu, dcas1 * sa + wa,
                     dcas1 * sb - wb) * timedir


def legacy_reinit_wp(tab, nrand, wp_old, z, wst, h, sigw, dsigwdz, ol,
                     ldirect: int, tries: int = 12):
    """Matched-RNG redraw (re_initialize_particle.f90): consume table
    entries from nrand+1 onward until the drawn velocity keeps the
    up/downdraft sign, exactly mirroring the Fortran goto loop (bounded
    at `tries`; the acceptance probability per try is ~0.5 so 12 tries
    leave ~2^-12 residual, and the matched tests assert the oracle
    never exceeds the bound).  Returns (wp, nrand_after) where
    nrand_after is the last index consumed."""
    timedir = float(ldirect)
    (alu, blu, _, _, sa, sb, _, _, wa, wb, _, _) = _skew_params(
        z, h, wst, sigw, dsigwdz, ol)
    R = tab.shape[0] - 1
    # Fortran sign(1.,wp)*timedir: sign(1.,0.) is +1
    updraft = jnp.where(wp_old >= 0.0, 1.0, -1.0) * timedir > 0.0
    idx = nrand + 1
    done = jnp.zeros_like(updraft)
    wp = jnp.zeros_like(wp_old)
    for _ in range(tries):
        dcas = tab[jnp.clip(idx, 1, R)]
        cand = jnp.where(updraft, dcas * sa + wa, dcas * sb - wb)
        ok = jnp.where(updraft, cand >= 0.0, cand <= 0.0)
        take = ok & ~done
        wp = jnp.where(take, cand, wp)
        idx = jnp.where(done | ok, idx, idx + 1)
        done = done | ok
    # bound exhausted (prob ~2^-tries): keep the sign like reinit_wp
    wp = jnp.where(done, wp,
                   jnp.where(updraft, jnp.abs(wp_old), -jnp.abs(wp_old)))
    return wp * timedir, idx


def reinit_wp(rnd, rnd2, wp_old, z, wst, h, sigw, dsigwdz, ol,
              ldirect: int):
    """Redraw wp from the skewed pdf keeping the up/downdraft sign
    (re_initialize_particle.f90); two attempts, then clamp."""
    timedir = float(ldirect)
    (alu, blu, _, _, sa, sb, _, _, wa, wb, _, _) = _skew_params(
        z, h, wst, sigw, dsigwdz, ol)
    updraft = jnp.sign(wp_old) * timedir > 0

    def draw(r):
        w_up = r * sa + wa
        w_dn = r * sb - wb
        return w_up, w_dn

    u1, d1 = draw(rnd)
    u2, d2 = draw(rnd2)
    w_up = jnp.where(u1 >= 0, u1, jnp.where(u2 >= 0, u2, jnp.abs(u1)))
    w_dn = jnp.where(d1 <= 0, d1, jnp.where(d2 <= 0, d2, -jnp.abs(d1)))
    return jnp.where(updraft, w_up, w_dn) * timedir
