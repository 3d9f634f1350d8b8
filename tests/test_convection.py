"""Emanuel convection scheme tests: triggering, mass conservation,
particle redistribution statistics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexpart_tpu.physics.convection import (convect_columns,
                                             fmassfrac_from_fmass,
                                             nconvlev_from_grid)
from flexpart_tpu.met.grid import hybrid_coefficients


def _soundings(nl):
    """Two columns: (0) moist-unstable tropical, (1) stable isothermal."""
    L1, L2 = nl + 1, nl + 2
    akm, bkm = hybrid_coefficients(L2 + 2)
    ps = 101325.0
    ph = (akm + bkm * ps)[1:L2 + 1] / 100.0          # hPa, decreasing
    ph = np.sort(ph)[::-1].copy()
    ph[0] = ps / 100.0
    p = 0.5 * (ph[:-1] + ph[1:])                     # full levels (L1,)
    z = -7500.0 * np.log(p / (ps / 100.0))

    from flexpart_tpu.met.thermo import f_qvsat
    # conditionally unstable: 6.5 K/km lapse (steeper than the ~4.5 K/km
    # moist adiabat at 300 K) with near-saturated boundary layer
    t_unst = np.maximum(300.0 - 6.5e-3 * z, 200.0)
    qsat = np.asarray(f_qvsat(jnp.asarray(p * 100.0), jnp.asarray(t_unst)))
    q_unst = 0.92 * qsat * np.exp(-z / 3000.0)

    t_stab = np.full_like(z, 280.0) + 2e-3 * z       # strong inversion
    q_stab = 1e-4 * np.exp(-z / 8000.0)

    pconv = np.stack([p, p])
    phconv = np.stack([ph, ph])
    tconv = np.stack([t_unst, t_stab])
    qconv = np.stack([q_unst, q_stab])
    return (jnp.asarray(pconv, jnp.float32), jnp.asarray(phconv, jnp.float32),
            jnp.asarray(tconv, jnp.float32), jnp.asarray(qconv, jnp.float32))


NL = 25


def test_trigger_and_matrix_conservation():
    pconv, phconv, tconv, qconv = _soundings(NL)
    cbmf0 = jnp.zeros(2)
    # iterate a few steps so the relaxed cloud-base mass flux spins up
    fmass = sub = lconv = None
    for _ in range(5):
        fmass, sub, cbmf0, lconv, nctop = convect_columns(
            pconv, phconv, tconv, qconv, cbmf0, NL)
    lconv = np.asarray(lconv)
    assert lconv[0], "unstable tropical sounding must convect"
    assert not lconv[1], "stable column must not convect"
    assert float(cbmf0[0]) > 0.0
    assert float(cbmf0[1]) == 0.0
    assert int(nctop[0]) > 2

    dpr = (phconv[:, :-1] - phconv[:, 1:]) * 100.0   # Pa
    fr, rlevmass = fmassfrac_from_fmass(fmass, sub, dpr, jnp.float32(900.0),
                                        NL)
    fr = np.asarray(fr)
    rl = np.asarray(rlevmass)
    # every source level's row must redistribute exactly its level mass
    np.testing.assert_allclose(fr[0].sum(axis=1), rl[0], rtol=2e-4)
    # displaced fractions nonnegative off-diagonal
    off = fr[0] - np.diag(np.diag(fr[0]))
    assert off.min() >= -1e-6
    # some mass actually moves upward in the convecting column
    upper = np.triu(fr[0], k=1).sum()
    assert upper > 0.0


def test_redist_moves_mass_upward():
    """Particles seeded near the surface of a convecting column must be
    lifted on average; destination histogram matches the matrix row."""
    from flexpart_tpu.physics.convection import (_uvzlev, redist_particles)
    from flexpart_tpu.core.state import empty_particles

    pconv, phconv, tconv, qconv = _soundings(NL)
    cbmf0 = jnp.zeros(2)
    for _ in range(5):
        fmass, sub, cbmf0, lconv, nctop = convect_columns(
            pconv, phconv, tconv, qconv, cbmf0, NL)
    dpr = (phconv[:, :-1] - phconv[:, 1:]) * 100.0
    fr, rl = fmassfrac_from_fmass(fmass, sub, dpr, jnp.float32(900.0), NL)
    tt2 = jnp.asarray([302.0, 280.0])
    td2 = tt2 - 2.0
    psh = jnp.asarray([1013.25, 1013.25])
    uvz = _uvzlev(phconv, pconv, tconv, qconv, tt2, td2, psh)

    n = 4096
    p = empty_particles(n)
    p = p._replace(
        x_hi=jnp.zeros(n), y_hi=jnp.zeros(n),     # column 0 at (0,0), nx=1
        z=jnp.full(n, 120.0),
        active=jnp.ones(n, bool), itra=jnp.zeros(n, jnp.int32))
    p2, n_moved = redist_particles(
        p, jax.random.PRNGKey(3), fr, rl, phconv, sub, uvz, pconv, tconv,
        lconv, jnp.int32(900), jnp.int32(0),
        nl=NL, nx=1, ny=2, ldirect=1)
    z2 = np.asarray(p2.z)
    assert int(n_moved) > 0, "no particles redistributed"
    assert np.all(np.isfinite(z2)) and np.all(z2 >= 0.0)
    assert z2.mean() > 120.0, "convection should loft near-surface particles"
    # moved particles reach the upper troposphere
    assert z2.max() > 3000.0


def test_simulation_with_convection(tmp_path):
    """End-to-end smoke with lconvection=1 on synthetic met."""
    from flexpart_tpu.config import (Command, OutGrid, ReleaseBox, Releases,
                                     Species)
    from flexpart_tpu.met import SyntheticMet, make_grid
    from flexpart_tpu.run.simulation import Simulation

    grid = make_grid(nx=37, ny=19, nlev=15, dx=10.0, dy=10.0)
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101, ietime=30000,
                  lsynctime=900, loutstep=3600, loutaver=3600,
                  loutsample=900, lconvection=1)
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=0,
                     lon1=-60.0, lon2=-40.0, lat1=-10.0, lat2=10.0,
                     z1=50.0, z2=500.0, mass=(1.0,), parts=2000)
    rel = Releases(species=(Species(),), boxes=(box,))
    og = OutGrid(outlon0=-180.0, outlat0=-90.0, numxgrid=90, numygrid=45,
                 dxout=4.0, dyout=4.0, outheights=(500.0, 2000.0, 50000.0))
    sim = Simulation(cmd=cmd, releases=rel, grid=grid,
                     met_backend=SyntheticMet(grid), outgrid=og,
                     outdir=str(tmp_path), write_netcdf=False, seed=5)
    sim.run()
    z = np.asarray(sim.particles.z)
    assert np.all(np.isfinite(z)) and z.min() >= 0.0
    assert float(jnp.sum(sim.particles.mass)) == pytest.approx(1.0, rel=1e-3)
    assert "convection" in sim.timings
