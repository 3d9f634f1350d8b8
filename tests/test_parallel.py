"""Particle-sharding tests on the 8-device virtual CPU mesh (SURVEY.md §2.8:
serial<->parallel equivalence is the reference's distributed contract,
README_PARALLEL.md:189-195 — deterministic paths must match exactly)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexpart_tpu.core import (StepParams, activate, advance_all,
                               empty_particles)
from flexpart_tpu.grid.outgrid import zero_accumulators
from flexpart_tpu.parallel import (make_sharded_advance, make_sharded_conccalc,
                                   particle_mesh, reduce_acc_partials,
                                   replicate, shard_particles,
                                   zero_acc_partials)
from flexpart_tpu.met import (calcpar, compute_heights, make_grid,
                              process_eta, uniform_wind_met)

from test_core import make_cfg


@pytest.fixture(scope="module")
def setup():
    grid = make_grid(nx=40, ny=30, nlev=15, dx=1.0, dy=1.0,
                     xlon0=0.0, ylat0=20.0, xglobal=False)
    met = uniform_wind_met(grid, u=10.0, v=0.0)
    eta = met.fetch(0.0)
    height = compute_heights(grid, eta)
    z0 = process_eta(grid, eta, height)
    z0 = calcpar(grid, eta, z0)
    return grid, z0


def _particles(n, key):
    p = empty_particles(n)
    kx, ky, kz = jax.random.split(key, 3)
    return p._replace(
        x_hi=jax.random.uniform(kx, (n,), minval=5.0, maxval=30.0),
        y_hi=jax.random.uniform(ky, (n,), minval=5.0, maxval=25.0),
        z=jax.random.uniform(kz, (n,), minval=10.0, maxval=5000.0),
        active=jnp.ones(n, bool), itra=jnp.zeros(n, jnp.int32),
        mass=jnp.full((n, 1), 0.5),
    )


def test_sharded_advance_matches_serial(setup):
    """Deterministic path (turbulence off): the 8-way sharded advance must
    produce bitwise-identical positions to the single-device kernel."""
    grid, z0 = setup
    cfg, prm = make_cfg(grid, turboff=True)
    n = 64
    p = _particles(n, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)

    p_serial, diag_s = advance_all(p, z0, z0, jnp.int32(0), jnp.int32(0),
                                   jnp.int32(3600), key, cfg, prm)

    mesh = particle_mesh(8)
    adv = make_sharded_advance(mesh, cfg)
    p_sh = shard_particles(p, mesh)
    z_r = replicate(z0, mesh)
    p_par, diag_p = adv(p_sh, z_r, z_r, jnp.int32(0), jnp.int32(0),
                        jnp.int32(3600), key, prm)

    np.testing.assert_array_equal(np.asarray(p_serial.x), np.asarray(p_par.x))
    np.testing.assert_array_equal(np.asarray(p_serial.y), np.asarray(p_par.y))
    np.testing.assert_array_equal(np.asarray(p_serial.z), np.asarray(p_par.z))
    assert int(diag_s.n_active) == int(diag_p.n_active)


def test_sharded_advance_turbulent_stats(setup):
    """With turbulence on, shards draw decorrelated streams; check the
    ensemble stays physical (all active, finite, in-domain)."""
    grid, z0 = setup
    cfg, prm = make_cfg(grid, turboff=False)
    n = 512
    p = _particles(n, jax.random.PRNGKey(1))
    mesh = particle_mesh(8)
    adv = make_sharded_advance(mesh, cfg)
    p_sh = shard_particles(p, mesh)
    z_r = replicate(z0, mesh)
    for step in range(4):
        p_sh, diag = adv(p_sh, z_r, z_r, jnp.int32(step * 900), jnp.int32(0),
                         jnp.int32(86400),
                         jax.random.fold_in(jax.random.PRNGKey(2), step), prm)
    assert np.all(np.isfinite(np.asarray(p_sh.z)))
    assert np.asarray(p_sh.z).min() >= 0.0


def test_sharded_conccalc_reduces_to_serial(setup):
    """Per-device partial accumulators summed over the device axis must
    equal the single-device scatter-add exactly (scatter of f32 adds is
    order-dependent only within a cell; with disjoint particle shards the
    partial sums commute — compare with tolerance)."""
    from flexpart_tpu.config import OutGrid
    from flexpart_tpu.grid.conccalc import ConcConfig, make_conccalc
    from flexpart_tpu.grid.outgrid import OutputGridGeometry

    grid, z0 = setup
    og = OutGrid(outlon0=0.0, outlat0=20.0, numxgrid=20, numygrid=15,
                 dxout=2.0, dyout=2.0, outheights=(500.0, 2000.0, 20000.0))
    geo = OutputGridGeometry(og, grid)
    cfg = ConcConfig(nxg=20, nyg=15, nzg=3, npointspec=1, nclassunc=1,
                     nage=1, dxout=2.0, dyout=2.0, xoutshift=0.0,
                     youtshift=0.0, dx_met=1.0, dy_met=1.0, ind_samp=0)
    n = 64
    p = _particles(n, jax.random.PRNGKey(3))
    lage = jnp.asarray([999999999], jnp.int32)

    cc = make_conccalc(og.outheights)
    acc0 = zero_accumulators(geo, 1, 1, 1, 1)
    acc_serial = cc(acc0, p, z0, jnp.int32(0), lage, jnp.float32(1.0), cfg)

    mesh = particle_mesh(8)
    ccp = make_sharded_conccalc(mesh, og.outheights, cfg)
    accp = zero_acc_partials(mesh, geo, 1, 1, 1, 1)
    p_sh = shard_particles(p, mesh)
    accp = ccp(accp, p_sh, replicate(z0, mesh), jnp.int32(0), lage,
               jnp.float32(1.0))
    total = reduce_acc_partials(accp)

    np.testing.assert_allclose(np.asarray(total.gridunc),
                               np.asarray(acc_serial.gridunc),
                               rtol=1e-6, atol=1e-9)
    assert float(total.outnum) == 1.0  # same weight on every partial


def _mini_sim(outdir, distributed=None, parts=96):
    """A small but physics-rich Simulation (wet+dry dep via aerosol
    species, turbulence, kernel output) for the serial<->DP contract."""
    from flexpart_tpu.config import (Command, OutGrid, ReleaseBox, Releases,
                                     Species)
    from flexpart_tpu.met import SyntheticMet, make_grid
    from flexpart_tpu.run.simulation import Simulation

    grid = make_grid(nx=37, ny=19, nlev=15, dx=10.0, dy=10.0)
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101,
                  ietime=30000, lsynctime=900, loutstep=3600,
                  loutaver=3600, loutsample=900, lconvection=0)
    sp = Species(density=1900.0, dquer=0.5, dsigma=1.5,
                 crain_aero=1.0, csnow_aero=1.0, ccn_aero=0.9,
                 in_aero=0.1)
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101,
                     itime2=10000, lon1=0.0, lon2=2.0, lat1=40.0,
                     lat2=42.0, z1=50.0, z2=500.0, mass=(1.0,),
                     parts=parts)
    rel = Releases(species=(sp,), boxes=(box,))
    og = OutGrid(outlon0=-60.0, outlat0=0.0, numxgrid=60, numygrid=40,
                 dxout=2.0, dyout=2.0,
                 outheights=(500.0, 2000.0, 50000.0))
    return Simulation(cmd=cmd, releases=rel, grid=grid,
                      met_backend=SyntheticMet(grid), outgrid=og,
                      outdir=str(outdir), seed=77,
                      distributed=distributed, write_netcdf=False)


def test_distributed_simulation_matches_serial(tmp_path):
    """The full production Simulation in distributed='dp' mode over the
    8-device mesh must write the same concentrations and deposition as
    the single-device run over a full output cycle — the reference's
    serial == mpirun contract (README_PARALLEL.md:189-195), but exact
    because the sharded step is the same logical program under GSPMD
    and the partial-accumulator sums commute across disjoint shards."""
    sim_s = _mini_sim(tmp_path / "serial")
    sim_s.run()
    sim_d = _mini_sim(tmp_path / "dp", distributed="dp")
    assert sim_d._mesh is not None and sim_d._mesh.devices.size == 8
    sim_d.run()

    import glob
    fs = sorted(glob.glob(str(tmp_path / "serial" / "grid_conc_*.npz")))
    fd = sorted(glob.glob(str(tmp_path / "dp" / "grid_conc_*.npz")))
    assert len(fs) == len(fd) >= 2
    for a, b in zip(fs, fd):
        da, db = np.load(a), np.load(b)
        np.testing.assert_allclose(db["conc"], da["conc"],
                                   rtol=1e-5, atol=1e-12)
        if "wet" in da:
            np.testing.assert_allclose(db["wet"], da["wet"],
                                       rtol=1e-5, atol=1e-12)
            np.testing.assert_allclose(db["dry"], da["dry"],
                                       rtol=1e-5, atol=1e-12)
    # particle states bitwise identical (GSPMD advance == serial advance)
    np.testing.assert_array_equal(
        np.asarray(sim_s.particles.z),
        np.asarray(sim_d.particles.z)[:sim_s.particles.capacity])
    np.testing.assert_array_equal(
        np.asarray(sim_s.particles.mass),
        np.asarray(sim_d.particles.mass)[:sim_s.particles.capacity])
