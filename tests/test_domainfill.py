"""Domain-filling mode: air-mass-proportional fill, STE tracer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexpart_tpu.config import Command, OutGrid, ReleaseBox, Releases, Species
from flexpart_tpu.met import SyntheticMet, make_grid
from flexpart_tpu.run.simulation import Simulation


def _dfsim(tmp, mdomainfill=1, parts=20000, hours=2):
    grid = make_grid(nx=73, ny=37, nlev=20, dx=5.0, dy=5.0)   # global
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101,
                  ietime=hours * 10000, lsynctime=900, loutstep=3600,
                  loutaver=3600, loutsample=900, lconvection=0,
                  mdomainfill=mdomainfill)
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=0,
                     lon1=-180.0, lon2=180.0, lat1=-90.0, lat2=90.0,
                     z1=0.0, z2=50000.0, mass=(1.0,), parts=parts)
    rel = Releases(species=(Species(),), boxes=(box,))
    og = OutGrid(outlon0=-180.0, outlat0=-90.0, numxgrid=72, numygrid=36,
                 dxout=5.0, dyout=5.0, outheights=(2000.0, 10000.0, 50000.0))
    return Simulation(cmd=cmd, releases=rel, grid=grid,
                      met_backend=SyntheticMet(grid), outgrid=og,
                      outdir=str(tmp), write_netcdf=False, write_npz=False,
                      seed=13)


def test_domainfill_air_mass(tmp_path):
    sim = _dfsim(tmp_path / "a")
    sim.run()
    n = sim.particles.capacity
    assert abs(n - 20000) < 2000          # ~target count
    # total particle mass = total atmospheric mass in the domain
    total = float(jnp.sum(sim.particles.mass))
    np.testing.assert_allclose(total, sim.airmass_total, rtol=1e-3)
    # Earth's atmosphere ~5.1e18 kg
    assert 3.0e18 < sim.airmass_total < 7.0e18
    # particles survive advection, mass conserved (air is not removed)
    act = np.asarray(sim.particles.active)
    assert act.mean() > 0.98
    # air stays well distributed: no hemisphere drains in 2 hours
    y = np.asarray(sim.particles.y)[act]
    frac_nh = (y > 18.0).mean()
    assert 0.3 < frac_nh < 0.7


def test_domainfill_stratospheric_ozone(tmp_path):
    """MDOMAINFILL=2: only stratospheric (|PV|>2, z>3km) particles."""
    sim = _dfsim(tmp_path / "o", mdomainfill=2, parts=20000)
    sim.run()
    act = np.asarray(sim.particles.active)
    assert act.sum() > 500                # some stratospheric air exists
    z = np.asarray(sim.particles.z)[act]
    assert np.percentile(z, 5) > 2500.0   # all started above 3 km
    # ozone-proxy masses are tiny compared to air masses
    m = np.asarray(sim.particles.mass)[act]
    assert m.max() < 1e12


def test_regional_domainfill_boundary_conditions(tmp_path):
    """Regional window + boundcond_domainfill: a uniform westerly flow
    removes air particles through the east edge and must recreate them
    at the west edge at the same mass rate — the populated window stays
    populated and per-particle mass is exactly xmassperparticle."""
    from flexpart_tpu.met import uniform_wind_met

    grid = make_grid(nx=73, ny=37, nlev=20, dx=5.0, dy=5.0)
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101,
                  ietime=60000, lsynctime=900, loutstep=3600,
                  loutaver=3600, loutsample=900, lconvection=0,
                  mdomainfill=1)
    # window: 60W..60E, 30S..30N
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=0,
                     lon1=-60.0, lon2=60.0, lat1=-30.0, lat2=30.0,
                     z1=0.0, z2=50000.0, mass=(1.0,), parts=5000)
    rel = Releases(species=(Species(),), boxes=(box,))
    og = OutGrid(outlon0=-60.0, outlat0=-30.0, numxgrid=24, numygrid=12,
                 dxout=5.0, dyout=5.0, outheights=(2000.0, 50000.0))
    sim = Simulation(cmd=cmd, releases=rel, grid=grid,
                     met_backend=uniform_wind_met(grid, u=20.0, v=0.0),
                     outgrid=og, outdir=str(tmp_path), write_netcdf=False,
                     write_npz=False, seed=13, capacity=12000)
    sim.run()
    assert sim._boundary is not None
    bs = sim._boundary
    act = np.asarray(sim.particles.active)
    n_act = int(act.sum())
    # population is sustained (some slack: corners/edges are stochastic)
    assert n_act > 3200
    # all particles inside the window
    x = np.asarray(sim.particles.x)[act]
    y = np.asarray(sim.particles.y)[act]
    assert (x >= float(bs.xlim[0]) - 1e-3).all()
    assert (x <= float(bs.xlim[1]) + 1e-3).all()
    assert (y >= float(bs.ylim[0]) - 1e-3).all()
    assert (y <= float(bs.ylim[1]) + 1e-3).all()
    # boundary-created particles carry exactly xmassperparticle
    created = act & (np.asarray(sim.particles.itramem) > 0)
    # expected inflow: u*(ps-ptop)/g*width / xpp ~ 1.3e12 kg/s
    #  -> O(150) particles in 6 h
    assert created.sum() > 80
    m = np.asarray(sim.particles.mass)[created, 0]
    np.testing.assert_allclose(m, float(bs.xpp), rtol=1e-5)
    # accumulators stay bounded: below one particle mass per site
    accs = np.asarray(bs.acc)
    assert (accs <= float(bs.xpp) * 0.5 + 1e-3 * float(bs.xpp)).all()


def test_regional_boundary_state_checkpointed(tmp_path):
    """The boundary site table + flux accumulators survive a
    checkpoint/restore round trip (the reference's unitboundcond dump,
    init_domainfill.f90:400-410)."""
    from flexpart_tpu.met import uniform_wind_met

    grid = make_grid(nx=73, ny=37, nlev=12, dx=5.0, dy=5.0)
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101,
                  ietime=20000, lsynctime=900, loutstep=3600,
                  loutaver=3600, loutsample=900, lconvection=0,
                  mdomainfill=1)
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=0,
                     lon1=-60.0, lon2=60.0, lat1=-30.0, lat2=30.0,
                     z1=0.0, z2=50000.0, mass=(1.0,), parts=2000)
    rel = Releases(species=(Species(),), boxes=(box,))
    og = OutGrid(outlon0=-60.0, outlat0=-30.0, numxgrid=24, numygrid=12,
                 dxout=5.0, dyout=5.0, outheights=(2000.0, 50000.0))

    def mk(out):
        return Simulation(cmd=cmd, releases=rel, grid=grid,
                          met_backend=uniform_wind_met(grid, u=25.0),
                          outgrid=og, outdir=str(out), write_netcdf=False,
                          write_npz=False, seed=13, capacity=6000)

    sim = mk(tmp_path / "a")
    sim.run()
    ck = tmp_path / "ck.npz"
    sim.save_checkpoint(ck, 20000 * 0 + 7200)
    sim2 = mk(tmp_path / "b")
    t = sim2.load_checkpoint(ck)
    assert t == 7200
    assert sim2._boundary is not None
    np.testing.assert_array_equal(np.asarray(sim2._boundary.acc),
                                  np.asarray(sim._boundary.acc))
    np.testing.assert_array_equal(np.asarray(sim2._boundary.area),
                                  np.asarray(sim._boundary.area))
    assert float(sim2._boundary.xpp) == float(sim._boundary.xpp)


def test_domainfill_dp_matches_serial(tmp_path):
    """Distributed domain-filling (BASELINE config 4; the reference has
    dedicated MPI machinery in init_domainfill_mpi.f90 /
    boundcond_domainfill_mpi.f90): the dp-sharded run — GSPMD advance,
    per-device accumulator partials, boundary creation/destruction with
    psum'd flux accumulators — must reproduce the serial regional
    domain-fill run.  The buffer layout is identical (capacity already
    a multiple of the device count), so the slot-keyed draws match and
    the comparison is exact to scatter-order tolerance."""
    import dataclasses
    import glob

    from flexpart_tpu.met import uniform_wind_met

    grid = make_grid(nx=73, ny=37, nlev=20, dx=5.0, dy=5.0)
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101,
                  ietime=30000, lsynctime=900, loutstep=3600,
                  loutaver=3600, loutsample=900, lconvection=0,
                  mdomainfill=1)
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=0,
                     lon1=-60.0, lon2=60.0, lat1=-30.0, lat2=30.0,
                     z1=0.0, z2=50000.0, mass=(1.0,), parts=5000)
    rel = Releases(species=(Species(),), boxes=(box,))
    og = OutGrid(outlon0=-60.0, outlat0=-30.0, numxgrid=24, numygrid=12,
                 dxout=5.0, dyout=5.0, outheights=(2000.0, 50000.0))

    def mk(outdir, **kw):
        return Simulation(cmd=cmd, releases=rel, grid=grid,
                          met_backend=uniform_wind_met(grid, u=20.0,
                                                       v=0.0),
                          outgrid=og, outdir=str(outdir), seed=13,
                          capacity=12000, write_netcdf=False, **kw)

    sim_s = mk(tmp_path / "serial")
    sim_s.run()
    sim_d = mk(tmp_path / "dp", distributed="dp")
    assert sim_d._mesh is not None
    sim_d.run()

    # same sustained population and boundary-created particles
    act_s = np.asarray(sim_s.particles.active)
    act_d = np.asarray(sim_d.particles.active)
    assert act_d.sum() == act_s.sum() > 3000
    created_s = act_s & (np.asarray(sim_s.particles.itramem) > 0)
    created_d = act_d & (np.asarray(sim_d.particles.itramem) > 0)
    assert created_d.sum() == created_s.sum() > 20

    # boundary flux accumulators agree (the psum'd global scalars)
    np.testing.assert_allclose(np.asarray(sim_d._boundary.acc),
                               np.asarray(sim_s._boundary.acc),
                               rtol=1e-4, atol=1e-6)

    # gridded concentrations agree
    fs = sorted(glob.glob(str(tmp_path / "serial" / "grid_conc_*.npz")))
    fd = sorted(glob.glob(str(tmp_path / "dp" / "grid_conc_*.npz")))
    assert len(fs) == len(fd) >= 2
    for a, b in zip(fs, fd):
        np.testing.assert_allclose(np.load(b)["conc"], np.load(a)["conc"],
                                   rtol=1e-3, atol=1e-6)


def test_domainfill_tiles_matches_serial(tmp_path):
    """Regional domain-fill under distributed='tiles'
    (init/boundcond_domainfill_mpi.f90 analog): boundary sites are
    partitioned by owning tile and the whole boundary condition runs
    tile-locally.  The per-site flux accumulators and emission counts
    are DETERMINISTIC functions of the met fields, so they must match
    the serial run exactly (compared as sorted multisets — the tiled
    site table is reordered); emitted positions are stochastic, so the
    population comparison is statistical."""
    import glob

    from flexpart_tpu.met import uniform_wind_met

    grid = make_grid(nx=73, ny=36, nlev=20, dx=5.0, dy=5.0)
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101,
                  ietime=30000, lsynctime=900, loutstep=3600,
                  loutaver=3600, loutsample=900, lconvection=0,
                  mdomainfill=1)
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=0,
                     lon1=-60.0, lon2=60.0, lat1=-30.0, lat2=30.0,
                     z1=0.0, z2=50000.0, mass=(1.0,), parts=5000)
    rel = Releases(species=(Species(),), boxes=(box,))
    og = OutGrid(outlon0=-60.0, outlat0=-30.0, numxgrid=24, numygrid=12,
                 dxout=5.0, dyout=5.0, outheights=(2000.0, 50000.0))

    def mk(outdir, **kw):
        return Simulation(cmd=cmd, releases=rel, grid=grid,
                          met_backend=uniform_wind_met(grid, u=20.0,
                                                       v=0.0),
                          outgrid=og, outdir=str(outdir), seed=13,
                          capacity=12000, write_netcdf=False,
                          write_npz=False, **kw)

    sim_s = mk(tmp_path / "serial")
    sim_s.run()
    sim_t = mk(tmp_path / "tiles", distributed="tiles",
               tile_local_cap=4000)
    assert sim_t._tiles is not None
    sim_t.run()

    # deterministic boundary bookkeeping: same per-site accumulators
    acc_s = np.sort(np.asarray(sim_s._boundary.acc)[
        np.asarray(sim_s._boundary.valid)])
    acc_t = np.sort(np.asarray(sim_t._boundary.acc)[
        np.asarray(sim_t._boundary.valid)])
    assert acc_s.shape == acc_t.shape
    np.testing.assert_allclose(acc_t, acc_s, rtol=1e-4, atol=1e-3)

    # sustained population within a few % of serial (creation counts
    # deterministic; individual exits differ through the stochastic
    # emitted positions)
    n_s = int(np.asarray(sim_s.particles.active).sum())
    n_t = int(np.asarray(sim_t.particles.active).sum())
    assert n_s > 3000
    assert abs(n_t - n_s) < 0.05 * n_s, (n_t, n_s)

    # created particles carry exactly xmassperparticle and sit inside
    # the window (emission within the owner's halo, migrated onward)
    act = np.asarray(sim_t.particles.active)
    created = act & (np.asarray(sim_t.particles.itramem) > 0)
    assert created.sum() > 20
    m = np.asarray(sim_t.particles.mass)[created, 0]
    np.testing.assert_allclose(m, float(np.asarray(
        sim_t._boundary.xpp).ravel()[0]), rtol=1e-5)
    bs = sim_s._boundary
    xt = np.asarray(sim_t.particles.x)[act]
    yt = np.asarray(sim_t.particles.y)[act]
    assert (xt >= float(bs.xlim[0]) - 1e-3).all()
    assert (xt <= float(bs.xlim[1]) + 1e-3).all()
    assert (yt >= float(bs.ylim[0]) - 1e-3).all()
    assert (yt <= float(bs.ylim[1]) + 1e-3).all()
