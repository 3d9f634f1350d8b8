"""Particle splitting (timemanager.f90:473-504 analog)."""
import jax.numpy as jnp
import numpy as np

from flexpart_tpu.core.state import ITRA_INACTIVE, empty_particles
from flexpart_tpu.core.split import split_particles


def make_pop(n=16, n_live=4, itsplit=3600):
    p = empty_particles(n)
    idx = np.arange(n_live)
    return p._replace(
        x_hi=p.x_hi.at[idx].set(np.arange(n_live, dtype=np.float32)),
        z=p.z.at[idx].set(100.0),
        itra=p.itra.at[idx].set(7200),
        itramem=p.itramem.at[idx].set(0),
        itrasplit=p.itrasplit.at[idx].set(itsplit),
        mass=p.mass.at[idx].set(1.0),
        mass0=p.mass0.at[idx].set(1.0),
        active=p.active.at[idx].set(True),
    )


def test_split_doubles_and_conserves_mass():
    p = make_pop()
    total0 = float(p.mass.sum())
    q = split_particles(p, jnp.int32(7200))
    assert int(q.active.sum()) == 8
    np.testing.assert_allclose(float(q.mass.sum()), total0, rtol=1e-6)
    # every live particle carries half the original mass
    live_mass = np.asarray(q.mass[np.asarray(q.active)])
    np.testing.assert_allclose(live_mass, 0.5, rtol=1e-6)
    # split interval doubled: 2*(3600-0)+0 = 7200 for parent and child
    live_split = np.asarray(q.itrasplit)[np.asarray(q.active)]
    assert (live_split == 7200).all()
    # children copy position
    xs = np.sort(np.asarray(q.x_hi)[np.asarray(q.active)])
    np.testing.assert_allclose(xs, np.sort(np.tile(np.arange(4.0), 2)))


def test_split_not_due():
    p = make_pop(itsplit=999999999)
    q = split_particles(p, jnp.int32(7200))
    assert int(q.active.sum()) == 4
    np.testing.assert_allclose(np.asarray(q.mass), np.asarray(p.mass))


def test_split_capacity_guard():
    # only 2 free slots for 4 due parents: 2 split, 2 keep full mass
    p = make_pop(n=6, n_live=4)
    q = split_particles(p, jnp.int32(7200))
    assert int(q.active.sum()) == 6
    np.testing.assert_allclose(float(q.mass.sum()), 4.0, rtol=1e-6)
    m = np.sort(np.asarray(q.mass)[np.asarray(q.active), 0])
    np.testing.assert_allclose(m, [0.5, 0.5, 0.5, 0.5, 1.0, 1.0], rtol=1e-6)


def test_split_respects_scheduled_releases():
    # slot 5 is a scheduled future release (itra == itramem != inactive);
    # it must NOT be overwritten by a child
    p = make_pop(n=6, n_live=4)
    p = p._replace(itra=p.itra.at[5].set(10800),
                   itramem=p.itramem.at[5].set(10800),
                   mass=p.mass.at[5].set(9.0))
    q = split_particles(p, jnp.int32(7200))
    assert float(q.mass[5, 0]) == 9.0
    assert int(q.itra[5]) == 10800
    # only one free slot -> exactly one split happened
    assert int(q.active.sum()) == 5


def test_split_in_simulation(tmp_path):
    from flexpart_tpu.config import (Command, OutGrid, ReleaseBox, Releases,
                                     Species)
    from flexpart_tpu.met import SyntheticMet, make_grid
    from flexpart_tpu.run.simulation import Simulation

    grid = make_grid(nx=37, ny=19, nlev=15, dx=10.0, dy=10.0)
    # ietime is HHMMSS: 060000 = 6 h = 21600 s of simulation
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101, ietime=60000,
                  lsynctime=900, loutstep=3600, loutaver=3600,
                  loutsample=900, lconvection=0, itsplit=3600)
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=0,
                     lon1=0.0, lon2=2.0, lat1=40.0, lat2=42.0,
                     z1=50.0, z2=500.0, mass=(1.0,), parts=100)
    rel = Releases(species=(Species(),), boxes=(box,))
    og = OutGrid(outlon0=-60.0, outlat0=0.0, numxgrid=30, numygrid=20,
                 dxout=2.0, dyout=2.0, outheights=(500.0, 50000.0))
    sim = Simulation(cmd=cmd, releases=rel, grid=grid,
                     met_backend=SyntheticMet(grid), outgrid=og,
                     outdir=str(tmp_path), capacity=1000,
                     write_netcdf=False)
    sim.run()
    n_act = int(np.asarray(sim.particles.active).sum())
    # output times (loutend) 5400, 9000, 12600, 16200, 19800; splits fire
    # at 5400 (interval 3600->7200), 9000 (->14400), 16200 (->28800):
    # 100 -> 200 -> 400 -> 800
    assert n_act == 800
    np.testing.assert_allclose(float(sim.particles.mass.sum()), 1.0,
                               rtol=1e-5)
