"""Backward runs, receptors, flux output, plume trajectories."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexpart_tpu.config import (Command, OutGrid, Receptor, ReleaseBox,
                                 Releases, Species)
from flexpart_tpu.met import SyntheticMet, make_grid
from flexpart_tpu.run.simulation import Simulation

OG = OutGrid(outlon0=-180.0, outlat0=-90.0, numxgrid=90, numygrid=45,
             dxout=4.0, dyout=4.0, outheights=(500.0, 2000.0, 50000.0))


def _grid():
    return make_grid(nx=37, ny=19, nlev=15, dx=10.0, dy=10.0)


def test_backward_run(tmp_path):
    """ldirect=-1: particles integrate back in time against the flow;
    output windows/fields are produced with the backward unit factor."""
    grid = _grid()
    cmd = Command(ibdate=20200101, ibtime=60000, iedate=20200101,
                  ietime=120000, ldirect=-1, lsynctime=900, loutstep=3600,
                  loutaver=3600, loutsample=900, lconvection=0)
    assert cmd.ideltas < 0
    box = ReleaseBox(idate1=20200101, itime1=120000, idate2=20200101,
                     itime2=120000, lon1=-50.0, lon2=-48.0, lat1=42.0,
                     lat2=44.0, z1=100.0, z2=500.0, mass=(1.0,), parts=400)
    rel = Releases(species=(Species(),), boxes=(box,))
    sim = Simulation(cmd=cmd, releases=rel, grid=grid,
                     met_backend=SyntheticMet(grid), outgrid=OG,
                     outdir=str(tmp_path), write_netcdf=False, seed=4)
    x0 = np.asarray(sim.particles.x).copy()
    sim.run()
    x1 = np.asarray(sim.particles.x)
    act = np.asarray(sim.particles.active)
    assert act.sum() == 400
    # mid-lat westerlies: backward integration moves particles WEST
    assert np.median(x1[act] - x0[act]) < -0.05
    npz = sorted(Path(tmp_path).glob("grid_conc_*.npz"))
    assert len(npz) >= 4
    d = np.load(npz[-1])
    assert np.isfinite(d["conc"]).all() and d["conc"].max() > 0


def test_receptors_and_flux(tmp_path):
    """Receptor near the release sees concentration; the flux grid
    accumulates eastward crossings downstream of a westerly flow."""
    grid = _grid()
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101, ietime=40000,
                  lsynctime=900, loutstep=3600, loutaver=3600,
                  loutsample=900, lconvection=0, iflux=1)
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=0,
                     lon1=-50.0, lon2=-48.0, lat1=42.0, lat2=44.0,
                     z1=50.0, z2=300.0, mass=(1.0,), parts=1000)
    rel = Releases(species=(Species(),), boxes=(box,))
    recs = (Receptor(name="NEAR", lon=-48.0, lat=43.0),
            Receptor(name="FAR", lon=100.0, lat=-60.0))
    og_fine = OutGrid(outlon0=-60.0, outlat0=30.0, numxgrid=30,
                      numygrid=24, dxout=1.0, dyout=1.0,
                      outheights=(150.0, 500.0, 2000.0, 50000.0))
    sim = Simulation(cmd=cmd, releases=rel, grid=grid,
                     met_backend=SyntheticMet(grid), outgrid=og_fine,
                     outdir=str(tmp_path), write_netcdf=False,
                     write_npz=False, receptors=recs, seed=4)
    sim.run()
    rfiles = sorted(Path(tmp_path).glob("receptor_conc_*.npz"))
    assert rfiles
    r = np.load(rfiles[0])
    near, far = r["conc"][0, 0], r["conc"][1, 0]
    assert near > 0.0
    assert far == 0.0
    ffiles = sorted(Path(tmp_path).glob("grid_flux_*.npz"))
    assert ffiles
    fx = np.load(ffiles[-1])["flux"]          # (6,nage,kp,nz,ny,nx,ks)
    assert fx.sum() > 0.0
    east, west = fx[0].sum(), fx[1].sum()
    assert east > west                        # westerly mean flow


def test_plume_trajectories(tmp_path):
    grid = _grid()
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101, ietime=40000,
                  lsynctime=900, loutstep=3600, loutaver=3600,
                  loutsample=900, lconvection=0, iout=4)
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=0,
                     lon1=-50.0, lon2=-48.0, lat1=42.0, lat2=44.0,
                     z1=50.0, z2=300.0, mass=(1.0,), parts=600)
    rel = Releases(species=(Species(),), boxes=(box,))
    sim = Simulation(cmd=cmd, releases=rel, grid=grid,
                     met_backend=SyntheticMet(grid), outgrid=OG,
                     outdir=str(tmp_path), write_netcdf=False,
                     write_npz=False, seed=4)
    sim.run()
    traj = Path(tmp_path) / "trajectories.txt"
    assert traj.exists()
    lines = traj.read_text().strip().splitlines()
    # header: date line, numpoint, 2 lines per release; then >=3 steps
    data = lines[2 + 2 * 1:]
    assert len(data) >= 3
    first = data[0].split()
    xc, yc = float(first[2]), float(first[3])
    assert -52.0 < xc < -40.0     # centroid starts at the release, moves E
    assert 40.0 < yc < 47.0
    # cluster fractions sum to ~100
    fr = [float(first[16 + 5 * k + 3]) for k in range(5)]
    assert abs(sum(fr) - 100.0) < 1.0


def test_initial_cond_sensitivity(tmp_path):
    """linit_cond: backward run accumulates terminated+surviving particle
    mass into the grid_initial field, normalized by release mass."""
    from flexpart_tpu.io.fortran_writer import read_grid_sparse
    import struct
    grid = _grid()
    cmd = Command(ibdate=20200101, ibtime=60000, iedate=20200101,
                  ietime=120000, ldirect=-1, lsynctime=900, loutstep=3600,
                  loutaver=3600, loutsample=900, lconvection=0,
                  linit_cond=2)
    box = ReleaseBox(idate1=20200101, itime1=120000, idate2=20200101,
                     itime2=120000, lon1=-50.0, lon2=-48.0, lat1=42.0,
                     lat2=44.0, z1=100.0, z2=500.0, mass=(2.0,), parts=300)
    rel = Releases(species=(Species(),), boxes=(box,))
    sim = Simulation(cmd=cmd, releases=rel, grid=grid,
                     met_backend=SyntheticMet(grid), outgrid=OG,
                     outdir=str(tmp_path), write_netcdf=False,
                     write_npz=False, seed=4)
    sim.run()
    # device accumulator holds every particle's full mass exactly once
    total = float(np.asarray(sim.init_cond).sum())
    np.testing.assert_allclose(total, 2.0, rtol=1e-5)
    f = Path(tmp_path) / "grid_initial_001"
    assert f.exists()
    data = f.read_bytes()
    itime, = struct.unpack_from("<i", data, 4)
    assert itime == sim.last_itime
    # decode: skip itime record, then wet/dry dummies + 3-D field
    from flexpart_tpu.io.fortran_writer import _RecReader, sparse_decode
    r = _RecReader(data)
    r.rec()
    for _ in range(2):   # wet, dry dummies
        for _ in range(4):
            r.rec()
    ni, = struct.unpack("<i", r.rec())
    idx = np.frombuffer(r.rec(), np.int32, ni)
    nr, = struct.unpack("<i", r.rec())
    vals = np.frombuffer(r.rec(), np.float32, nr)
    nxg, nyg, nzg = OG.numxgrid, OG.numygrid, len(OG.outheights)
    field = sparse_decode(idx, vals, nxg * nyg * nzg,
                          index_offset=nxg * nyg)
    # normalized by release mass -> sums to ~1 (all particles stay in grid)
    np.testing.assert_allclose(field.sum(), 1.0, rtol=1e-4)


def test_inversion_output(tmp_path):
    """linversionout=1: per-release time-series files named by the release
    date, appended every output step with surface-layer sparse blocks."""
    import struct
    from flexpart_tpu.io.fortran_writer import _RecReader, sparse_decode
    grid = _grid()
    cmd = Command(ibdate=20200101, ibtime=60000, iedate=20200101,
                  ietime=120000, ldirect=-1, lsynctime=900, loutstep=3600,
                  loutaver=3600, loutsample=900, lconvection=0,
                  linversionout=1)
    box = ReleaseBox(idate1=20200101, itime1=120000, idate2=20200101,
                     itime2=120000, lon1=-50.0, lon2=-48.0, lat1=42.0,
                     lat2=44.0, z1=100.0, z2=500.0, mass=(1.0,), parts=300)
    rel = Releases(species=(Species(),), boxes=(box,))
    sim = Simulation(cmd=cmd, releases=rel, grid=grid,
                     met_backend=SyntheticMet(grid), outgrid=OG,
                     outdir=str(tmp_path), write_netcdf=False,
                     write_npz=False, write_fortran=True, seed=4)
    sim.run()
    f = Path(tmp_path) / "grid_time_20200101120000_001"
    assert f.exists()
    r = _RecReader(f.read_bytes())
    n_steps = 0
    total = 0.0
    nx, ny = OG.numxgrid, OG.numygrid
    while not r.eof:
        jjjjmmdd, = struct.unpack("<i", r.rec())
        ihmmss, = struct.unpack("<i", r.rec())
        assert jjjjmmdd == 20200101
        ni, = struct.unpack("<i", r.rec())
        idx = np.frombuffer(r.rec(), np.int32, ni)
        nr, = struct.unpack("<i", r.rec())
        vals = np.frombuffer(r.rec(), np.float32, nr)
        field = sparse_decode(idx, vals, nx * ny, index_offset=nx * ny)
        total += field.sum()
        n_steps += 1
    assert n_steps >= 4     # appended once per output interval
    assert total > 0        # released at z=100-500 m: surface layer sees it


def test_wetbkdep(tmp_path):
    """ind_receptor=3 backward: particles released in the rain band get a
    positive scavenging factor; particles outside get their mass zeroed;
    the precip time series file is written."""
    grid = _grid()
    cmd = Command(ibdate=20200101, ibtime=60000, iedate=20200101,
                  ietime=120000, ldirect=-1, lsynctime=900, loutstep=3600,
                  loutaver=3600, loutsample=900, lconvection=0,
                  ind_receptor=3)
    # release inside the synthetic storm band (|lat|~50, sin(3*lam)>0)
    box = ReleaseBox(idate1=20200101, itime1=120000, idate2=20200101,
                     itime2=120000, lon1=28.0, lon2=32.0, lat1=48.0,
                     lat2=52.0, z1=100.0, z2=500.0, mass=(1.0,),
                     parts=300)
    rel = Releases(species=(Species(weta_gas=1e-4, wetb_gas=0.8, henry=1.0e5),),
                   boxes=(box,))
    sim = Simulation(cmd=cmd, releases=rel, grid=grid,
                     met_backend=SyntheticMet(grid), outgrid=OG,
                     outdir=str(tmp_path), write_netcdf=False, seed=4)
    assert sim.bkdep == 3
    sim.run()
    xs = np.asarray(sim.particles.xscav[:, 0])
    assert (xs >= 0).all()          # all factors were assigned
    assert (xs > 0).sum() > 10      # some particles saw rain
    # release height forced to the full 0-20km column
    # (readcommand.f90:322-328)
    z0 = np.asarray(sim.particles.z)
    assert z0.max() > 5000.0
    assert (Path(tmp_path) / "wetscav_precip.txt").exists()
    npz = sorted(Path(tmp_path).glob("grid_conc_*.npz"))
    conc = np.load(npz[-1])["conc"]
    assert np.isfinite(conc).all() and conc.max() > 0


def test_drybkdep(tmp_path):
    """ind_receptor=4 backward: xscav = interpolated deposition velocity,
    release height forced to the surface layer."""
    grid = _grid()
    cmd = Command(ibdate=20200101, ibtime=60000, iedate=20200101,
                  ietime=120000, ldirect=-1, lsynctime=900, loutstep=3600,
                  loutaver=3600, loutsample=900, lconvection=0,
                  ind_receptor=4)
    box = ReleaseBox(idate1=20200101, itime1=120000, idate2=20200101,
                     itime2=120000, lon1=-50.0, lon2=-48.0, lat1=42.0,
                     lat2=44.0, z1=100.0, z2=500.0, mass=(1.0,),
                     parts=300)
    rel = Releases(species=(Species(dryvel=0.02),), boxes=(box,))
    sim = Simulation(cmd=cmd, releases=rel, grid=grid,
                     met_backend=SyntheticMet(grid), outgrid=OG,
                     outdir=str(tmp_path), write_netcdf=False,
                     write_npz=False, seed=4)
    assert sim.bkdep == 4
    sim.run()
    xs = np.asarray(sim.particles.xscav[:, 0])
    act = np.asarray(sim.particles.active)
    np.testing.assert_allclose(xs[act], 0.02, rtol=1e-5)
    z0 = np.asarray(sim.particles.z)[act]
    assert z0.max() < 1500.0   # released in the 0-30 m layer, mixed up
