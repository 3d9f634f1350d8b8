"""Particle dumps, warm start, and bit-exact checkpoint/resume."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexpart_tpu.config import Command, OutGrid, ReleaseBox, Releases, Species
from flexpart_tpu.met import SyntheticMet, make_grid
from flexpart_tpu.run.simulation import Simulation


def _mk(tmp, ietime=40000, **kw):
    grid = make_grid(nx=37, ny=19, nlev=15, dx=10.0, dy=10.0)
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101, ietime=ietime,
                  lsynctime=900, loutstep=3600, loutaver=3600,
                  loutsample=900, lconvection=1, **kw.pop("cmd_kw", {}))
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=0,
                     lon1=-60.0, lon2=-40.0, lat1=30.0, lat2=50.0,
                     z1=50.0, z2=1500.0, mass=(1.0,), parts=500)
    rel = Releases(species=(Species(),), boxes=(box,))
    og = OutGrid(outlon0=-180.0, outlat0=-90.0, numxgrid=90, numygrid=45,
                 dxout=4.0, dyout=4.0, outheights=(500.0, 2000.0, 50000.0))
    return Simulation(cmd=cmd, releases=rel, grid=grid,
                      met_backend=SyntheticMet(grid), outgrid=og,
                      outdir=str(tmp), write_netcdf=False, write_npz=False,
                      seed=9, **kw)


def test_partposit_roundtrip(tmp_path):
    """Reference-format dump: write at run end, parse it back, and warm
    start a new population from it (IPIN=1 analog)."""
    from flexpart_tpu.io.partdump import (particles_from_partposit,
                                          read_partposit)
    sim = _mk(tmp_path / "a", cmd_kw={"ipout": 2})
    sim.run()
    dump = Path(sim.outdir) / "partposit_end"
    assert dump.exists()
    itime, d = read_partposit(dump, nspec=1)
    assert itime == 14400                # ietime 040000 -> 4 h
    n = len(d["z"])
    assert n == 500
    assert np.all(np.isfinite(d["z"]))
    np.testing.assert_allclose(d["mass"].sum(), 1.0, rtol=1e-4)
    # positions round trip through lon/lat within f32
    x_back = (d["lon"] - sim.grid.xlon0) / sim.grid.dx
    np.testing.assert_allclose(
        np.sort(x_back), np.sort(np.asarray(sim.particles.x)), atol=2e-4)

    itime2, p2 = particles_from_partposit(dump, 1, sim.grid, capacity=512)
    assert int(jnp.sum(p2.active)) == 500
    np.testing.assert_allclose(float(jnp.sum(p2.mass)), 1.0, rtol=1e-4)


def test_checkpoint_resume_bitexact(tmp_path):
    """A run checkpointed mid-way and resumed must produce bitwise the
    same final particle state as the uninterrupted run."""
    ckpt = str(tmp_path / "ck.npz")
    simA = _mk(tmp_path / "full")
    simA.run()

    simB = _mk(tmp_path / "half", checkpoint_at=7200,
               checkpoint_path=ckpt)
    simB.run()
    assert Path(ckpt).exists()

    simC = _mk(tmp_path / "resume")
    t0 = simC.load_checkpoint(ckpt)
    assert t0 == 7200
    simC.run(start_itime=t0)

    for name in ("x_hi", "x_lo", "y_hi", "y_lo", "z", "mass", "itra",
                 "up", "vp", "wp", "active"):
        a = np.asarray(getattr(simA.particles, name))
        c = np.asarray(getattr(simC.particles, name))
        np.testing.assert_array_equal(a, c, err_msg=name)
