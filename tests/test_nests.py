"""Nested met grids + nested output grid.

The synthetic atmosphere is analytic, so a nest generated from the SAME
formulas at higher resolution must give consistent (nearly identical)
particle trajectories — the nest path is validated by agreement with
the mother-only run, and the nested output grid by mass consistency.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexpart_tpu.config import Command, OutGrid, ReleaseBox, Releases, Species
from flexpart_tpu.met import SyntheticMet, make_grid
from flexpart_tpu.run.simulation import Simulation

OG = OutGrid(outlon0=-180.0, outlat0=-90.0, numxgrid=90, numygrid=45,
             dxout=4.0, dyout=4.0, outheights=(500.0, 2000.0, 50000.0))
OGN = OutGrid(outlon0=-60.0, outlat0=35.0, numxgrid=30, numygrid=15,
              dxout=1.0, dyout=1.0, outheights=(500.0, 2000.0, 50000.0))


def _run(tmp, with_nest: bool, seed=21):
    grid = make_grid(nx=37, ny=19, nlev=15, dx=10.0, dy=10.0)
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101, ietime=40000,
                  lsynctime=900, loutstep=3600, loutaver=3600,
                  loutsample=900, lconvection=0,
                  nested_output=1 if with_nest else 0)
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=0,
                     lon1=-50.0, lon2=-48.0, lat1=42.0, lat2=44.0,
                     z1=100.0, z2=1000.0, mass=(1.0,), parts=600)
    rel = Releases(species=(Species(),), boxes=(box,))
    kw = {}
    if with_nest:
        # same analytic atmosphere at 4x resolution over the release area
        nest_grid = make_grid(nx=33, ny=17, nlev=15, dx=2.5, dy=2.5,
                              xlon0=-70.0, ylat0=30.0, xglobal=False)
        kw = dict(met_nests=(SyntheticMet(nest_grid),), outgrid_nest=OGN)
    sim = Simulation(cmd=cmd, releases=rel, grid=grid,
                     met_backend=SyntheticMet(grid), outgrid=OG,
                     outdir=str(tmp), write_netcdf=False, write_npz=True,
                     seed=seed, **kw)
    sim.run()
    return sim


def test_nest_consistency(tmp_path):
    """Same analytic met: nest-assisted trajectories must stay close to
    mother-only ones (higher-res sampling of the same smooth field)."""
    simA = _run(tmp_path / "mother", with_nest=False)
    simB = _run(tmp_path / "nested", with_nest=True)
    xa = np.asarray(simA.particles.x)
    xb = np.asarray(simB.particles.x)
    ya = np.asarray(simA.particles.y)
    yb = np.asarray(simB.particles.y)
    # same RNG stream; differences only from interpolation resolution
    assert np.median(np.abs(xa - xb)) < 0.1      # grid units (10 deg each)
    assert np.median(np.abs(ya - yb)) < 0.1
    # but the nest DID engage (fields differ at fine scales)
    assert not np.array_equal(xa, xb)


def test_nested_output_grid(tmp_path):
    sim = _run(tmp_path / "n2", with_nest=True)
    nest_out = sorted((Path(tmp_path) / "n2" / "nest").glob(
        "grid_conc_*.npz"))
    assert nest_out
    d = np.load(nest_out[0])
    conc = d["conc"]
    assert np.isfinite(conc).all()
    assert conc.max() > 0.0
    # nested grid sees the release region at 1-deg resolution
    assert conc.shape[-2:] == (15, 30)
