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


def test_innermost_nest_selection_multinest():
    """N>1 nests: a particle inside BOTH nest windows must move with the
    INNERMOST nest's wind (advance.f90:167-175 scans j=numbnests,1,-1);
    one inside only the outer nest with the outer's; one outside both
    with the mother's."""
    from flexpart_tpu.core import StepConfig, StepParams, advance_all
    from flexpart_tpu.core.state import empty_particles
    from flexpart_tpu.met import (calcpar, compute_heights, make_grid,
                                  process_eta, uniform_wind_met)

    def fields(grid, u, height=None):
        met = uniform_wind_met(grid, u=u, v=0.0)
        eta = met.fetch(0.0)
        h = compute_heights(grid, eta) if height is None else height
        z = process_eta(grid, eta, h)
        return calcpar(grid, eta, z), h

    mother = make_grid(nx=40, ny=30, nlev=12, dx=1.0, dy=1.0,
                       xlon0=0.0, ylat0=20.0, xglobal=False)
    z_m, height = fields(mother, 5.0)
    # outer nest: lon 10..30 at dx=0.5; inner nest: lon 15..25 at 0.25
    outer = make_grid(nx=41, ny=21, nlev=12, dx=0.5, dy=0.5,
                      xlon0=10.0, ylat0=25.0, xglobal=False)
    z_o, _ = fields(outer, 10.0, height)
    inner = make_grid(nx=41, ny=41, nlev=12, dx=0.25, dy=0.25,
                      xlon0=15.0, ylat0=28.0, xglobal=False)
    z_i, _ = fields(inner, 20.0, height)

    cfg = StepConfig(nx=mother.nx, ny=mother.ny, nz=mother.nlev,
                     xglobal=False, ldirect=1, turbswitch=False,
                     ifine=1, method=0, turboff=True,
                     nests=((outer.nx, outer.ny), (inner.nx, inner.ny)))
    prm = StepParams.make(
        dx=1.0, dy=1.0, ylat0=20.0, dxconst=mother.dxconst,
        dyconst=mother.dyconst, lsynctime=900, fine=1.0,
        xln=[10.0, 15.0], yln=[5.0, 8.0],
        xrn=[30.0, 25.0], yrn=[15.0, 18.0],
        xresoln=[2.0, 4.0], yresoln=[2.0, 4.0])

    n = 3
    p = empty_particles(n)
    p = p._replace(
        x_hi=jnp.asarray([5.0, 12.0, 20.0], jnp.float32),   # none/outer/inner
        y_hi=jnp.full(n, 11.0, jnp.float32),
        z=jnp.full(n, 500.0, jnp.float32),
        itra=jnp.zeros(n, jnp.int32), active=jnp.ones(n, bool),
        mass=jnp.ones((n, 1), jnp.float32))
    p2, _ = advance_all(p, z_m, z_m, jnp.int32(0), jnp.int32(0),
                        jnp.int32(3600), jax.random.PRNGKey(0), cfg, prm,
                        (z_o, z_i), (z_o, z_i))
    dxs = np.asarray(p2.x) - np.asarray(p.x)
    # displacement ratio equals the wind ratio 5 : 10 : 20
    assert dxs[0] > 0
    np.testing.assert_allclose(dxs[1] / dxs[0], 2.0, rtol=1e-3)
    np.testing.assert_allclose(dxs[2] / dxs[0], 4.0, rtol=1e-3)
