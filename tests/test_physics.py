"""Deposition/decay physics tests against reference data files and
conservation laws."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexpart_tpu.config import (AgeClasses, Command, OutGrid, ReleaseBox,
                                 Releases, Species)
from flexpart_tpu.met import SyntheticMet, make_grid
from flexpart_tpu.physics import (read_landuse_inventory, read_surfdata,
                                  read_surfdepo, seasonal_category)
from flexpart_tpu.run.simulation import Simulation

REF_OPTIONS = Path("/root/reference/options")

CS137 = Species(name="CS137", decay_halflife=-9.9, density=1900.0,
                dquer=0.4, dsigma=3.3, crain_aero=1.0, csnow_aero=1.0,
                ccn_aero=0.9, in_aero=0.1)
SO2 = Species(name="SO2", reldiff=1.9, henry=1.0e5, f0=0.0,
              weta_gas=-9.9e-10, wetb_gas=-9.9)


@pytest.mark.skipif(not REF_OPTIONS.exists(), reason="reference not mounted")
def test_surfdepo_parse():
    t = read_surfdepo(REF_OPTIONS / "surfdepo.t")
    # spot values from the file (season 1): ri class2=60, class4=70
    assert t.ri[0, 1] == 60.0
    assert t.ri[0, 3] == 70.0
    assert t.ri[0, 0] == 1.0e25      # 9999 -> infinite
    assert t.rac[0, 0] == 100.0
    # season 2 row: ri class5=250
    assert t.ri[1, 4] == 250.0


@pytest.mark.skipif(not REF_OPTIONS.exists(), reason="reference not mounted")
def test_surfdata_parse():
    z0 = read_surfdata(REF_OPTIONS / "surfdata.t")
    np.testing.assert_allclose(z0[0], 0.7)
    np.testing.assert_allclose(z0[6], 0.001)
    np.testing.assert_allclose(z0[12], 1.0)


@pytest.mark.skipif(not REF_OPTIONS.exists(), reason="reference not mounted")
def test_landuse_inventory():
    frac = read_landuse_inventory(REF_OPTIONS / "IGBP_int1.dat")
    assert frac.shape == (1200, 600, 13)
    s = frac.sum(axis=2)
    # cells either have data summing to ~1 or are empty
    assert np.all((np.abs(s - 1.0) < 1e-6) | (s == 0.0))
    assert (s > 0).mean() > 0.2          # most of the globe has data


def test_seasonal_category():
    lat = np.array([-45.0, -10.0, 10.0, 45.0, 70.0])
    s = seasonal_category(115, lat)      # mid-January
    assert s[3] == 4 and s[4] == 4       # NH winter
    assert s[1] == 1 and s[2] == 1       # tropics = midsummer
    assert s[0] == 1                     # SH midsummer (shifted half-year)


def _depo_sim(tmpdir, species, options_dir=None, hours=6):
    grid = make_grid(nx=37, ny=19, nlev=15, dx=10.0, dy=10.0)
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101,
                  ietime=hours * 10000, lsynctime=900, loutstep=3600,
                  loutaver=3600, loutsample=900)
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=0,
                     lon1=-120.0, lon2=-110.0, lat1=40.0, lat2=55.0,
                     z1=50.0, z2=2000.0, mass=(1.0,), parts=3000)
    rel = Releases(species=(species,), boxes=(box,))
    og = OutGrid(outlon0=-180.0, outlat0=-90.0, numxgrid=90, numygrid=45,
                 dxout=4.0, dyout=4.0, outheights=(500.0, 2000.0, 50000.0))
    sim = Simulation(cmd=cmd, releases=rel, grid=grid,
                     met_backend=SyntheticMet(grid), outgrid=og,
                     outdir=str(tmpdir), write_netcdf=False,
                     options_dir=options_dir, seed=11)
    sim.run()
    return sim


def test_wet_deposition_mass_budget(tmp_path):
    """Aerosol in synthetic rain bands: wet-deposited mass shows up on the
    wet grid and airborne+deposited stays <= released."""
    sim = _depo_sim(tmp_path / "w", CS137)
    airborne = float(jnp.sum(sim.particles.mass))
    acc = jax.device_get(sim.acc)
    wet = float(np.asarray(acc.wetgridunc).sum())
    assert wet > 1e-6, "no wet deposition occurred in rain bands"
    assert airborne < 1.0
    # deposits live on the grid in mass units before area conversion
    assert airborne + wet <= 1.0 + 1e-3
    assert airborne + wet > 0.5     # most mass accounted (some dry-dep'd)


@pytest.mark.skipif(not REF_OPTIONS.exists(), reason="reference not mounted")
def test_dry_deposition_gas(tmp_path):
    """SO2-like gas with full Wesely chain from the reference data files:
    dry deposition accumulates, vdep field is physical (< 2 cm/s .. m/s)."""
    sim = _depo_sim(tmp_path / "d", SO2, options_dir=str(REF_OPTIONS))
    z = sim._get_field(0)
    vd = np.asarray(z.vdep)
    assert vd.shape[0] == 1
    assert np.all(vd >= 0.0) and np.all(vd < 0.1), (vd.min(), vd.max())
    assert vd.max() > 1e-4               # somewhere it actually deposits
    acc = jax.device_get(sim.acc)
    dry = float(np.asarray(acc.drygridunc).sum())
    assert dry > 1e-8
    airborne = float(jnp.sum(sim.particles.mass))
    assert airborne + dry <= 1.0 + 1e-3


def test_radioactive_decay(tmp_path):
    """Pure tracer with short half-life: airborne mass follows exp decay."""
    sp = Species(name="FAST", decay_halflife=7200.0)
    sim = _depo_sim(tmp_path / "r", sp, hours=4)
    airborne = float(jnp.sum(sim.particles.mass))
    # 4 h = 2 half-lives -> 25% left (all particles stay airborne)
    expected = 0.25
    assert abs(airborne - expected) < 0.02, airborne


def test_oh_chemistry(tmp_path):
    """CH4-like tracer with OH reaction: mass decreases, daytime rates
    positive; photolysis lookup matches reference table endpoints."""
    from flexpart_tpu.physics.ohchem import (photo_o1d, synthetic_oh_field,
                                             zenith_angle)
    from datetime import datetime
    # photo_O1D at table nodes
    np.testing.assert_allclose(photo_o1d(0.0),
                               1.45e-2 * np.exp(-0.4) * 0.4616e-2, rtol=1e-5)
    assert photo_o1d(95.0) == 0.0
    # zenith angle sanity: subsolar near noon at equator in late March
    sza = zenith_angle(0.0, 0.0, datetime(2020, 3, 21, 12, 0))
    assert sza < 10.0

    # strongly reactive gas so 6h shows a visible effect
    sp = Species(name="REACT", ohcconst=1.0e-11, ohdconst=500.0,
                 ohnconst=0.0)
    sim = _depo_sim(tmp_path / "oh", sp, hours=6)
    airborne = float(jnp.sum(sim.particles.mass))
    assert airborne < 0.999, airborne
    assert airborne > 0.2
