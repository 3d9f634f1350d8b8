"""Output-unit conversions and COMMAND-driven output switches.

Covers the reference's mixing-ratio (pptv) conversion
(concoutput.f90:156-196,583; netcdf_output_mod.f90 mixing-ratio branch),
SURF_ONLY surface-layer output (concoutput_surf.f90), the
LNETCDFOUT/iout>=8 netCDF switch (readcommand.f90:95,388-396), the ORO
output-grid orography (netcdf_output_mod.f90:528-535 <-
outgrid_init.f90:107-181), and `dates` warm-start appending
(concoutput.f90:102-125)."""
import dataclasses
from pathlib import Path

import numpy as np
import pytest

from flexpart_tpu.config import (Command, OutGrid, ReleaseBox, Releases,
                                 Species)
from flexpart_tpu.met import SyntheticMet, make_grid
from flexpart_tpu.run.simulation import Simulation

WEIGHTAIR = 28.97


def _small_sim(outdir, iout=3, surf_only=0, nspec=2):
    grid = make_grid(nx=37, ny=19, nlev=15, dx=10.0, dy=10.0)
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101,
                  ietime=20000, lsynctime=900, loutstep=3600,
                  loutaver=3600, loutsample=900, lconvection=0,
                  iout=iout, surf_only=surf_only, ind_receptor=1)
    species = tuple(
        Species(name=f"SP{k}", weightmolar=(29.0 if k == 0 else 131.0))
        for k in range(nspec))
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101,
                     itime2=10000, lon1=0.0, lon2=2.0, lat1=40.0,
                     lat2=42.0, z1=50.0, z2=500.0,
                     mass=(1.0,) * nspec, parts=600)
    rel = Releases(species=species, boxes=(box,))
    og = OutGrid(outlon0=-60.0, outlat0=0.0, numxgrid=30, numygrid=20,
                 dxout=4.0, dyout=4.0,
                 outheights=(500.0, 2000.0, 50000.0))
    return Simulation(cmd=cmd, releases=rel, grid=grid,
                      met_backend=SyntheticMet(grid), outgrid=og,
                      outdir=str(outdir), seed=7)


@pytest.fixture(scope="module")
def pptv_run(tmp_path_factory):
    outdir = tmp_path_factory.mktemp("pptv")
    sim = _small_sim(outdir, iout=3, nspec=2)
    sim.run()
    return sim, outdir


def test_pptv_is_not_mass_concentration(pptv_run):
    """spec###_pptv must differ from spec###_mr by the reference factor
    weightair/weightmolar(ks)/densityoutgrid (concoutput.f90:583)."""
    sim, outdir = pptv_run
    from flexpart_tpu.io.netcdf4 import open_nc4
    nc = sorted(Path(outdir).glob("grid_conc_*.nc"))[0]
    with open_nc4(str(nc)) as f:
        mr1 = np.asarray(f["spec001_mr"][...])
        ppt1 = np.asarray(f["spec001_pptv"][...])
        mr2 = np.asarray(f["spec002_mr"][...])
        ppt2 = np.asarray(f["spec002_pptv"][...])
    assert mr1.max() > 0
    # recompute the expected factor from the raw met density exactly the
    # reference way (nearest column, layer half-heights, newest field;
    # sim._rho_met is the newest-field density captured at output time)
    from flexpart_tpu.grid.outgrid import density_outgrid
    rho_out = density_outgrid(sim.geo, np.asarray(sim._height),
                              sim._rho_met)
    fac1 = WEIGHTAIR / 29.0 / rho_out          # (nz, ny, nx)
    fac2 = WEIGHTAIR / 131.0 / rho_out
    m = mr1 > 1e-12
    assert np.allclose(ppt1[m], (mr1 * fac1[None, None, None])[m],
                       rtol=1e-5)
    m2 = mr2 > 1e-12
    assert np.allclose(ppt2[m2], (mr2 * fac2[None, None, None])[m2],
                       rtol=1e-5)
    # the two species differ by their molar-weight ratio
    r1 = ppt1[m] / mr1[m]
    r2 = ppt2[m2] / mr2[m2]
    assert r1.mean() / r2.mean() == pytest.approx(131.0 / 29.0,
                                                  rel=1e-3)


def test_grid_pptv_fortran_files(tmp_path):
    """iout=2 writes grid_pptv_* sparse records with the conversion
    applied (concoutput.f90:460-600)."""
    sim = _small_sim(tmp_path, iout=2, nspec=1)
    sim.write_fortran = True
    sim._write_fortran_header()
    sim.run()
    pptv = sorted(Path(tmp_path).glob("grid_pptv_*"))
    assert pptv, "no grid_pptv_ files for iout=2"
    conc = sorted(Path(tmp_path).glob("grid_conc_2*_001"))
    assert not conc, "iout=2 must not write grid_conc_ records"
    from flexpart_tpu.io.fortran_writer import read_grid_sparse
    itime, conc_g, wet_g, dry_g = read_grid_sparse(
        str(pptv[-1]), numxgrid=30, numygrid=20, numzgrid=3)
    assert np.asarray(conc_g).max() > 0


def test_density_outgrid_reference_loop():
    """Vectorized densityoutgrid == a literal transcription of the
    reference loop (concoutput.f90:163-191) on a small case."""
    from flexpart_tpu.grid.outgrid import (OutputGridGeometry,
                                           density_outgrid)
    grid = make_grid(nx=37, ny=19, nlev=15, dx=10.0, dy=10.0)
    og = OutGrid(outlon0=-60.0, outlat0=0.0, numxgrid=6, numygrid=5,
                 dxout=4.0, dyout=4.0,
                 outheights=(500.0, 2000.0, 50000.0))
    geo = OutputGridGeometry(og, grid)
    rng = np.random.default_rng(0)
    height = np.sort(rng.uniform(10.0, 20000.0, 15))
    height[0] = 0.0
    rho = rng.uniform(0.1, 1.3, (15, grid.ny, grid.nx))
    got = density_outgrid(geo, height, rho)
    oh = np.asarray(og.outheights)
    for kz in range(3):
        half = oh[0] / 2 if kz == 0 else (oh[kz] + oh[kz - 1]) / 2
        kzz = 1
        for k in range(1, 15):
            if height[k - 1] < half and height[k] > half:
                kzz = k
                break
        else:
            kzz = 14
        dz1 = half - height[kzz - 1]
        dz2 = height[kzz] - half
        for jy in range(5):
            for ix in range(6):
                xl = (og.outlon0 + ix * og.dxout - grid.xlon0) / grid.dx
                yl = (og.outlat0 + jy * og.dyout - grid.ylat0) / grid.dy
                iix = int(np.clip(round(xl), 0, grid.nx - 1))
                jjy = int(np.clip(round(yl), 0, grid.ny - 1))
                want = (rho[kzz, jjy, iix] * dz1
                        + rho[kzz - 1, jjy, iix] * dz2) / (dz1 + dz2)
                assert got[kz, jy, ix] == pytest.approx(want, rel=1e-6)


def test_surf_only_output(tmp_path):
    """SURF_ONLY=1: only the lowest output layer is written
    (concoutput_surf.f90)."""
    sim = _small_sim(tmp_path, iout=1, surf_only=1, nspec=1)
    sim.run()
    npz = sorted(Path(tmp_path).glob("grid_conc_*.npz"))
    d = np.load(npz[-1])
    assert d["conc"].shape[3] == 1          # (ns,np,na,NZ,ny,nx)
    from flexpart_tpu.io.netcdf4 import open_nc4
    nc = sorted(Path(tmp_path).glob("grid_conc_*.nc"))[0]
    with open_nc4(str(nc)) as f:
        assert f["spec001_mr"].shape[3] == 1
        assert f["height"].shape == (1,)
        assert np.asarray(f["height"][:])[0] == np.float32(500.0)


def test_lnetcdfout_command_switch(tmp_path):
    """LNETCDFOUT=1 and iout>=8 both enable netCDF from a reference
    COMMAND file (readcommand.f90:95,388-396)."""
    base = ("&COMMAND LDIRECT=1, IBDATE=20200101, IBTIME=000000,"
            " IEDATE=20200101, IETIME=030000, LOUTSTEP=3600,"
            " LOUTAVER=3600, LOUTSAMPLE=900, LSYNCTIME=900,"
            " CTL=-5.0, IFINE=4, IOUT={iout}, {extra} /")
    p = tmp_path / "COMMAND"
    p.write_text(base.format(iout=1, extra=""))
    assert not Command.from_file(p).use_netcdf
    p.write_text(base.format(iout=1, extra="LNETCDFOUT=1,"))
    cmd = Command.from_file(p)
    assert cmd.use_netcdf and cmd.iout_eff == 1
    p.write_text(base.format(iout=9, extra=""))
    cmd = Command.from_file(p)
    assert cmd.use_netcdf and cmd.iout_eff == 1


def test_oro_variable_written(tmp_path):
    """The output netCDF carries the output-grid orography
    (netcdf_output_mod.f90:528-535), averaged from the met oro with the
    10x10 subsampling of outgrid_init.f90:107-181."""
    sim = _small_sim(tmp_path, iout=1, nspec=1)
    sim.run()
    from flexpart_tpu.io.netcdf4 import open_nc4
    from flexpart_tpu.grid.outgrid import oro_outgrid
    nc = sorted(Path(tmp_path).glob("grid_conc_*.nc"))[0]
    with open_nc4(str(nc)) as f:
        assert "ORO" in f
        oro = np.asarray(f["ORO"][...])
        assert oro.shape == (20, 30)
    eta = sim.met_backend.fetch(0.0)
    want = oro_outgrid(sim.geo, np.asarray(eta.oro))
    assert np.allclose(oro, want.astype(np.int32))


def test_dates_appended_on_restart(tmp_path):
    """A second run into the same output dir appends to `dates` instead
    of truncating it (concoutput.f90:102-125 ACCESS='APPEND')."""
    sim = _small_sim(tmp_path, iout=1, nspec=1)
    sim.run()
    n1 = len((tmp_path / "dates").read_text().strip().splitlines())
    assert n1 > 0
    sim2 = _small_sim(tmp_path, iout=1, nspec=1)
    sim2.run()
    n2 = len((tmp_path / "dates").read_text().strip().splitlines())
    assert n2 == 2 * n1
