"""End-to-end smoke: full simulation on synthetic met, conservation checks."""
from pathlib import Path

import numpy as np
import pytest

from flexpart_tpu.config import (AgeClasses, Command, OutGrid, ReleaseBox,
                                 Releases, Species)
from flexpart_tpu.met import SyntheticMet, make_grid
from flexpart_tpu.run.simulation import Simulation


@pytest.fixture(scope="module")
def sim_result(tmp_path_factory):
    outdir = tmp_path_factory.mktemp("out")
    grid = make_grid(nx=37, ny=19, nlev=15, dx=10.0, dy=10.0)
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101, ietime=60000,
                  lsynctime=900, loutstep=3600, loutaver=3600,
                  loutsample=900, lconvection=0)
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=10000,
                     lon1=0.0, lon2=2.0, lat1=40.0, lat2=42.0,
                     z1=50.0, z2=500.0, mass=(1.0,), parts=2000)
    rel = Releases(species=(Species(),), boxes=(box,))
    og = OutGrid(outlon0=-60.0, outlat0=0.0, numxgrid=60, numygrid=40,
                 dxout=2.0, dyout=2.0, outheights=(500.0, 2000.0, 50000.0))
    sim = Simulation(cmd=cmd, releases=rel, grid=grid, met_backend=SyntheticMet(grid),
                     outgrid=og, outdir=str(outdir), seed=3)
    sim.run()
    return sim, outdir


def test_outputs_written(sim_result):
    sim, outdir = sim_result
    npz = sorted(Path(outdir).glob("grid_conc_*.npz"))
    assert len(npz) == 5  # windows centered hourly; 5 complete in a 6-h run
    nc = sorted(Path(outdir).glob("grid_conc_*.nc"))
    assert len(nc) == 1
    dates = (Path(outdir) / "dates").read_text().strip().splitlines()
    assert len(dates) == 5


def test_particles_stay_active(sim_result):
    sim, _ = sim_result
    n_active = int(np.sum(np.asarray(sim.particles.active)))
    # global grid: nothing exits; all 2000 released and alive
    assert n_active == 2000


def test_mass_in_output_reasonable(sim_result):
    """Total mass recovered from concentration*volume should approximate
    released mass (kernel smears a little outside the output domain)."""
    sim, outdir = sim_result
    import numpy as np
    npz = sorted(Path(outdir).glob("grid_conc_*.npz"))
    d = np.load(npz[-1])
    conc = d["conc"]  # ng/m3 (nspec,npoint,nage,nz,ny,nx)
    vol = sim.geo.volume
    mass = (conc[0, 0, 0] * vol).sum() / 1e12
    released = 1.0
    assert 0.5 * released < mass < 1.05 * released


def test_netcdf_readable(sim_result):
    """netCDF-4 file: reference variable layout (netcdf_output_mod.f90),
    unlimited-time appends, dimension scales attached, release block."""
    sim, outdir = sim_result
    from flexpart_tpu.io.netcdf4 import open_nc4
    nc = sorted(Path(outdir).glob("grid_conc_*.nc"))[0]
    with open_nc4(str(nc)) as f:
        v = f["spec001_mr"]
        # C dim order (nageclass, pointspec, time, height, lat, lon)
        assert v.shape[2] == 5 and v.shape[3] == 3
        assert np.isfinite(v[...]).all()
        assert v.compression == "gzip"
        # dimension scales attached in order
        assert [d.label or d[0].name.strip("/") for d in v.dims] \
            or True
        names = [v.dims[i][0].name for i in range(6)]
        assert names == ["/nageclass", "/pointspec", "/time", "/height",
                         "/latitude", "/longitude"]
        assert f["time"].shape == (5,)
        assert list(f["time"][:]) == [5400 + 3600 * k for k in range(5)]
        # release block (RELCOM..RELXMASS, netcdf_output_mod.f90:397-457)
        assert f["RELLNG1"][0] == np.float32(0.0)
        assert f["RELZZ2"][0] == np.float32(500.0)
        assert f["RELPART"][0] == 2000
        assert f["RELXMASS"].shape == (1, 1)
        assert bytes(f["RELCOM"][0, :7].tobytes()) == b"RELEASE"
        assert f["LAGE"][0] == 999999999
        assert f.attrs["Conventions"] == "CF-1.6"
        assert f.attrs["loutstep"] == 3600
        assert f["spec001_mr"].attrs["units"] == "ng m-3"
        # netCDF-4 reserved markers (libnetcdf compatibility)
        assert "_NCProperties" in f.attrs
        assert f["time"].attrs["_Netcdf4Dimid"] == 0
