"""Reference-format Fortran unformatted output (writeheader/concoutput)."""
import struct

import numpy as np

from flexpart_tpu.io.fortran_writer import (read_grid_sparse, read_header,
                                            sparse_decode, sparse_encode,
                                            write_grid_sparse, write_header)


def test_sparse_roundtrip():
    rng = np.random.default_rng(7)
    flat = np.zeros(1000, np.float32)
    nzidx = rng.choice(1000, 150, replace=False)
    flat[nzidx] = rng.random(150).astype(np.float32) + 0.1
    idx, vals = sparse_encode(flat)
    assert len(vals) == 150
    # signs alternate per run: first run positive (concoutput.f90:355-368)
    assert vals[0] > 0
    back = sparse_decode(idx, vals, 1000)
    np.testing.assert_allclose(back, flat)


def test_sparse_empty():
    idx, vals = sparse_encode(np.zeros(10, np.float32))
    assert len(idx) == 0 and len(vals) == 0
    np.testing.assert_array_equal(sparse_decode(idx, vals, 10),
                                  np.zeros(10))


def test_sparse_offset():
    flat = np.zeros(20, np.float32)
    flat[3:7] = 2.0
    idx, vals = sparse_encode(flat, index_offset=100)
    assert idx[0] == 103
    back = sparse_decode(idx, vals, 20, index_offset=100)
    np.testing.assert_allclose(back, flat)


def test_header_roundtrip(tmp_path):
    path = tmp_path / "header"
    rel = dict(start=0, end=3600, kindz=1, xp1=1.0, yp1=40.0, xp2=2.0,
               yp2=41.0, zp1=50.0, zp2=500.0, npart=1000,
               comment="TESTREL", xmass=[1.5])
    write_header(path, ibdate=20200101, ibtime=0, loutstep=3600,
                 loutaver=3600, loutsample=900, outlon0=-60.0,
                 outlat0=0.0, numxgrid=6, numygrid=4, dxout=2.0,
                 dyout=2.0, outheights=(500.0, 2000.0),
                 jjjjmmdd=20200101, ihmmss=0, species_names=["AIRTRACER"],
                 maxpointspec_act=1, releases=[rel])
    h = read_header(path)
    assert h["ibdate"] == 20200101
    assert h["numxgrid"] == 6 and h["numygrid"] == 4
    np.testing.assert_allclose(h["outheights"], [500.0, 2000.0])
    assert h["species"] == ["AIRTRACER"]
    r = h["releases"][0]
    assert r["npart"] == 1000 and r["comment"] == "TESTREL"
    np.testing.assert_allclose(r["xmass"], [1.5])
    assert h["nageclass"] == 1
    # every record's trailing marker must match its leading marker
    data = path.read_bytes()
    pos = 0
    while pos < len(data):
        n, = struct.unpack_from("<i", data, pos)
        n2, = struct.unpack_from("<i", data, pos + 4 + n)
        assert n == n2
        pos += 8 + n


def test_grid_sparse_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    conc = np.where(rng.random((2, 1, 3, 5, 7)) > 0.6,
                    rng.random((2, 1, 3, 5, 7)), 0.0).astype(np.float32)
    wet = np.where(rng.random((2, 1, 5, 7)) > 0.5,
                   rng.random((2, 1, 5, 7)), 0.0).astype(np.float32)
    path = tmp_path / "grid_conc_20200101010000_001"
    write_grid_sparse(path, 3600, conc, wet, None)
    itime, c2, w2, d2 = read_grid_sparse(path, 7, 5, 3, npoint=2, nage=1)
    assert itime == 3600
    np.testing.assert_allclose(c2, conc, atol=1e-7)
    np.testing.assert_allclose(w2, wet, atol=1e-7)
    np.testing.assert_allclose(d2, 0.0)


def test_simulation_fortran_output(tmp_path):
    from flexpart_tpu.config import (Command, OutGrid, ReleaseBox, Releases,
                                     Species)
    from flexpart_tpu.met import SyntheticMet, make_grid
    from flexpart_tpu.run.simulation import Simulation

    grid = make_grid(nx=37, ny=19, nlev=15, dx=10.0, dy=10.0)
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101, ietime=20000,
                  lsynctime=900, loutstep=3600, loutaver=3600,
                  loutsample=900, lconvection=0)
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=0,
                     lon1=0.0, lon2=2.0, lat1=40.0, lat2=42.0,
                     z1=50.0, z2=500.0, mass=(1.0,), parts=200)
    rel = Releases(species=(Species(),), boxes=(box,))
    og = OutGrid(outlon0=-60.0, outlat0=0.0, numxgrid=60, numygrid=30,
                 dxout=2.0, dyout=2.0, outheights=(500.0, 50000.0))
    sim = Simulation(cmd=cmd, releases=rel, grid=grid,
                     met_backend=SyntheticMet(grid), outgrid=og,
                     outdir=str(tmp_path), write_netcdf=False,
                     write_fortran=True)
    sim.run()
    h = read_header(tmp_path / "header")
    assert h["numxgrid"] == 60
    assert h["releases"][0]["npart"] == 200
    grids = sorted(tmp_path.glob("grid_conc_*_001"))
    assert len(grids) >= 1
    itime, conc, wet, dry = read_grid_sparse(grids[-1], 60, 30, 2)
    # sparse binary must match the npz the same step wrote
    npz = sorted(tmp_path.glob("grid_conc_*.npz"))[-1]
    ref = np.load(npz)["conc"][0, 0, 0]  # (nz,ny,nx)
    np.testing.assert_allclose(conc[0, 0], ref, rtol=2e-6, atol=1e-12)
    assert conc.sum() > 0


def test_ipout3_and_quasilag(tmp_path):
    from flexpart_tpu.config import (Command, OutGrid, ReleaseBox, Releases,
                                     Species)
    from flexpart_tpu.met import SyntheticMet, make_grid
    from flexpart_tpu.run.simulation import Simulation

    grid = make_grid(nx=37, ny=19, nlev=15, dx=10.0, dy=10.0)
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101, ietime=20000,
                  lsynctime=900, loutstep=3600, loutaver=3600,
                  loutsample=900, lconvection=0, ipout=3, mquasilag=1)
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=0,
                     lon1=0.0, lon2=2.0, lat1=40.0, lat2=42.0,
                     z1=50.0, z2=500.0, mass=(1.0,), parts=64)
    rel = Releases(species=(Species(),), boxes=(box,))
    og = OutGrid(outlon0=-60.0, outlat0=0.0, numxgrid=60, numygrid=30,
                 dxout=2.0, dyout=2.0, outheights=(500.0, 50000.0))
    sim = Simulation(cmd=cmd, releases=rel, grid=grid,
                     met_backend=SyntheticMet(grid), outgrid=og,
                     outdir=str(tmp_path), write_netcdf=False,
                     write_npz=False)
    sim.run()
    avg = sorted(tmp_path.glob("partposit_average_*"))
    assert len(avg) >= 1
    recs = np.frombuffer(avg[-1].read_bytes(), "<i2").reshape(-1, 12)
    assert recs.shape[0] == 64
    live = recs[np.abs(recs).sum(axis=1) > 0]
    assert len(live) == 64
    # lon*180 near release (0..2 deg -> 0..360 plus downwind drift)
    lon = live[:, 0] / 180.0
    lat = live[:, 1] / 360.0
    assert (lon > -5).all() and (lon < 30).all()
    assert (lat > 35).all() and (lat < 47).all()
    # averaged temperature reasonable (tt = v/300 + 273.15 in 200..330 K)
    tt = live[:, 9] / 300.0 + 273.15
    assert (tt > 200).all() and (tt < 340).all()

    short = sorted(tmp_path.glob("shortposit_*"))
    assert len(short) >= 1
    data = short[-1].read_bytes()
    n, = struct.unpack_from("<i", data, 16)
    assert n == 64  # release inside the default region window
    # parse interleaved (i4, 3 x i2) payload
    off = 28
    rec0 = struct.unpack_from("<ihhh", data, off)
    assert rec0[0] == 1            # npoint is 1-based
    assert 35 * 360 < rec0[2] < 47 * 360


def test_flux_roundtrip(tmp_path):
    """write_flux <-> read_flux byte-format round trip, both sparse and
    dense branches (fluxoutput.f90:98-268)."""
    from flexpart_tpu.io.fortran_writer import read_flux, write_flux
    rng = np.random.RandomState(0)
    shape = (6, 2, 1, 3, 5, 7, 2)      # (face,nage,kp,kz,jy,ix,ks)
    flux = np.zeros(shape, np.float32)
    # sparse face: a few cells; dense face: >2/5 occupancy
    flux[0, 0, 0, 1, 2, 3, 0] = 4.0e-12
    flux[0, 0, 0, 2, 4, 6, 0] = 8.0e-12
    flux[3, 1, 0] = rng.uniform(1e-12, 5e-12,
                                (3, 5, 7)).astype(np.float32)[..., None]
    areaeast = np.full((3, 5, 7), 2.0)
    areanorth = np.full((3, 5, 7), 4.0)
    area = np.full((5, 7), 8.0)
    path = tmp_path / "grid_flux_20200101000000"
    write_flux(path, 3600, flux, areaeast, areanorth, area, 1800.0)
    itime, out = read_flux(path, shape)
    assert itime == 3600
    expect = np.zeros_like(flux)
    for f, fa in ((0, areaeast), (1, areaeast), (2, areanorth),
                  (3, areanorth), (4, area[None]), (5, area[None])):
        expect[f] = (1.0e12 * flux[f]
                     / np.broadcast_to(fa, flux[f].shape[1:-1])[None, None, ..., None]
                     / 1800.0)
    np.testing.assert_allclose(out, expect.astype(np.float32), rtol=1e-6)


def test_receptor_file_roundtrip(tmp_path):
    from flexpart_tpu.io.fortran_writer import (append_receptor,
                                                read_receptor,
                                                write_receptor_header)
    path = tmp_path / "receptor_conc"
    write_receptor_header(path, ["ALPHA", "B"], [10.0, -20.0],
                          [45.0, -30.0])
    c1 = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    c2 = c1 * 10
    append_receptor(path, 3600, c1)
    append_receptor(path, 7200, c2)
    names, lons, lats, steps = read_receptor(path, nspec=2)
    assert names == ["ALPHA", "B"]
    np.testing.assert_allclose(lons, [10.0, -20.0])
    np.testing.assert_allclose(lats, [45.0, -30.0])
    assert steps[0][0] == 3600 and steps[1][0] == 7200
    np.testing.assert_allclose(steps[0][1], c1)
    np.testing.assert_allclose(steps[1][1], c2)
