"""GFS (NCEP) met ingestion: isobaric-level GRIB2 assembly
(readwind_gfs.f90 analog), below-ground level collapsing in the vertical
transform (verttransform_gfs.f90:146-182), and the profile method for the
missing surface fluxes (pbl_profile.f90)."""
import numpy as np
import pytest

from flexpart_tpu.io import gribio
from flexpart_tpu.met import (calcpar, compute_heights, eta_from_gfs_grib,
                              grid_from_gfs_grib, looks_like_gfs,
                              pbl_profile, process_eta)
from flexpart_tpu.met.fields import F3_U, F3_TT, F3_RHO, F3_QV, F2_SSHF

from test_gribdec import encode_grib2_simple

PLEVELS = [100000, 92500, 85000, 70000, 50000, 30000, 20000, 10000]
NY, NX = 19, 36          # 10-deg global: 36*10=360 -> xglobal


def _field(base, amp=1.0, seed=0):
    rng = np.random.RandomState(seed)
    return base + amp * rng.rand(NY, NX)


def make_gfs_file(tmp_path, name="GF20200101000000"):
    """A synthetic GFS pgrb-style file: T/U/V/W/RH/CLWMR on 8 isobaric
    levels + the surface set, on a 0..350E grid (NCEP convention)."""
    blobs = []

    def add(field, disc, cat, num, ltype, lev):
        # encoded south-up (the assembly accepts either row order)
        blobs.append(encode_grib2_simple(
            np.asarray(field, np.float64), lat1=-90.0, lon1=0.0,
            dlat=10.0, dlon=10.0, disc=disc, cat=cat, num=num,
            level_type=ltype, level=lev))

    for i, p in enumerate(PLEVELS):
        t = 288.0 - 50.0 * i / len(PLEVELS)
        add(_field(t, 2.0, i), 0, 0, 0, 100, p)            # T
        add(_field(10.0 + i, 1.0, 10 + i), 0, 2, 2, 100, p)  # U
        add(_field(-3.0, 1.0, 20 + i), 0, 2, 3, 100, p)      # V
        add(_field(0.01, 0.01, 30 + i), 0, 2, 8, 100, p)     # W (omega)
        add(_field(60.0, 20.0, 40 + i), 0, 1, 1, 100, p)     # RH %
        add(_field(1e-5, 1e-5, 50 + i), 0, 1, 22, 100, p)    # CLWMR
    # surface pressure: high terrain band at rows 8-10 (ps ~ 80 kPa)
    ps = np.full((NY, NX), 101000.0)
    ps[8:11, 10:20] = 80000.0
    add(ps, 0, 3, 0, 1, 0)                                   # SP
    add(_field(287.0, 1.0, 60), 0, 0, 0, 103, 2)             # T2
    add(_field(55.0, 10.0, 61), 0, 1, 1, 103, 2)             # RH2
    add(_field(8.0, 1.0, 62), 0, 2, 2, 103, 10)              # U10
    add(_field(-2.0, 1.0, 63), 0, 2, 3, 103, 10)             # V10
    add(_field(289.0, 1.0, 64), 0, 0, 0, 104, 0)             # T sigma
    add(_field(11.0, 1.0, 65), 0, 2, 2, 104, 0)              # U sigma
    add(_field(-3.0, 1.0, 66), 0, 2, 3, 104, 0)              # V sigma
    add(np.maximum(ps - 80000.0, 0.0) / 50.0, 0, 3, 5, 1, 0)  # TOPO
    add(_field(0.5, 0.5, 67), 2, 0, 0, 1, 0)                 # LSM
    add(_field(2e-4, 2e-4, 68), 0, 1, 7, 1, 0)               # PRATE
    add(_field(1e-4, 1e-4, 69), 0, 1, 196, 1, 0)             # CPRAT
    add(_field(40.0, 30.0, 70), 0, 6, 1, 1, 0)               # TCC %
    path = tmp_path / name
    path.write_bytes(b"".join(blobs))
    return path


@pytest.fixture(scope="module")
def gfs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gfs")
    path = make_gfs_file(tmp)
    grid = grid_from_gfs_grib(path)
    eta = eta_from_gfs_grib(path, grid)
    return path, grid, eta


def test_detect_and_grid(gfs):
    path, grid, eta = gfs
    assert looks_like_gfs(path)
    assert grid.pressure_levels
    assert grid.nlev == len(PLEVELS)
    assert grid.xglobal and grid.nx == NX + 1
    assert grid.xlon0 == -179.0
    # akm bottom-up: highest pressure first, bkm all zero
    assert grid.akm[0] == 100000.0 and grid.akm[-1] == 10000.0
    np.testing.assert_array_equal(grid.bkm, 0.0)


def test_lon_roll_roundtrip(gfs):
    """A value at input lon L must land at grid x=(L-xlon0)/dx."""
    path, grid, eta = gfs
    msgs = [m for m in gribio.scan(path)
            if m.param == 2002 and m.level_type == 100  # (0,2,2) = U
            and m.level == 100000]
    raw = msgs[0].values()                # already south-up, lon 0..350
    # input column for lon=200E = index 20; -> x=(200-360+179)/10+... :
    # lon 200E == -160 -> x = (-160 - (-179))/10 = 1.9 -> col 19? No:
    # -160 = xlon0 + k*dx -> k = 19/10? dx=10 -> k=1.9 not integer;
    # use lon=210E == -150 -> k = 29/10? Use lon=179+..: take lon=0 ->
    # k = 179/10 = 17.9; grid lons are -179,-169,... so lon 1E is k=18.
    # input lon 1E doesn't exist (10-deg grid, lons 0,10,...).  Take
    # input col 0 (lon 0E): x = (0-(-179))/10 = 17.9 -> not a grid
    # point; the roll puts input col j at output col (j + 17) % 36 for
    # i179 = round(179/10) = 18?  Cross-check numerically instead:
    u0 = np.asarray(eta.uuh[0])
    i179 = int(round(179.0 / grid.dx))
    np.testing.assert_allclose(u0[:, :NX], np.roll(raw, i179, axis=1),
                               rtol=1e-5)
    np.testing.assert_allclose(u0[:, -1], u0[:, 0])   # cyclic column


def test_rh_conversion_and_td2(gfs):
    path, grid, eta = gfs
    q = np.asarray(eta.qvh)
    assert (q > 0).all() and (q < 0.05).all()
    # warmer+wetter lowest level has more q than the coldest top level
    assert q[0].mean() > q[-1].mean() * 2
    td2 = np.asarray(eta.td2)
    tt2 = np.asarray(eta.tt2)
    assert (td2 <= tt2 + 0.5).all()
    assert (td2 > 230.0).all()


def test_profile_method_fluxes(gfs):
    path, grid, eta = gfs
    s = np.asarray(eta.surfstr)
    h = np.asarray(eta.sshf)
    assert (s > 0).all() and (s < 10.0).all()
    assert (h >= -400.0).all() and (h <= 200.0).all()
    assert np.isfinite(s).all() and np.isfinite(h).all()


def test_precip_split(gfs):
    path, grid, eta = gfs
    ls = np.asarray(eta.lsprec)
    cv = np.asarray(eta.convprec)
    assert (ls >= 0).all() and (cv >= 0).all()
    assert ls.max() < 5.0 and cv.max() < 5.0     # mm/h scale
    # the CPRAT message (param 0,1,196 — parameterNumber >= 100) must
    # actually be decoded: convective precip is nonzero wherever the
    # synthetic CPRAT field is, and LSP = (PRATE-CPRAT)*3600 elsewhere
    assert cv.max() > 0.0, "CPRAT (0,1,196) not decoded"
    assert ls.max() > 0.0


def test_verttransform_below_ground(gfs):
    """Columns with ps=80 kPa: the 100/92.5/85 kPa levels are below
    ground; the z-grid bottom must take the first above-ground level's
    values, and heights/density must stay physical."""
    path, grid, eta = gfs
    height = compute_heights(grid, eta)
    assert height[0] == 0.0
    assert (np.diff(height) > 0).all()
    assert 2500.0 < height[3] < 12000.0   # ~3 km at 70 kPa
    zf = calcpar(grid, eta, process_eta(grid, eta, height, use_clwc=True))
    u = np.asarray(zf.f3d[F3_U])
    tt = np.asarray(zf.f3d[F3_TT])
    rho = np.asarray(zf.f3d[F3_RHO])
    assert np.isfinite(u).all() and np.isfinite(rho).all()
    assert (rho > 0).all() and (rho[0] > rho[-1]).all()
    # mountain column (row 9; input col 12 -> col 30 after the lon
    # roll): bottom z-level == value at 70 kPa (llev=3)
    raw_u70 = np.asarray(eta.uuh)[3]
    np.testing.assert_allclose(u[0, 9, 30], raw_u70[9, 30], rtol=1e-4)
    # sea-level column: bottom == lowest pressure level (100 kPa)
    raw_u100 = np.asarray(eta.uuh)[0]
    np.testing.assert_allclose(u[0, 2, 2], raw_u100[2, 2], rtol=1e-4)
    assert 200.0 < tt.min() and tt.max() < 320.0


def test_pbl_profile_scalar_cases():
    """The vectorized profile method must reproduce hand-computed
    regimes: neutral (hf=0), no-shear (ustar=0.01), and stable
    stratification (hf>0, downward, in the ECMWF sign convention that
    calcpar consumes)."""
    ps = np.full(3, 101325.0)
    td2 = np.full(3, 280.0)
    t2 = np.array([288.0, 288.0, 288.0])
    #        neutral dT       no shear        stable dT>0
    tml1 = np.array([288.0 - 0.0098 * 28.0, 290.0, 291.0])
    u10 = np.array([5.0, 5.0, 5.0])
    uml1 = np.array([7.0, 5.0, 7.0])
    stress, hf = pbl_profile(ps, td2, 30.0, t2, tml1, u10, uml1)
    rhoa = 101325.0 / (287.05 * (288.0 * (1 + 0.378 * 991.8 / 101325.0)))
    # neutral: ustar = k*du/log(z1/10)
    ust_n = 0.40 * 2.0 / np.log(3.0)
    assert abs(stress[0] - ust_n ** 2 * rhoa) / stress[0] < 0.05
    assert hf[0] == 0.0
    assert abs(stress[1] - 0.01 ** 2 * rhoa) / stress[1] < 0.05
    assert hf[1] == 0.0
    assert hf[2] > 0.0 and stress[2] > 0.0


def test_hmix_ignores_below_ground_levels(gfs):
    """The Richardson mixing-height scan must start at the first
    above-ground level (the reference's llev, richardson.f90:77-110):
    poisoning the below-ground isobaric levels (p > ps) must not change
    hmix, Obukhov length or the tropopause anywhere."""
    import jax.numpy as jnp
    from flexpart_tpu.met.fields import F2_HMIX, F2_OLI, F2_TROPO

    path, grid, eta = gfs
    height = compute_heights(grid, eta)
    base = calcpar(grid, eta, process_eta(grid, eta, height, use_clwc=True))

    # poison every level that lies below ground anywhere (p >= min ps)
    ps = np.asarray(eta.ps)
    plev = np.asarray(grid.akm)
    below = plev[:, None, None] >= ps[None]          # (nlev, ny, nx)
    assert below.any(), "fixture must have below-ground levels"
    tth = np.asarray(eta.tth).copy()
    uuh = np.asarray(eta.uuh).copy()
    tth[below] = 150.0                               # absurd cold
    uuh[below] = 80.0                                # absurd jet
    eta_bad = eta._replace(tth=jnp.asarray(tth), uuh=jnp.asarray(uuh))
    bad = calcpar(grid, eta_bad,
                  process_eta(grid, eta, height, use_clwc=True))

    np.testing.assert_allclose(np.asarray(base.f2d[F2_HMIX]),
                               np.asarray(bad.f2d[F2_HMIX]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(base.f2d[F2_OLI]),
                               np.asarray(bad.f2d[F2_OLI]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(base.f2d[F2_TROPO]),
                               np.asarray(bad.f2d[F2_TROPO]), rtol=1e-5)
