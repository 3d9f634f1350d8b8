"""Met-preprocessing tests: vertical transform and calcpar physics."""
import numpy as np
import pytest

from flexpart_tpu.met import (SyntheticMet, calcpar, compute_heights,
                              make_grid, process_eta, uniform_wind_met)
from flexpart_tpu.met.fields import (F2_HMIX, F2_OLI, F2_TROPO, F2_USTAR,
                                     F2_WSTAR, F3_RHO, F3_DRHODZ, F3_TT,
                                     F3_U, F3_W)


@pytest.fixture(scope="module")
def setup():
    grid = make_grid(nx=37, ny=19, nlev=20, dx=10.0, dy=10.0)
    met = SyntheticMet(grid)
    eta = met.fetch(0.0)
    height = compute_heights(grid, eta)
    z = process_eta(grid, eta, height)
    z = calcpar(grid, eta, z)
    return grid, eta, height, z


def test_heights_monotone(setup):
    grid, eta, height, z = setup
    assert height[0] == 0.0
    assert np.all(np.diff(height) > 0)
    assert 10000.0 < height[-1] < 80000.0


def test_density_profile(setup):
    grid, eta, height, z = setup
    rho = np.asarray(z.f3d[F3_RHO])
    assert np.all(rho > 0)
    # surface density ~1.2, decreasing upward
    assert abs(np.median(rho[0]) - 1.2) < 0.15
    assert np.all(rho[-1] < rho[0])
    drhodz = np.asarray(z.f3d[F3_DRHODZ])
    assert np.median(drhodz) < 0  # density decreases with height


def test_temperature_and_wind_interp(setup):
    grid, eta, height, z = setup
    tt = np.asarray(z.f3d[F3_TT])
    assert np.all(tt > 150) and np.all(tt < 330)
    u = np.asarray(z.f3d[F3_U])
    assert np.max(np.abs(u)) < 80.0
    w = np.asarray(z.f3d[F3_W])
    assert np.max(np.abs(w)) < 5.0  # w in m/s after pinmconv


def test_calcpar_fields(setup):
    grid, eta, height, z = setup
    f2 = np.asarray(z.f2d)
    assert np.all(f2[F2_USTAR] > 0) and np.all(f2[F2_USTAR] < 2.0)
    assert np.all(f2[F2_HMIX] >= 100.0) and np.all(f2[F2_HMIX] <= 4500.0)
    assert np.all(f2[F2_WSTAR] >= 0)
    # some convective (upward flux) columns must develop w* > 0
    assert np.any(f2[F2_WSTAR] > 0.3)
    tropo = f2[F2_TROPO]
    assert np.all(tropo > 2000.0) and np.all(tropo < 20000.0)
    # tropical tropopause higher than polar on average
    ny = tropo.shape[0]
    assert np.mean(tropo[ny // 2 - 2:ny // 2 + 3]) > np.mean(tropo[:3])


def test_uniform_wind_passthrough():
    grid = make_grid(nx=20, ny=15, nlev=15, dx=1.0, dy=1.0,
                     xlon0=0.0, ylat0=30.0, xglobal=False)
    met = uniform_wind_met(grid, u=10.0, v=-3.0)
    eta = met.fetch(0.0)
    height = compute_heights(grid, eta)
    z = process_eta(grid, eta, height)
    u = np.asarray(z.f3d[F3_U])
    assert np.allclose(u, 10.0, atol=1e-3)
    w = np.asarray(z.f3d[F3_W])
    assert np.allclose(w, 0.0, atol=1e-6)


def test_clouds_classification(setup):
    grid, eta, height, z = setup
    cl = np.asarray(z.clouds)
    assert cl.min() >= 0 and cl.max() <= 5
    # synthetic atmosphere has precip bands -> some scavenging classes
    assert np.any(cl > 0)
