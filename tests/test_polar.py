"""Polar-stereographic advance inside the polar caps (advance.f90:754-778).

Deterministic (turboff) advection with uniform winds on a global grid:
the stereographic update must keep zonal transport on a latitude circle
and carry meridional transport smoothly across the pole.
"""
import jax
import jax.numpy as jnp
import numpy as np

from flexpart_tpu.constants import R_EARTH
from flexpart_tpu.core import StepConfig, StepParams, advance_all
from flexpart_tpu.core.state import empty_particles
from flexpart_tpu.met import (calcpar, compute_heights, make_grid,
                              process_eta, solid_rotation_met,
                              uniform_wind_met)


def setup(u=10.0, v=0.0, met_factory=None):
    grid = make_grid(nx=73, ny=37, nlev=12, dx=5.0, dy=5.0,
                     xlon0=-180.0, ylat0=-90.0, xglobal=True)
    met = (met_factory(grid) if met_factory is not None
           else uniform_wind_met(grid, u=u, v=v))
    eta = met.fetch(0.0)
    height = compute_heights(grid, eta)
    zf = calcpar(grid, eta, process_eta(grid, eta, height))
    cfg = StepConfig(nx=grid.nx, ny=grid.ny, nz=grid.nlev, xglobal=True,
                     ldirect=1, turbswitch=False, ifine=1, method=0,
                     turboff=True, polar=True)
    prm = StepParams.make(dx=grid.dx, dy=grid.dy, ylat0=grid.ylat0,
                          xlon0=grid.xlon0, dxconst=grid.dxconst,
                          dyconst=grid.dyconst, lsynctime=900, fine=1.0)
    return grid, zf, cfg, prm


def run_steps(p, zf, cfg, prm, nsteps):
    key = jax.random.PRNGKey(0)
    for i in range(nsteps):
        itime = jnp.int32(i * 900)
        p, _ = advance_all(p, zf, zf, itime, jnp.int32(0),
                           jnp.int32(36000000), jax.random.fold_in(key, i),
                           cfg, prm)
    return p


def place(grid, lons, lats, z=5000.0):
    n = len(lons)
    p = empty_particles(n)
    xs = (np.asarray(lons) - grid.xlon0) / grid.dx
    ys = (np.asarray(lats) - grid.ylat0) / grid.dy
    return p._replace(x_hi=jnp.asarray(xs, jnp.float32),
                      y_hi=jnp.asarray(ys, jnp.float32),
                      z=jnp.full(n, z, jnp.float32),
                      itra=jnp.zeros(n, jnp.int32),
                      mass=jnp.ones((n, 1), jnp.float32),
                      active=jnp.ones(n, bool))


def test_zonal_transport_stays_on_latitude_circle():
    grid, zf, cfg, prm = setup(u=10.0, v=0.0)
    p = place(grid, [0.0, 90.0, -120.0], [85.0, 82.0, 78.0])
    lat0 = grid.ylat0 + np.asarray(p.y) * grid.dy
    q = run_steps(p, zf, cfg, prm, 40)   # 10 h
    lat1 = grid.ylat0 + np.asarray(q.y) * grid.dy
    lon0 = grid.xlon0 + np.asarray(p.x) * grid.dx
    lon1 = grid.xlon0 + np.asarray(q.x) * grid.dx
    # latitude preserved to a fraction of a degree
    np.testing.assert_allclose(lat1, lat0, atol=0.4)
    # zonal angular speed = u/(R cos(lat))
    t = 40 * 900.0
    expect = np.degrees(10.0 * t / (R_EARTH * np.cos(np.radians(lat0))))
    dlon = (lon1 - lon0 + 540.0) % 360.0 - 180.0
    np.testing.assert_allclose(dlon, expect, rtol=0.05)
    assert np.asarray(q.active).all()


def test_great_circle_flow_crosses_pole():
    """Solid-body rotation about an equatorial axis is a true great-circle
    flow: a particle launched due north on the meridian 90 deg east of the
    axis must cross the pole and come down the far-side meridian."""
    grid, zf, cfg, prm = setup(
        met_factory=lambda g: solid_rotation_met(g, vmax=20.0,
                                                 axis_lon=-80.0))
    p = place(grid, [10.0], [88.0])
    # 20 m/s northward: reaches the pole (~2 deg = 222 km) in ~3.1 h,
    # then comes down the far side (lon ~ 190/-170)
    q = run_steps(p, zf, cfg, prm, 32)   # 8 h -> ~5.2 deg of arc
    lat1 = float(grid.ylat0 + np.asarray(q.y)[0] * grid.dy)
    lon1 = float(grid.xlon0 + np.asarray(q.x)[0] * grid.dx)
    t = 32 * 900.0
    arc = np.degrees(20.0 * t / R_EARTH)          # ~5.18 deg
    expect_lat = 90.0 - (arc - 2.0)               # past the pole
    assert abs(lat1 - expect_lat) < 0.5
    dlon = (lon1 - (-170.0) + 540.0) % 360.0 - 180.0
    assert abs(dlon) < 12.0                        # far-side meridian
    assert np.asarray(q.active).all()


def test_uniform_northward_wind_converges_at_pole():
    """A uniform grid wind v>0 everywhere has a convergence point at the
    north pole (on the far side, "northward" points back toward the
    pole), so a particle must hover within one step-length of the pole
    and stay finite/active — it must NOT escape or blow up."""
    grid, zf, cfg, prm = setup(u=0.0, v=20.0)
    p = place(grid, [10.0], [88.0])
    q = run_steps(p, zf, cfg, prm, 32)   # far more than the 3.1 h to pole
    lat1 = float(grid.ylat0 + np.asarray(q.y)[0] * grid.dy)
    step_deg = np.degrees(20.0 * 900.0 / R_EARTH)  # one-step arc ~0.16 deg
    assert lat1 > 90.0 - 2.0 * step_deg
    assert np.isfinite(np.asarray(q.x)).all()
    assert np.asarray(q.active).all()


def test_polar_off_matches_away_from_caps():
    """The stereographic branch must not perturb mid-latitude particles."""
    grid, zf, cfg, prm = setup(u=10.0, v=3.0)
    p = place(grid, [0.0, 40.0], [45.0, -30.0])
    q_pol = run_steps(p, zf, cfg, prm, 10)
    cfg_off = cfg._replace(polar=False)
    q_off = run_steps(p, zf, cfg_off, prm, 10)
    np.testing.assert_allclose(np.asarray(q_pol.x), np.asarray(q_off.x),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(q_pol.y), np.asarray(q_off.y),
                               rtol=1e-6)
