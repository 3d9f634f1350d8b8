"""Core engine tests: interpolation exactness, advection, turbulence physics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexpart_tpu.core import (Particles, StepConfig, StepParams, activate,
                               advance_all, build_release_schedule,
                               empty_particles)
from flexpart_tpu.core.hanna import hanna, hanna1
from flexpart_tpu.core.interp import horiz_weights, vert_weights, interp_wind
from flexpart_tpu.core.state import ds_add, ITRA_INACTIVE
from flexpart_tpu.met import (calcpar, compute_heights, make_grid,
                              process_eta, uniform_wind_met)


@pytest.fixture(scope="module")
def uniform_setup():
    grid = make_grid(nx=40, ny=30, nlev=15, dx=1.0, dy=1.0,
                     xlon0=0.0, ylat0=20.0, xglobal=False)
    met = uniform_wind_met(grid, u=10.0, v=0.0)
    eta = met.fetch(0.0)
    height = compute_heights(grid, eta)
    z0 = process_eta(grid, eta, height)
    z0 = calcpar(grid, eta, z0)
    return grid, z0, height


def make_cfg(grid, lsynctime=900, turboff=False, **kw):
    d = dict(nx=grid.nx, ny=grid.ny, nz=grid.nlev, xglobal=grid.xglobal,
             ldirect=1, turbswitch=False, ifine=1, method=0, turboff=turboff)
    d.update(kw)
    prm = StepParams.make(dx=grid.dx, dy=grid.dy, ylat0=grid.ylat0,
                          dxconst=grid.dxconst, dyconst=grid.dyconst,
                          lsynctime=lsynctime, fine=1.0 / d["ifine"])
    return StepConfig(**d), prm


def test_ds_add_precision():
    hi = jnp.float32(500.0)
    lo = jnp.float32(0.0)
    # accumulate 10000 tiny increments that would each be lost in f32
    d = jnp.float32(1e-5)
    for _ in range(100):
        hi, lo = ds_add(hi, lo, d)
    total = np.float64(hi) + np.float64(lo)
    assert abs(total - (500.0 + 100 * 1e-5)) < 1e-6


def test_interp_uniform_field(uniform_setup):
    grid, z0, height = uniform_setup
    n = 16
    x = jnp.linspace(2.0, 35.0, n)
    y = jnp.linspace(2.0, 25.0, n)
    z = jnp.linspace(50.0, 5000.0, n)
    hw = horiz_weights(x, y, grid.nx, grid.ny, grid.xglobal)
    indz, dz1 = vert_weights(z, z0.height)
    wind = interp_wind(z0, z0, hw, indz, dz1, 0.5, 0.5)
    np.testing.assert_allclose(np.asarray(wind.u), 10.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(wind.v), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(wind.usig), 0.0, atol=1e-4)


def test_pure_advection(uniform_setup):
    """With turbulence off and uniform 10 m/s westerly, particles move east
    by u*dt*dxconst/cos(lat) grid units, z unchanged."""
    grid, z0, height = uniform_setup
    cfg, prm = make_cfg(grid, turboff=True)
    n = 8
    p = empty_particles(n)
    p = p._replace(
        x_hi=jnp.full(n, 10.0), y_hi=jnp.full(n, 5.0),
        z=jnp.full(n, 3000.0),  # above hmix -> free-troposphere branch
        active=jnp.ones(n, bool),
        itra=jnp.zeros(n, jnp.int32),
    )
    key = jax.random.PRNGKey(0)
    p2, diag = advance_all(p, z0, z0, jnp.int32(0), jnp.int32(0),
                           jnp.int32(3600), key, cfg, prm)
    lat = 5.0 * grid.dy + grid.ylat0
    expected_dx = 10.0 * 900 * grid.dxconst / np.cos(np.deg2rad(lat))
    np.testing.assert_allclose(np.asarray(p2.x), 10.0 + expected_dx, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p2.y), 5.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p2.z), 3000.0, atol=1e-3)
    assert int(diag.n_active) == n
    assert int(diag.n_exited) == 0


def test_domain_exit(uniform_setup):
    grid, z0, height = uniform_setup
    cfg, prm = make_cfg(grid, turboff=True)
    n = 4
    p = empty_particles(n)
    p = p._replace(
        x_hi=jnp.full(n, 38.97), y_hi=jnp.full(n, 5.0),
        z=jnp.full(n, 3000.0),
        active=jnp.ones(n, bool), itra=jnp.zeros(n, jnp.int32),
    )
    key = jax.random.PRNGKey(0)
    p2, diag = advance_all(p, z0, z0, jnp.int32(0), jnp.int32(0),
                           jnp.int32(3600), key, cfg, prm)
    assert int(diag.n_exited) == n
    assert not bool(jnp.any(p2.active))


def test_reflection_keeps_particles_in_pbl(uniform_setup):
    """Turbulent particles in the PBL stay in [0, ~h] and above ground."""
    grid, z0, height = uniform_setup
    cfg, prm = make_cfg(grid, turboff=False)
    n = 512
    p = empty_particles(n)
    p = p._replace(
        x_hi=jnp.full(n, 20.0), y_hi=jnp.full(n, 15.0),
        z=jnp.full(n, 50.0),
        active=jnp.ones(n, bool), itra=jnp.zeros(n, jnp.int32),
    )
    key = jax.random.PRNGKey(1)
    itime = 0
    for step in range(8):
        p, diag = advance_all(p, z0, z0, jnp.int32(itime), jnp.int32(0),
                              jnp.int32(7200), jax.random.fold_in(key, step),
                              cfg, prm)
        itime += 900
    zf = np.asarray(p.z)
    assert np.all(zf >= 0.0)
    assert np.all(zf < 15000.0)
    # particles should have dispersed vertically
    assert np.std(zf[np.asarray(p.active)]) > 10.0


def test_hanna_regimes_finite():
    n = 100
    z = jnp.linspace(1.0, 1999.0, n)
    h = jnp.full(n, 2000.0)
    ust = jnp.full(n, 0.3)
    wst = jnp.full(n, 1.5)
    for ol_val in (-50.0, 50.0, 1e6):
        ol = jnp.full(n, ol_val)
        for fn in (hanna, hanna1):
            t = fn(z, h, ust, wst, ol)
            for f in t:
                assert np.all(np.isfinite(np.asarray(f))), (fn.__name__, ol_val)
            assert np.all(np.asarray(t.sigw) > 0)
            assert np.all(np.asarray(t.tlw) >= 30.0)


def test_well_mixed_criterion(uniform_setup):
    """THE core LPDM physics test (reference has a disabled harness for it,
    advance.f90:555-577): an initially well-mixed PBL tracer must STAY
    well-mixed under the Langevin turbulence scheme."""
    grid, z0, height = uniform_setup
    cfg, prm = make_cfg(grid, lsynctime=300, turboff=False)
    n = 4000
    key = jax.random.PRNGKey(7)
    # hmix for the uniform field is ~constant; read it at test point
    from flexpart_tpu.met.fields import F2_HMIX
    hmix = float(np.asarray(z0.f2d[F2_HMIX])[15, 20])
    z_init = jax.random.uniform(key, (n,)) * hmix
    p = empty_particles(n)
    p = p._replace(
        x_hi=jnp.full(n, 20.0), y_hi=jnp.full(n, 15.0), z=z_init,
        active=jnp.ones(n, bool), itra=jnp.zeros(n, jnp.int32),
    )
    itime = 0
    for step in range(24):  # 2 hours
        p, _ = advance_all(p, z0, z0, jnp.int32(itime), jnp.int32(0),
                           jnp.int32(86400), jax.random.fold_in(key, step),
                           cfg, prm)
        itime += 300
    zeta = np.asarray(p.z)[np.asarray(p.active)] / hmix
    zeta = zeta[zeta <= 1.0]
    # fraction in each of 4 layers should stay ~0.25
    counts, _ = np.histogram(zeta, bins=4, range=(0, 1))
    frac = counts / counts.sum()
    assert np.all(np.abs(frac - 0.25) < 0.06), frac


def test_release_schedule_and_activation():
    from flexpart_tpu.config import Command, ReleaseBox, Releases, Species
    grid = make_grid(nx=40, ny=30, nlev=10, dx=1.0, dy=1.0,
                     xlon0=0.0, ylat0=20.0, xglobal=False)
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200101, ietime=60000,
                  lsynctime=900, loutstep=3600, loutaver=3600, loutsample=900)
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200101, itime2=10000,
                     lon1=5.0, lon2=6.0, lat1=25.0, lat2=26.0, z1=10.0,
                     z2=100.0, mass=(2.0,), parts=100)
    rel = Releases(species=(Species(),), boxes=(box,))
    p = build_release_schedule(rel, cmd, grid, capacity=128)
    assert p.capacity == 128
    # 100 particles spread over 0..3600s window -> 4 sync steps of 25
    itras = np.asarray(p.itra[:100])
    assert set(np.unique(itras)) == {0, 900, 1800, 2700}
    np.testing.assert_allclose(np.asarray(p.mass[:100, 0]), 0.02)
    p = activate(p, jnp.int32(0))
    assert int(jnp.sum(p.active)) == 25
    p = activate(p, jnp.int32(900))
    assert int(jnp.sum(p.active)) == 50


def test_well_mixed_adaptive_mode(uniform_setup):
    """Adaptive per-particle time stepping (method=1, ctl=5) must also
    preserve a well-mixed PBL distribution."""
    grid, z0, height = uniform_setup
    cfg, prm = make_cfg(grid, lsynctime=900, turboff=False,
                        turbswitch=True, method=1, ifine=2, maxsubsteps=6)
    prm = prm._replace(ctl=jnp.float32(5.0), fine=jnp.float32(0.5))
    n = 4000
    key = jax.random.PRNGKey(17)
    from flexpart_tpu.met.fields import F2_HMIX
    hmix = float(np.asarray(z0.f2d[F2_HMIX])[15, 20])
    z_init = jax.random.uniform(key, (n,)) * hmix
    p = empty_particles(n)
    p = p._replace(
        x_hi=jnp.full(n, 20.0), y_hi=jnp.full(n, 15.0), z=z_init,
        active=jnp.ones(n, bool), itra=jnp.zeros(n, jnp.int32),
    )
    itime = 0
    for step in range(12):
        p, _ = advance_all(p, z0, z0, jnp.int32(itime), jnp.int32(0),
                           jnp.int32(86400), jax.random.fold_in(key, step),
                           cfg, prm)
        itime += 900
    zeta = np.asarray(p.z)[np.asarray(p.active)] / hmix
    zeta = zeta[zeta <= 1.0]
    counts, _ = np.histogram(zeta, bins=4, range=(0, 1))
    frac = counts / counts.sum()
    assert np.all(np.abs(frac - 0.25) < 0.07), frac


def test_cbl_scheme_finite_and_mixing(uniform_setup):
    """CBLFLAG=1 (skewed bi-Gaussian, raw-velocity wp): particles stay
    finite, inside [0, ~h], and spread through the layer."""
    grid, z0, height = uniform_setup
    cfg, prm = make_cfg(grid, lsynctime=900, turboff=False,
                        turbswitch=True, method=1, ifine=4,
                        cblflag=True, maxsubsteps=4)
    prm = prm._replace(ctl=jnp.float32(5.0), fine=jnp.float32(0.25))
    n = 2000
    key = jax.random.PRNGKey(23)
    from flexpart_tpu.met.fields import F2_HMIX
    hmix = float(np.asarray(z0.f2d[F2_HMIX])[15, 20])
    p = empty_particles(n)
    p = p._replace(
        x_hi=jnp.full(n, 20.0), y_hi=jnp.full(n, 15.0),
        z=jnp.full(n, 0.3 * hmix),
        active=jnp.ones(n, bool), itra=jnp.zeros(n, jnp.int32),
    )
    itime = 0
    for step in range(8):
        p, _ = advance_all(p, z0, z0, jnp.int32(itime), jnp.int32(0),
                           jnp.int32(86400), jax.random.fold_in(key, step),
                           cfg, prm)
        itime += 900
    zf = np.asarray(p.z)
    assert np.all(np.isfinite(zf))
    assert zf.min() >= 0.0
    act = np.asarray(p.active)
    assert np.std(zf[act]) > 20.0


def test_per_species_settling(uniform_setup):
    """Two single-species release points with different particle sizes:
    each particle settles with ITS species' velocity (advance.f90:518-531
    via the first-species-with-mass rule), not species 0's."""
    from flexpart_tpu.config import Species

    grid, z0, height = uniform_setup
    heavy = Species(density=2500.0, dquer=10.0, dsigma=1.0001)
    light = Species(density=1400.0, dquer=0.4, dsigma=1.0001)
    scs = [heavy.size_classes(), light.size_classes()]
    assert scs[0] is not None and scs[1] is not None

    cfg, _ = make_cfg(grid, turboff=True, settling=True, nspec=2)
    prm = StepParams.make(
        dx=grid.dx, dy=grid.dy, ylat0=grid.ylat0,
        dxconst=grid.dxconst, dyconst=grid.dyconst,
        lsynctime=900, fine=1.0,
        sp_density=[heavy.density, light.density],
        sp_dquer=[heavy.dquer, light.dquer],
        sp_cunningham=[c.cunningham for c in scs],
        sp_vsetaver=[c.vsetaver for c in scs])

    n = 8
    p = empty_particles(n, nspec=2)
    mass = np.zeros((n, 2), np.float32)
    mass[: n // 2, 0] = 1.0     # release point A: heavy species only
    mass[n // 2:, 1] = 1.0      # release point B: light species only
    p = p._replace(
        x_hi=jnp.full(n, 10.0), y_hi=jnp.full(n, 5.0),
        z=jnp.full(n, 3000.0),
        mass=jnp.asarray(mass), mass0=jnp.asarray(mass),
        active=jnp.ones(n, bool), itra=jnp.zeros(n, jnp.int32))
    key = jax.random.PRNGKey(0)
    p2, _ = advance_all(p, z0, z0, jnp.int32(0), jnp.int32(0),
                        jnp.int32(3600), key, cfg, prm)
    drop = 3000.0 - np.asarray(p2.z)
    heavy_drop, light_drop = drop[: n // 2], drop[n // 2:]
    # 10 um @ 2500 kg/m3 settles orders of magnitude faster than
    # 0.4 um @ 1400 kg/m3
    assert heavy_drop.min() > 1.0            # ~7 mm/s * 900 s
    assert light_drop.max() < 0.1
    assert heavy_drop.min() > 20 * light_drop.max()


def test_emission_time_factors():
    """Hour-of-day emission factors modulate released particle counts and
    per-particle mass (releaseparticles.f90:40-131): a species emitting
    only 06-18 local time must release nothing at night, and the
    per-particle mass times the count must conserve the total mass rate."""
    from flexpart_tpu.config import Command, ReleaseBox, Releases, Species

    grid = make_grid(nx=40, ny=30, nlev=10, dx=1.0, dy=1.0,
                     xlon0=0.0, ylat0=20.0, xglobal=False)
    # 2020-01-01 is a Wednesday; box at lon ~5.5E -> local ~ UTC (+22 min)
    cmd = Command(ibdate=20200101, ibtime=0, iedate=20200102, ietime=0,
                  lsynctime=900, loutstep=3600, loutaver=3600,
                  loutsample=900)
    day_hours = tuple(2.0 if 6 <= h < 18 else 0.0 for h in range(24))
    sp = Species(area_hour=day_hours)
    assert sp.has_time_variation
    box = ReleaseBox(idate1=20200101, itime1=0, idate2=20200102, itime2=0,
                     lon1=5.0, lon2=6.0, lat1=25.0, lat2=26.0, z1=10.0,
                     z2=100.0, mass=(86.4,), parts=8640)
    rel = Releases(species=(sp,), boxes=(box,))
    p = build_release_schedule(rel, cmd, grid)
    itras = np.asarray(p.itra)
    live = itras > ITRA_INACTIVE // 2
    hrs = (itras[live] // 3600) % 24
    # no releases in local night (factor 0); the tables are in LOCAL time
    # (UTC + lon/360 days), so allow the one boundary hour
    night = (hrs < 5) | (hrs >= 19)
    assert night.sum() == 0, f"night releases at hours {np.unique(hrs[night])}"
    assert (hrs >= 5).sum() > 0
    # total mass released ~ npart * mass/npart (factors average out by
    # construction: count x factor, mass / factor-average)
    total_mass = np.asarray(p.mass[:, 0]).sum()
    np.testing.assert_allclose(total_mass, 86.4, rtol=0.05)


def test_species_time_factor_parsing(tmp_path):
    from flexpart_tpu.config import Species
    f = tmp_path / "SPECIES_099"
    hours = ", ".join(["0.5"] * 12 + ["1.5"] * 12)
    f.write_text(
        "&SPECIES_PARAMS\n"
        " PSPECIES=\"TESTSPEC\",\n"
        f" PAREA_HOUR= {hours},\n"
        " PAREA_DOW= 1.0, 1.0, 1.0, 1.0, 1.0, 0.5, 0.5,\n"
        " /\n")
    sp = Species.from_file(f, specnum=99)
    assert sp.name == "TESTSPEC"
    assert sp.area_hour[0] == 0.5 and sp.area_hour[23] == 1.5
    assert sp.area_dow == (1.0, 1.0, 1.0, 1.0, 1.0, 0.5, 0.5)
    assert sp.has_time_variation
    assert not Species().has_time_variation
