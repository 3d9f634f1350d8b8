"""Domain decomposition groundwork: haloed field tiling must reproduce
the global bilinear interpolation bit-exactly for every particle whose
position is within its owning tile's reach."""
import jax.numpy as jnp
import numpy as np

from flexpart_tpu.met.fields import F3_U
from flexpart_tpu.parallel.domain import (FieldTiles, decompose, halo_for,
                                          in_reach, interp_tile,
                                          local_coords, tile_of)


def _global_bilinear(f2, x, y, xglobal, nxf):
    ix = np.floor(x).astype(int)
    jy = np.floor(y).astype(int)
    ddx, ddy = x - ix, y - jy
    ixp = (ix + 1) % nxf if xglobal else ix + 1
    return ((1 - ddx) * (1 - ddy) * f2[jy, ix]
            + ddx * (1 - ddy) * f2[jy, ixp]
            + (1 - ddx) * ddy * f2[jy + 1, ix]
            + ddx * ddy * f2[jy + 1, ixp])


def test_tiling_matches_global_interp():
    rng = np.random.default_rng(0)
    nf, nz, ny, nxf = 3, 4, 36, 72
    f = rng.standard_normal((nf, nz, ny, nxf + 1)).astype(np.float32)
    f[..., -1] = f[..., 0]                       # cyclic column
    halo = 3
    ft = decompose(f, nty=4, nx_field=nxf, ntx=6, halo=halo,
                   xglobal=True)
    assert ft.tiles.shape == (24, nf, nz, 9 + 2 * halo, 12 + 2 * halo)
    n = 5000
    x = rng.uniform(0.0, nxf - 1e-3, n).astype(np.float32)
    y = rng.uniform(0.0, ny - 1.001, n).astype(np.float32)
    tid = tile_of(jnp.asarray(x), jnp.asarray(y), ft)
    kz = jnp.asarray(rng.integers(0, nz, n))
    got = interp_tile(ft, tid, F3_U, jnp.asarray(x), jnp.asarray(y), kz)
    want = np.array([_global_bilinear(f[F3_U, int(kz[i])], x[i:i+1],
                                      y[i:i+1], True, nxf)[0]
                     for i in range(0, n, 97)])
    got_s = np.asarray(got)[::97]
    np.testing.assert_allclose(got_s, want, rtol=1e-4,
                               atol=5e-6)


def test_halo_reach_covers_cfl_displacement():
    """A particle displaced by the CFL-sized halo bound must still be
    interpolable from its ORIGINAL tile (migration can lag one step)."""
    rng = np.random.default_rng(1)
    nf, nz, ny, nxf = 2, 3, 36, 72
    f = rng.standard_normal((nf, nz, ny, nxf + 1)).astype(np.float32)
    f[..., -1] = f[..., 0]
    halo = halo_for(umax=60.0, lsynctime=900.0, dx_deg=5.0)
    assert 2 <= halo <= 6
    ft = decompose(f, nty=3, nx_field=nxf, ntx=4, halo=halo,
                   xglobal=True)
    x = np.asarray([10.0, 30.0, 50.0], np.float32)
    y = np.asarray([6.0, 18.0, 30.0], np.float32)
    tid = tile_of(jnp.asarray(x), jnp.asarray(y), ft)
    # worst-case one-step displacement in grid cells
    d = halo - 2
    for dx, dy in ((d, 0), (-d, 0), (0, d), (0, -d), (d, d)):
        xl, yl = local_coords(jnp.asarray(x + dx), jnp.asarray(y + dy),
                              tid, ft)
        assert bool(in_reach(xl, yl, ft).all())
        got = interp_tile(ft, tid, 0, jnp.asarray(x + dx),
                          jnp.asarray(y + dy),
                          jnp.zeros(3, jnp.int32))
        for i in range(3):
            want = _global_bilinear(f[0, 0],
                                    np.asarray([(x[i] + dx) % nxf]),
                                    np.asarray([min(y[i] + dy,
                                                    ny - 1.001)]),
                                    True, nxf)[0]
            np.testing.assert_allclose(float(got[i]), want,
                                       rtol=1e-4, atol=5e-6)


def test_pole_clamp_and_seam_wrap():
    """Tiles at the pole rows clamp their halo; tiles at the seam wrap."""
    rng = np.random.default_rng(2)
    f = rng.standard_normal((1, 1, 12, 25)).astype(np.float32)
    f[..., -1] = f[..., 0]
    ft = decompose(f, nty=2, nx_field=24, ntx=2, halo=2, xglobal=True)
    t0 = np.asarray(ft.tiles[0, 0, 0])           # south-west tile
    # south halo rows are clamped copies of row 0
    np.testing.assert_array_equal(t0[0], t0[1])
    np.testing.assert_array_equal(t0[1], t0[2])
    # west halo columns wrap to the east end of the grid
    np.testing.assert_array_equal(t0[2:, 0], f[0, 0, :6 + 2, 22])
    np.testing.assert_array_equal(t0[2:, 1], f[0, 0, :6 + 2, 23])


def test_ppermute_migration():
    """Particles that cross tile edges move to the owning neighbour via
    the ppermute ring passes, with nothing lost and state intact."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from flexpart_tpu.core.state import empty_particles
    from flexpart_tpu.parallel.domain import (make_migrate, shard_by_tile,
                                              AX_TY, AX_TX)

    nty, ntx = 2, 4
    tx, ty = 18, 18                 # grid 72 x 36 split 4 x 2
    local_cap = 64
    devs = np.asarray(jax.devices()[:8]).reshape(nty, ntx)
    mesh = Mesh(devs, (AX_TY, AX_TX))

    rng = np.random.default_rng(3)
    n = 150
    p = empty_particles(nty * ntx * local_cap)
    d = {k: np.asarray(getattr(p, k)) for k in p._fields}
    # start positions anywhere; npoint = unique id
    x = rng.uniform(0, 71.99, n).astype(np.float32)
    y = rng.uniform(0, 35.99, n).astype(np.float32)
    src = {k: v.copy() for k, v in d.items()}
    for k, v in (("x_hi", x), ("y_hi", y)):
        src[k][:n] = v
    src["active"][:n] = True
    src["itra"][:n] = 0
    src["npoint"][:n] = np.arange(1, n + 1)
    src["mass"][:n] = rng.uniform(0.5, 2.0, (n, 1)).astype(np.float32)

    # shard by the tile that owns the ORIGINAL position, then displace
    # every particle by up to one tile so many cross edges
    from flexpart_tpu.parallel.domain import FieldTiles
    ft = FieldTiles(tiles=jnp.zeros(1), x0=jnp.zeros(1), y0=jnp.zeros(1),
                    ntx=ntx, nty=nty, tx=tx, ty=ty, halo=2)
    tiled = shard_by_tile(src, ft, local_cap)
    dx = rng.uniform(-tx, tx, nty * ntx * local_cap).astype(np.float32)
    dy = rng.uniform(-ty, ty, nty * ntx * local_cap).astype(np.float32)
    tiled["x_hi"] = (tiled["x_hi"] + dx * tiled["active"]) % 72.0
    tiled["y_hi"] = np.clip(tiled["y_hi"] + dy * tiled["active"],
                            0.0, 35.99)

    sh = NamedSharding(mesh, P((AX_TY, AX_TX)))
    from flexpart_tpu.core.state import Particles
    pt = Particles(**{k: jax.device_put(jnp.asarray(v), sh)
                      for k, v in tiled.items()})
    migrate = make_migrate(mesh, ntx, nty, tx, ty, msg_cap=64)
    out, n_bad = migrate(pt)
    assert int(n_bad) == 0
    act = np.asarray(out.active)
    assert act.sum() == n               # nothing lost
    xs = np.asarray(out.x_hi)[act]
    ys = np.asarray(out.y_hi)[act]
    gidx = np.nonzero(act)[0]
    holder = gidx // local_cap          # tile that physically holds it
    owner = (np.clip((ys // ty).astype(int), 0, nty - 1) * ntx
             + np.clip((xs // tx).astype(int), 0, ntx - 1))
    np.testing.assert_array_equal(holder, owner)
    # state travels with the particle: mass keyed by npoint id
    ids = np.asarray(out.npoint)[act]
    m_out = np.asarray(out.mass)[act, 0]
    m_in = src["mass"][:n, 0]
    order = np.argsort(ids)
    np.testing.assert_allclose(m_out[order], m_in[np.sort(ids) - 1])


def test_tiled_advance_matches_global():
    """The full distributed step (tile-local advance + global BCs +
    migration) must reproduce the single-device global advance exactly
    (deterministic turboff config, uniform wind)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from flexpart_tpu.core import StepConfig, StepParams, advance_all
    from flexpart_tpu.core.state import empty_particles
    from flexpart_tpu.met import (calcpar, compute_heights, make_grid,
                                  process_eta, uniform_wind_met)
    from flexpart_tpu.parallel.domain import (AX_TX, AX_TY,
                                              decompose_zfields,
                                              make_tiled_advance,
                                              shard_by_tile, FieldTiles)

    grid = make_grid(nx=73, ny=36, nlev=10, dx=5.0, dy=5.0,
                     ylat0=-87.5, xglobal=True)
    met = uniform_wind_met(grid, u=25.0, v=5.0)
    eta = met.fetch(0.0)
    height = compute_heights(grid, eta)
    zf = calcpar(grid, eta, process_eta(grid, eta, height))
    cfg = StepConfig(nx=grid.nx, ny=grid.ny, nz=grid.nlev, xglobal=True,
                     ldirect=1, turbswitch=False, ifine=1, method=0,
                     turboff=True)
    prm = StepParams.make(dx=5.0, dy=5.0, ylat0=-87.5, xlon0=-180.0,
                          dxconst=grid.dxconst, dyconst=grid.dyconst,
                          lsynctime=900, fine=1.0)
    rng = np.random.default_rng(7)
    n = 200
    x = rng.uniform(0.0, 71.9, n).astype(np.float32)
    y = rng.uniform(2.0, 33.9, n).astype(np.float32)
    z = rng.uniform(100.0, 9000.0, n).astype(np.float32)

    # --- global reference run ---
    pg = empty_particles(n)._replace(
        x_hi=jnp.asarray(x), y_hi=jnp.asarray(y), z=jnp.asarray(z),
        itra=jnp.zeros(n, jnp.int32), mass=jnp.ones((n, 1), jnp.float32),
        npoint=jnp.arange(1, n + 1, dtype=jnp.int32),
        active=jnp.ones(n, bool))
    key = jax.random.PRNGKey(0)
    qg = pg
    steps = 6
    for i in range(steps):
        qg, _ = advance_all(qg, zf, zf, jnp.int32(i * 900), jnp.int32(0),
                            jnp.int32(36000000),
                            jax.random.fold_in(key, i), cfg, prm)

    # --- tiled run on a 2x4 mesh ---
    nty, ntx = 2, 4
    tx, ty = 18, 18
    halo = 4
    local_cap = 128
    devs = np.asarray(jax.devices()[:8]).reshape(nty, ntx)
    mesh = Mesh(devs, (AX_TY, AX_TX))
    sh = NamedSharding(mesh, P((AX_TY, AX_TX)))
    zt = decompose_zfields(zf, nty, ntx, halo, nx_field=72, xglobal=True)
    from flexpart_tpu.met.fields import ZFields
    zt = ZFields(*[jax.device_put(a, sh) if i < 4 else a
                   for i, a in enumerate(zt)])
    src = {k: np.asarray(getattr(pg, k)) for k in pg._fields}
    ftdims = FieldTiles(tiles=jnp.zeros(1), x0=jnp.zeros(1),
                        y0=jnp.zeros(1), ntx=ntx, nty=nty, tx=tx, ty=ty,
                        halo=halo)
    tiled = shard_by_tile(src, ftdims, local_cap)
    from flexpart_tpu.core.state import Particles
    pt = Particles(**{k: jax.device_put(jnp.asarray(v), sh)
                      for k, v in tiled.items()})
    step = make_tiled_advance(mesh, cfg, ntx, nty, tx, ty, halo,
                              msg_cap=128)
    for i in range(steps):
        pt, n_act, n_bad = step(pt, zt, zt, jnp.int32(i * 900),
                                jnp.int32(0), jnp.int32(36000000),
                                jax.random.fold_in(key, i), prm)
        assert int(n_bad) == 0
    assert int(n_act) == n

    # match by particle id
    act = np.asarray(pt.active)
    ids = np.asarray(pt.npoint)[act]
    xs = np.asarray(pt.x_hi)[act] + np.asarray(pt.x_lo)[act]
    ys = np.asarray(pt.y_hi)[act] + np.asarray(pt.y_lo)[act]
    zs = np.asarray(pt.z)[act]
    o = np.argsort(ids)
    xg = np.asarray(qg.x_hi) + np.asarray(qg.x_lo)
    yg = np.asarray(qg.y_hi) + np.asarray(qg.y_lo)
    assert np.asarray(qg.active).all()
    np.testing.assert_allclose(xs[o], xg[np.sort(ids) - 1], atol=2e-3)
    np.testing.assert_allclose(ys[o], yg[np.sort(ids) - 1], atol=2e-3)
    np.testing.assert_allclose(zs[o], np.asarray(qg.z)[np.sort(ids) - 1],
                               atol=0.5)


def test_tiled_advance_polar_caps():
    """Tile mode with polar caps ON: particles poleward of 75 deg take
    the global-coordinate stereographic update (ADVICE r1: previously the
    tiled step silently used the plain metric update there).  Particles
    that never enter a cap must match the global run bitwise; cap
    particles keep the exact predictor (corrector skipped in tile mode)
    so they stay physical and none are lost — multi-hop migration routes
    their trans-polar x jumps."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from flexpart_tpu.core import StepConfig, StepParams, advance_all
    from flexpart_tpu.core.state import Particles, empty_particles
    from flexpart_tpu.met import (calcpar, compute_heights, make_grid,
                                  process_eta, uniform_wind_met)
    from flexpart_tpu.met.fields import ZFields
    from flexpart_tpu.parallel.domain import (AX_TX, AX_TY, FieldTiles,
                                              decompose_zfields,
                                              make_tiled_advance,
                                              shard_by_tile)

    grid = make_grid(nx=73, ny=37, nlev=10, dx=5.0, dy=5.0,
                     ylat0=-90.0, xglobal=True)
    met = uniform_wind_met(grid, u=20.0, v=8.0)
    eta = met.fetch(0.0)
    zf = calcpar(grid, eta,
                 process_eta(grid, eta, compute_heights(grid, eta)))
    cfg = StepConfig(nx=grid.nx, ny=grid.ny, nz=grid.nlev, xglobal=True,
                     ldirect=1, turbswitch=False, ifine=1, method=0,
                     turboff=True, polar=True)
    prm = StepParams.make(dx=5.0, dy=5.0, ylat0=-90.0, xlon0=-180.0,
                          dxconst=grid.dxconst, dyconst=grid.dyconst,
                          lsynctime=900, fine=1.0)
    rng = np.random.default_rng(11)
    n = 160
    x = rng.uniform(0.0, 71.9, n).astype(np.float32)
    # half mid-latitude, half pole-adjacent (y=34.2 -> 81 N, cap region)
    y = np.concatenate([rng.uniform(8.0, 26.0, n // 2),
                        rng.uniform(33.5, 35.6, n - n // 2)]) \
        .astype(np.float32)
    z = rng.uniform(3000.0, 9000.0, n).astype(np.float32)

    pg = empty_particles(n)._replace(
        x_hi=jnp.asarray(x), y_hi=jnp.asarray(y), z=jnp.asarray(z),
        itra=jnp.zeros(n, jnp.int32), mass=jnp.ones((n, 1), jnp.float32),
        npoint=jnp.arange(1, n + 1, dtype=jnp.int32),
        active=jnp.ones(n, bool))
    key = jax.random.PRNGKey(4)
    steps = 6
    qg = pg
    switch_y = (75.0 - (-90.0)) / 5.0          # grid row of +75 deg
    ever_cap = np.zeros(n, bool)
    for i in range(steps):
        ever_cap |= np.asarray(qg.y) > switch_y
        qg, _ = advance_all(qg, zf, zf, jnp.int32(i * 900), jnp.int32(0),
                            jnp.int32(36000000),
                            jax.random.fold_in(key, i), cfg, prm)
    ever_cap |= np.asarray(qg.y) > switch_y

    nty, ntx = 2, 4
    tx, ty = 18, 18
    halo = 4
    devs = np.asarray(jax.devices()[:8]).reshape(nty, ntx)
    mesh = Mesh(devs, (AX_TY, AX_TX))
    sh = NamedSharding(mesh, P((AX_TY, AX_TX)))
    # ny=37 rows: last tile row covers y in [18, 36] via halo slack
    zt = decompose_zfields(zf, nty, ntx, halo, nx_field=72, xglobal=True)
    zt = ZFields(*[jax.device_put(a, sh) if i < 4 else a
                   for i, a in enumerate(zt)])
    src = {k: np.asarray(getattr(pg, k)) for k in pg._fields}
    ftdims = FieldTiles(tiles=jnp.zeros(1), x0=jnp.zeros(1),
                        y0=jnp.zeros(1), ntx=ntx, nty=nty, tx=tx, ty=ty,
                        halo=halo)
    tiled = shard_by_tile(src, ftdims, 256)
    pt = Particles(**{k: jax.device_put(jnp.asarray(v), sh)
                      for k, v in tiled.items()})
    step = make_tiled_advance(mesh, cfg, ntx, nty, tx, ty, halo,
                              msg_cap=256)
    for i in range(steps):
        pt, n_act, n_bad = step(pt, zt, zt, jnp.int32(i * 900),
                                jnp.int32(0), jnp.int32(36000000),
                                jax.random.fold_in(key, i), prm)
        assert int(n_bad) == 0
    assert int(n_act) == n, "particles lost near the poles"

    act = np.asarray(pt.active)
    ids = np.asarray(pt.npoint)[act] - 1
    xs = (np.asarray(pt.x_hi) + np.asarray(pt.x_lo))[act]
    ys = (np.asarray(pt.y_hi) + np.asarray(pt.y_lo))[act]
    zs = np.asarray(pt.z)[act]
    gx = np.asarray(qg.x)
    gy = np.asarray(qg.y)
    gz = np.asarray(qg.z)

    order = np.argsort(ids)
    ids_s = ids[order]
    np.testing.assert_array_equal(ids_s, np.arange(n))
    mid = ~ever_cap
    # never-cap particles: identical to the global run up to 1-ULP f32
    # rounding of the tile-origin latitude arithmetic ((y_local*dy +
    # (ylat0+y0*dy)) vs (y_global*dy + ylat0) in the cosfact metric)
    np.testing.assert_allclose(xs[order][mid], gx[mid], rtol=5e-7,
                               atol=1e-5)
    np.testing.assert_allclose(ys[order][mid], gy[mid], rtol=5e-7,
                               atol=1e-5)
    np.testing.assert_allclose(zs[order][mid], gz[mid], rtol=5e-7,
                               atol=1e-3)
    # cap particles: physical and close (corrector-only difference)
    cap = ever_cap
    assert cap.sum() > 20
    assert np.isfinite(xs[order][cap]).all()
    assert (ys[order][cap] <= 36.0 + 1e-3).all()
    np.testing.assert_allclose(ys[order][cap], gy[cap], atol=0.35)
    np.testing.assert_allclose(zs[order][cap], gz[cap], atol=1.0)
