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
