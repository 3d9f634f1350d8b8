"""The single-index direct-only sampler (kernel_possible=False) must be
bit-identical to the general 4-index sampler whenever no particle is
>= 3 h old (conccalc.f90:171: the uniform kernel only triggers for
itage > 10800), and kernel_possible_at must bound ages correctly."""
import jax
import jax.numpy as jnp
import numpy as np

from flexpart_tpu.config import OutGrid
from flexpart_tpu.core import empty_particles
from flexpart_tpu.grid.conccalc import (ConcConfig, kernel_possible_at,
                                        make_conccalc)
from flexpart_tpu.grid.outgrid import OutputGridGeometry, zero_accumulators
from flexpart_tpu.met import (calcpar, compute_heights, make_grid,
                              process_eta, uniform_wind_met)


def _setup(n=5000, itramem=0):
    grid = make_grid(nx=40, ny=30, nlev=15, dx=1.0, dy=1.0,
                     xlon0=0.0, ylat0=20.0, xglobal=False)
    met = uniform_wind_met(grid, u=10.0, v=0.0)
    eta = met.fetch(0.0)
    height = compute_heights(grid, eta)
    z0 = calcpar(grid, eta, process_eta(grid, eta, height))
    key = jax.random.PRNGKey(3)
    kx, ky, kz = jax.random.split(key, 3)
    p = empty_particles(n)
    p = p._replace(
        x_hi=jax.random.uniform(kx, (n,), minval=1.0, maxval=38.0),
        y_hi=jax.random.uniform(ky, (n,), minval=1.0, maxval=28.0),
        z=jax.random.uniform(kz, (n,), minval=5.0, maxval=200.0),
        active=jnp.ones(n, bool),
        itramem=jnp.full((n,), itramem, jnp.int32),
        mass=jnp.full((n, 1), 1.0 / n))
    og = OutGrid(outlon0=0.0, outlat0=20.0, numxgrid=78, numygrid=58,
                 dxout=0.5, dyout=0.5, outheights=(100.0, 500.0, 10000.0))
    geo = OutputGridGeometry(og, grid)
    ccfg = ConcConfig(nxg=geo.nxg, nyg=geo.nyg, nzg=geo.nzg,
                      npointspec=1, nclassunc=1, nage=1,
                      dxout=og.dxout, dyout=og.dyout,
                      xoutshift=geo.xoutshift, youtshift=geo.youtshift,
                      dx_met=grid.dx, dy_met=grid.dy, ind_samp=0)
    cc = make_conccalc(og.outheights)
    acc = zero_accumulators(geo, 1, 1, 1, 1)
    lage = jnp.asarray(np.asarray([999999999], np.int32))
    return p, z0, cc, acc, lage, ccfg


def test_direct_path_matches_kernel_path_for_young_particles():
    itime = 7200                     # age 2 h < 3 h: kernel cannot fire
    p, z0, cc, acc, lage, ccfg = _setup()
    p = p._replace(itra=jnp.full((p.capacity,), itime, jnp.int32))
    a_kernel = cc(acc, p, z0, jnp.int32(itime), lage, jnp.float32(1.0),
                  ccfg._replace(kernel_possible=True))
    a_direct = cc(acc, p, z0, jnp.int32(itime), lage, jnp.float32(1.0),
                  ccfg._replace(kernel_possible=False))
    np.testing.assert_array_equal(np.asarray(a_kernel.gridunc),
                                  np.asarray(a_direct.gridunc))
    assert float(a_direct.gridunc.sum()) > 0.0


def test_kernel_path_differs_once_old():
    itime = 14400                    # age 4 h: kernel active
    p, z0, cc, acc, lage, ccfg = _setup()
    p = p._replace(itra=jnp.full((p.capacity,), itime, jnp.int32))
    a_kernel = cc(acc, p, z0, jnp.int32(itime), lage, jnp.float32(1.0),
                  ccfg._replace(kernel_possible=True))
    a_direct = cc(acc, p, z0, jnp.int32(itime), lage, jnp.float32(1.0),
                  ccfg._replace(kernel_possible=False))
    # same total mass, spread differently (4-point kernel smoothing)
    np.testing.assert_allclose(float(a_kernel.gridunc.sum()),
                               float(a_direct.gridunc.sum()), rtol=1e-5)
    assert np.abs(np.asarray(a_kernel.gridunc)
                  - np.asarray(a_direct.gridunc)).max() > 0.0


def test_kernel_possible_at():
    assert not kernel_possible_at(0, 0)
    assert not kernel_possible_at(10799, 0)
    assert kernel_possible_at(10800, 0)
    assert kernel_possible_at(-10800, 0)          # backward coordinates
    assert kernel_possible_at(0, None)            # unknown -> conservative
    assert not kernel_possible_at(10 ** 9, 0, use_kernel=False)
