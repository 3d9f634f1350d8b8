"""Domain decomposition of met fields — groundwork.

The reference replicates the full met grid on every MPI rank
(README_PARALLEL.md:60-66); the memory ceiling this imposes is the
compile-time `par_mod` grid dimensioning.  The TPU-native design instead
splits the (NF3, nz, ny, nx) field stack into lat/lon tiles with a halo
ring sized by the maximum per-step particle displacement (CFL) plus the
interpolation stencil, so each chip holds only its tile:

  * tiles are built host-side at field load time (the halo is filled by
    slicing the neighbouring tiles' interiors — cyclic in x for global
    grids, clamped at the poles), so no device-side halo exchange is
    needed when a new wind time arrives: the async reader thread
    (run/simulation.py) overlaps the whole rebuild with particle compute;
  * the tile stack has a leading tile axis, shard it with
    NamedSharding(mesh2d, P(("ty","tx"))) and shard_map the advance so
    each device sees exactly its haloed tile;
  * particles interpolate in TILE-LOCAL coordinates: identical bilinear
    weights as the global path (core/interp.py) with the corner indices
    offset by the tile origin, validated to bit-match the global gather;
  * particles that step outside their tile's OWNED region (but stay
    within the halo) are migrated to the owning neighbour between steps
    with `ppermute` ring passes (x then y), replacing the reference's
    `mpif_redist_part` point-to-point transfers (mpi_mod.f90:661-858).

This module provides the tiling, ownership, and tile-local interpolation
pieces with bit-exactness tests; the shard_map'ped advance + ppermute
migration wire-up lands on top of it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class FieldTiles(NamedTuple):
    """Haloed lat/lon tiles of one field stack.

    tiles[t] covers mother-grid columns [x0[t]-halo, x0[t]+tx+halo) and
    rows [y0[t]-halo, y0[t]+ty+halo), x wrapped cyclically (global
    grids) and y clamped at the poles."""
    tiles: jnp.ndarray     # (ntiles, NF3, nz, ty+2h, tx+2h)
    x0: jnp.ndarray        # (ntiles,) i32 owned-region origin column
    y0: jnp.ndarray        # (ntiles,) i32 owned-region origin row
    ntx: int               # tiles in x
    nty: int               # tiles in y
    tx: int                # owned columns per tile
    ty: int                # owned rows per tile
    halo: int

    @property
    def ntiles(self) -> int:
        return self.ntx * self.nty


def halo_for(umax: float, lsynctime: float, dx_deg: float,
             ylat_max: float = 85.0) -> int:
    """Halo width in grid cells from the CFL bound: worst-case zonal
    displacement at the highest resolved latitude plus one cell for the
    bilinear stencil and one for the Petterssen predictor point."""
    m_per_deg = 111198.5 * max(np.cos(np.deg2rad(ylat_max)), 1e-2)
    cells = umax * abs(lsynctime) / (dx_deg * m_per_deg)
    return int(np.ceil(cells)) + 2


def decompose(f3d, nty: int, nx_field: int, ntx: int, halo: int,
              xglobal: bool) -> FieldTiles:
    """Tile a (NF3, nz, ny, nx) stack.  ``nx_field`` excludes the cyclic
    duplicate column (grid.nxfield); ny and nx_field must divide evenly
    by nty/ntx (pad the grid first otherwise)."""
    f = np.asarray(f3d)
    nf, nz, ny, nx = f.shape
    assert ny % nty == 0 and nx_field % ntx == 0, \
        f"({ny},{nx_field}) not divisible by ({nty},{ntx})"
    ty = ny // nty
    tx = nx_field // ntx
    tiles = np.empty((nty * ntx, nf, nz, ty + 2 * halo, tx + 2 * halo),
                     f.dtype)
    x0s = np.empty(nty * ntx, np.int32)
    y0s = np.empty(nty * ntx, np.int32)
    # row index map with pole clamping
    for jt in range(nty):
        y0 = jt * ty
        rows = np.clip(np.arange(y0 - halo, y0 + ty + halo), 0, ny - 1)
        for it in range(ntx):
            x0 = it * tx
            cols = np.arange(x0 - halo, x0 + tx + halo)
            if xglobal:
                cols = cols % nx_field
            else:
                cols = np.clip(cols, 0, nx - 1)
            t = jt * ntx + it
            tiles[t] = f[:, :, rows[:, None], cols[None, :]]
            x0s[t] = x0
            y0s[t] = y0
    return FieldTiles(tiles=jnp.asarray(tiles), x0=jnp.asarray(x0s),
                      y0=jnp.asarray(y0s), ntx=ntx, nty=nty, tx=tx,
                      ty=ty, halo=halo)


def tile_of(x, y, ft: FieldTiles):
    """Owning tile id for mother-grid positions (x, y)."""
    it = jnp.clip((x // ft.tx).astype(jnp.int32), 0, ft.ntx - 1)
    jt = jnp.clip((y // ft.ty).astype(jnp.int32), 0, ft.nty - 1)
    return jt * ft.ntx + it


def local_coords(x, y, tile_id, ft: FieldTiles):
    """Mother-grid (x, y) -> tile-local haloed coordinates."""
    xl = x - ft.x0[tile_id] + ft.halo
    yl = y - ft.y0[tile_id] + ft.halo
    return xl, yl


def in_reach(xl, yl, ft: FieldTiles):
    """Whether a tile-local position can still be interpolated from this
    tile (inside the halo, with one cell of stencil room)."""
    return ((xl >= 0) & (xl <= ft.tx + 2 * ft.halo - 2)
            & (yl >= 0) & (yl <= ft.ty + 2 * ft.halo - 2))


def interp_tile(ft: FieldTiles, tile_id, field_idx: int, x, y, kz):
    """Bilinear interpolation of one field level from each particle's
    owning tile — the tile-local analog of the fused global gather
    (core/interp.py horiz_weights + gather).  Used by the correctness
    tests; the sharded advance applies the same offset arithmetic inside
    shard_map where tile_id is implicit (one tile per device)."""
    xl, yl = local_coords(x, y, tile_id, ft)
    txh = ft.tx + 2 * ft.halo
    tyh = ft.ty + 2 * ft.halo
    ix = jnp.clip(jnp.floor(xl).astype(jnp.int32), 0, txh - 2)
    jy = jnp.clip(jnp.floor(yl).astype(jnp.int32), 0, tyh - 2)
    ddx = jnp.clip(xl - ix, 0.0, 1.0)
    ddy = jnp.clip(yl - jy, 0.0, 1.0)
    f = ft.tiles[tile_id, field_idx, kz]          # (N, tyh, txh)
    n = jnp.arange(x.shape[0])
    v00 = f[n, jy, ix]
    v10 = f[n, jy, ix + 1]
    v01 = f[n, jy + 1, ix]
    v11 = f[n, jy + 1, ix + 1]
    return ((1 - ddx) * (1 - ddy) * v00 + ddx * (1 - ddy) * v10
            + (1 - ddx) * ddy * v01 + ddx * ddy * v11)
