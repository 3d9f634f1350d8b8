"""Output grid geometry and accumulators.

Re-design of outg_mod.f90 / outgrid_init.f90 / unc_mod.f90: cell areas and
volumes on the sphere, and the 7-D concentration accumulator
gridunc(ix,jy,kz,ks,kp,nclass,nage) — stored here as
(nage, nclass, kp, ks, kz, jy, ix) with the spatial axes innermost so the
particle scatter-add is a single flat-index segment update.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import OutGrid
from ..constants import PI, PI180, R_EARTH
from ..met.grid import MetGrid


@dataclasses.dataclass(frozen=True)
class OutputGridGeometry:
    """Static geometry derived from the OUTGRID config + mother met grid."""
    og: OutGrid
    met: MetGrid

    @property
    def nxg(self) -> int:
        return self.og.numxgrid

    @property
    def nyg(self) -> int:
        return self.og.numygrid

    @property
    def nzg(self) -> int:
        return self.og.numzgrid

    @property
    def outheight(self) -> np.ndarray:
        return np.asarray(self.og.outheights, np.float64)

    # met-grid-units <-> output-grid-units shifts (outgrid_init.f90 header)
    @property
    def xoutshift(self) -> float:
        return self.met.xlon0 - self.og.outlon0

    @property
    def youtshift(self) -> float:
        return self.met.ylat0 - self.og.outlat0

    @functools.cached_property
    def area(self) -> np.ndarray:
        """Cell surface area [m2], (nyg, nxg) (outgrid_init.f90:210-243)."""
        jy = np.arange(self.nyg)
        ylat = self.og.outlat0 + (jy + 0.5) * self.og.dyout
        ylatp = ylat + 0.5 * self.og.dyout
        ylatm = ylat - 0.5 * self.og.dyout
        # zone height between the two latitude circles
        opposite = (ylatm < 0) & (ylatp > 0)
        hzone = np.where(
            opposite,
            np.sin(np.deg2rad(ylatp)) - np.sin(np.deg2rad(ylatm)),
            np.abs(np.sqrt(1 - np.cos(np.deg2rad(ylatp)) ** 2)
                   - np.sqrt(1 - np.cos(np.deg2rad(ylatm)) ** 2))) * R_EARTH
        gridarea = 2.0 * PI * R_EARTH * hzone * self.og.dxout / 360.0
        return np.broadcast_to(gridarea[:, None], (self.nyg, self.nxg)).copy()

    @functools.cached_property
    def volume(self) -> np.ndarray:
        """Cell volume [m3], (nzg, nyg, nxg)."""
        oh = self.outheight
        dz = np.diff(np.concatenate([[0.0], oh]))
        return dz[:, None, None] * self.area[None]

    @functools.cached_property
    def areaeast(self) -> np.ndarray:
        """Eastward-facing cell wall area [m2], (nzg, nyg, nxg)
        (outgrid_init.f90:88-93)."""
        oh = self.outheight
        dz = np.diff(np.concatenate([[0.0], oh]))
        ae = dz * self.og.dyout * R_EARTH * PI / 180.0
        return np.broadcast_to(ae[:, None, None],
                               (self.nzg, self.nyg, self.nxg)).copy()

    @functools.cached_property
    def areanorth(self) -> np.ndarray:
        """Northward-facing cell wall area [m2], (nzg, nyg, nxg)
        (outgrid_init.f90:89-95)."""
        oh = self.outheight
        dz = np.diff(np.concatenate([[0.0], oh]))
        ylat = self.og.outlat0 + (np.arange(self.nyg) + 0.5) \
            * self.og.dyout
        an = (np.cos(np.deg2rad(ylat))[None] * dz[:, None]
              * self.og.dxout * R_EARTH * PI / 180.0)
        return np.broadcast_to(an[:, :, None],
                               (self.nzg, self.nyg, self.nxg)).copy()


class Accumulators(NamedTuple):
    """Device-resident output accumulators (unc_mod.f90:17-37).  Species is
    the innermost axis so the particle scatter adds all species of a
    particle with one flat index."""
    gridunc: jnp.ndarray    # (nage, nclass, kp, nzg, nyg, nxg, ks) f32
    wetgridunc: jnp.ndarray # (nage, nclass, kp, nyg, nxg, ks) f32
    drygridunc: jnp.ndarray # (nage, nclass, kp, nyg, nxg, ks) f32
    outnum: jnp.ndarray     # number of samples accumulated (scalar f32)


def zero_accumulators(geo: OutputGridGeometry, nspec: int, npointspec: int,
                      nclassunc: int = 1, nage: int = 1) -> Accumulators:
    shape3 = (nage, nclassunc, npointspec, geo.nzg, geo.nyg, geo.nxg, nspec)
    shape2 = (nage, nclassunc, npointspec, geo.nyg, geo.nxg, nspec)
    return Accumulators(
        gridunc=jnp.zeros(shape3, jnp.float32),
        wetgridunc=jnp.zeros(shape2, jnp.float32),
        drygridunc=jnp.zeros(shape2, jnp.float32),
        outnum=jnp.zeros((), jnp.float32),
    )
