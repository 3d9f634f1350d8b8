"""Plume-centroid trajectories with 5-cluster k-means (iout=4/5).

Re-design of plumetraj.f90 + clustering.f90 + centerofmass.f90: per
release point per output step, compute the particle cloud's center of
mass (on the unit sphere to handle date-line wrap), the fractions in
PBL / troposphere / |PV|<2 pvu, rms distances, and a 5-cluster
spherical k-means — written as one vectorized fixed-iteration pass over
(N, K) distance matrices instead of the reference's per-particle loops.
Appends to `trajectories.txt` in the reference's column layout.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from ..constants import PI180, R_EARTH

NCLUSTER = 5


def _sphere_dist(lat1, lon1, lat2, lon2):
    """Great-circle distance [m]; inputs in radians (distance2 analog)."""
    s = np.sin(0.5 * (lat1 - lat2)) ** 2 \
        + np.cos(lat1) * np.cos(lat2) * np.sin(0.5 * (lon1 - lon2)) ** 2
    return 2.0 * R_EARTH * np.arcsin(np.minimum(np.sqrt(s), 1.0))


def cluster_particles(lon_deg, lat_deg, z, iterations: int = 20):
    """5-cluster spherical k-means (clustering.f90): returns
    (lon, lat, z, fraction, rms) per cluster + total rms [km]."""
    n = len(lon_deg)
    lon = np.deg2rad(lon_deg)
    lat = np.deg2rad(lat_deg)
    k = NCLUSTER
    if n < k:
        return None
    sel = (np.arange(1, k + 1) * n) // k - 1
    clon, clat = lon[sel].copy(), lat[sel].copy()
    for _ in range(iterations):
        d = _sphere_dist(lat[:, None], lon[:, None],
                         clat[None, :], clon[None, :])       # (N, K)
        ncl = np.argmin(d, axis=1)
        # spherical mean per cluster (clustering.f90:108-125)
        x = np.cos(lat) * np.sin(lon)
        y = -np.cos(lat) * np.cos(lon)
        zc = np.sin(lat)
        for j in range(k):
            m = ncl == j
            if m.sum() == 0:
                continue
            xm, ym, zm = x[m].mean(), y[m].mean(), zc[m].mean()
            clon[j] = np.arctan2(xm, -ym)
            clat[j] = np.arctan2(zm, np.sqrt(xm * xm + ym * ym))
    d = _sphere_dist(lat[:, None], lon[:, None], clat[None, :],
                     clon[None, :])
    ncl = np.argmin(d, axis=1)
    dmin = d[np.arange(n), ncl]
    rms = float(np.sqrt(np.mean(dmin ** 2)))
    out = []
    for j in range(k):
        m = ncl == j
        nj = int(m.sum())
        zj = float(z[m].mean()) if nj else 0.0
        rj = float(np.sqrt(np.mean(dmin[m] ** 2))) if nj else 0.0
        out.append((np.rad2deg(clon[j]), np.rad2deg(clat[j]), zj,
                    100.0 * nj / n, rj))
    return out, rms


@dataclasses.dataclass
class PlumeTrajWriter:
    """trajectories.txt writer (openouttraj.f90 header + plumetraj.f90
    output lines)."""
    path: Path
    releases: object
    bdate: object

    def __post_init__(self):
        self.path = Path(self.path)
        with self.path.open("w") as f:
            f.write(f"{self.bdate:%Y%m%d %H%M%S} FLEXPART_TPU\n")
            f.write(f"{self.releases.numpoint}\n")
            for j, b in enumerate(self.releases.boxes):
                f.write(f"{int((b.start - self.bdate).total_seconds())} "
                        f"{int((b.end - self.bdate).total_seconds())} "
                        f"{b.lon1:9.4f} {b.lat1:9.4f} {b.lon2:9.4f} "
                        f"{b.lat2:9.4f} {b.z1:9.3f} {b.z2:9.3f} "
                        f"{b.parts:d}\n")
                f.write(f"R{j + 1}\n")

    def write_step(self, itime: int, point: int, stats: dict,
                   clusters, rms: float):
        cols = (f"{point + 1:5d} {itime:10d} "
                f"{stats['xcenter']:9.4f} {stats['ycenter']:9.4f} "
                f"{stats['zcenter']:8.1f} "
                f"{stats['topocenter']:8.1f} {stats['hmixcenter']:8.1f} "
                f"{stats['tropocenter']:8.1f} {stats['pvcenter']:8.2f} "
                f"{stats['rmsdist']:10.1f} {rms:10.1f} "
                f"{stats['zrmsdist']:8.1f} {stats['zrms']:8.1f} "
                f"{stats['hmixfract']:6.1f} {stats['pvfract']:6.1f} "
                f"{stats['tropofract']:6.1f}")
        for (clon, clat, cz, frac, crms) in clusters:
            cols += (f" {clon:9.4f} {clat:9.4f} {cz:8.1f} {frac:6.1f} "
                     f"{crms:9.1f}")
        with self.path.open("a") as f:
            f.write(cols + "\n")


def plume_step(p, grid, diag, itime: int, numpoint: int,
               writer: PlumeTrajWriter):
    """One output step for all release points (plumetraj.f90:60-233).
    diag: particle_diagnostics output (topo, pv, qv, rho, hmix, tropo,
    tt) already on host."""
    topo, pv, _, _, hmix, tropo, _ = (np.asarray(a) for a in diag)
    live = np.asarray(p.active) & (np.asarray(p.itra) == itime)
    npoint = np.asarray(p.npoint)
    x = np.asarray(p.x)
    y = np.asarray(p.y)
    z = np.asarray(p.z)
    lon = grid.xlon0 + x * grid.dx
    lat = grid.ylat0 + y * grid.dy
    for j in range(numpoint):
        m = live & (npoint == j)
        n = int(m.sum())
        if n == 0:
            continue
        zl = z[m] + topo[m]                     # height ASL
        pvj = pv[m]
        latm = lat[m]
        pvfract = np.where(latm > 0, pvj < 2.0, pvj > -2.0).mean() * 100
        tropofract = (z[m] < tropo[m]).mean() * 100
        hmixfract = (z[m] < hmix[m]).mean() * 100
        # center of mass with cyclic longitude handling
        lam = np.deg2rad(lon[m])
        phi = np.deg2rad(latm)
        xc = np.cos(phi) * np.sin(lam)
        yc = -np.cos(phi) * np.cos(lam)
        zc = np.sin(phi)
        xcen = np.rad2deg(np.arctan2(xc.mean(), -yc.mean()))
        ycen = np.rad2deg(np.arctan2(
            zc.mean(), np.sqrt(xc.mean() ** 2 + yc.mean() ** 2)))
        dcen = _sphere_dist(phi, lam, np.deg2rad(ycen), np.deg2rad(xcen))
        stats = dict(
            xcenter=xcen, ycenter=ycen, zcenter=float(zl.mean()),
            topocenter=float(topo[m].mean()),
            hmixcenter=float(hmix[m].mean()),
            tropocenter=float((tropo[m] + topo[m]).mean()),
            pvcenter=float(pvj.mean()),
            rmsdist=float(np.sqrt(np.mean(dcen ** 2))),
            zrmsdist=float(np.sqrt(np.mean((zl - zl.mean()) ** 2))),
            zrms=float(np.sqrt(np.mean((zl - zl.mean()) ** 2))),
            hmixfract=hmixfract, pvfract=pvfract, tropofract=tropofract)
        res = cluster_particles(lon[m], latm, zl)
        if res is None:
            clusters = [(xcen, ycen, float(zl.mean()), 100.0, 0.0)] \
                + [(0.0, 0.0, 0.0, 0.0, 0.0)] * (NCLUSTER - 1)
            rms = 0.0
        else:
            clusters, rms = res
        writer.write_step(itime, j, stats, clusters, rms)
