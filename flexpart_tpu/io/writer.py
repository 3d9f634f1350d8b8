"""Output writers.

The reference writes sparse Fortran binary records (concoutput.f90:355-385)
and optionally CF netCDF (netcdf_output_mod.f90).  We write:
  * netCDF3-classic (via scipy.io.netcdf_file) mirroring the reference's
    netCDF variable layout (spec###_mr / spec###_pptv, dims
    time/height/latitude/longitude/numpoint/nageclass) — readable by any
    netCDF tool;
  * .npz archives with the raw accumulator arrays (exact, for validation);
  * the `dates` index file (concoutput.f90:102-125).
"""

from __future__ import annotations

import dataclasses
from datetime import datetime
from pathlib import Path

import numpy as np

from ..utils.dates import datestamp


@dataclasses.dataclass
class OutputWriter:
    outdir: Path
    outlon0: float
    outlat0: float
    dxout: float
    dyout: float
    outheights: tuple
    species_names: tuple
    start: datetime
    iout: int = 1
    write_netcdf: bool = True
    write_npz: bool = True

    def __post_init__(self):
        self.outdir = Path(self.outdir)
        self.outdir.mkdir(parents=True, exist_ok=True)
        self._dates_path = self.outdir / "dates"
        self._dates_path.write_text("")
        self._nc_path = None
        self._times = []

    def write(self, when: datetime, conc: np.ndarray, unc: np.ndarray,
              wet: np.ndarray | None = None, dry: np.ndarray | None = None):
        """conc/unc: (nspec, npoint, nage, nz, ny, nx) mean field and
        class-std; wet/dry: (nspec, npoint, nage, ny, nx)."""
        stamp = datestamp(when)
        with self._dates_path.open("a") as f:
            f.write(stamp + "\n")
        if self.write_npz:
            np.savez_compressed(
                self.outdir / f"grid_conc_{stamp}.npz",
                conc=conc, unc=unc,
                wet=(wet if wet is not None else np.zeros(0)),
                dry=(dry if dry is not None else np.zeros(0)),
                outlon0=self.outlon0, outlat0=self.outlat0,
                dxout=self.dxout, dyout=self.dyout,
                outheights=np.asarray(self.outheights))
        if self.write_netcdf:
            self._append_netcdf(when, conc, wet, dry)

    # --- netCDF3 (classic) ---
    def _append_netcdf(self, when, conc, wet, dry):
        from scipy.io import netcdf_file
        nspec, npoint, nage, nz, ny, nx = conc.shape
        self._times.append(int((when - self.start).total_seconds()))
        path = self.outdir / f"grid_conc_{datestamp(self.start)}.nc"
        # rewrite whole file each output (netcdf3 append over unlimited dim
        # via scipy requires rewrite; outputs are infrequent)
        if not hasattr(self, "_history"):
            self._history = []
        self._history.append((conc, wet, dry))
        nt = len(self._history)
        f = netcdf_file(str(path), "w")
        f.createDimension("time", nt)
        f.createDimension("height", nz)
        f.createDimension("latitude", ny)
        f.createDimension("longitude", nx)
        f.createDimension("numpoint", npoint)
        f.createDimension("nageclass", nage)
        tv = f.createVariable("time", "i", ("time",))
        tv[:] = np.asarray(self._times, np.int32)
        tv.units = f"seconds since {self.start:%Y-%m-%d %H:%M}"
        lat = f.createVariable("latitude", "f", ("latitude",))
        lat[:] = (self.outlat0 + (np.arange(ny) + 0.5) * self.dyout
                  ).astype(np.float32)
        lon = f.createVariable("longitude", "f", ("longitude",))
        lon[:] = (self.outlon0 + (np.arange(nx) + 0.5) * self.dxout
                  ).astype(np.float32)
        hgt = f.createVariable("height", "f", ("height",))
        hgt[:] = np.asarray(self.outheights, np.float32)
        dims = ("time", "nageclass", "numpoint", "height",
                "latitude", "longitude")
        for ks, name in enumerate(self.species_names):
            var = f.createVariable(f"spec{ks+1:03d}_mr", "f", dims)
            data = np.stack([h[0][ks].transpose(1, 0, 2, 3, 4)[None]
                             for h in self._history])
            var[:] = data.reshape(nt, nage, npoint, nz, ny, nx
                                  ).astype(np.float32)
            var.units = b"ng m-3"
            if wet is not None and self._history[0][1] is not None:
                wv = f.createVariable(f"WD_spec{ks+1:03d}", "f",
                                      ("time", "nageclass", "numpoint",
                                       "latitude", "longitude"))
                wdat = np.stack([h[1][ks].transpose(1, 0, 2, 3)
                                 for h in self._history])
                wv[:] = wdat.astype(np.float32)
                wv.units = b"1e-12 kg m-2"
            if dry is not None and self._history[0][2] is not None:
                dv = f.createVariable(f"DD_spec{ks+1:03d}", "f",
                                      ("time", "nageclass", "numpoint",
                                       "latitude", "longitude"))
                ddat = np.stack([h[2][ks].transpose(1, 0, 2, 3)
                                 for h in self._history])
                dv[:] = ddat.astype(np.float32)
                dv.units = b"1e-12 kg m-2"
        f.close()
