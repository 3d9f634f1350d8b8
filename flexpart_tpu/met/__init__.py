"""Met-data layer: grids, backends, preprocessing.

Pipeline per wind-field time (analog of getfields.f90:93-196):
  backend.fetch(t) -> EtaFields  (GRIB decode / synthetic)
  verttransform.process_eta      (eta -> fixed z grid, clouds)
  calcpar.calcpar                (ustar, Obukhov, hmix, w*, tropopause)
producing a ZFields; two ZFields are double-buffered in device memory.
"""
from .grid import MetGrid, hybrid_coefficients
from .fields import EtaFields, ZFields, zeros_zfields
from .verttransform import process_eta, compute_heights
from .calcpv import calcpv
from .calcpar import calcpar
from .synthetic import (SyntheticMet, make_grid, solid_rotation_met,
                        uniform_wind_met)
from .gfsmet import GfsMet, eta_from_gfs_grib, grid_from_gfs_grib, looks_like_gfs
from .pblprofile import pbl_profile
