"""Config-layer tests: parse the actual reference options/ directory."""
from pathlib import Path

import numpy as np
import pytest

from flexpart_tpu.config import (AgeClasses, Command, OutGrid, Releases,
                                 Species, parse_namelist, part0,
                                 read_available, Pathnames)

REF = Path("/root/reference")


def test_parse_command():
    cmd = Command.from_file(REF / "options" / "COMMAND")
    assert cmd.ldirect == 1
    assert cmd.ibdate == 20120101 and cmd.ibtime == 60000
    assert cmd.loutstep == 3600 and cmd.loutaver == 3600
    assert cmd.lsynctime == 900
    assert cmd.ctl == -5.0
    # derived: ctl<0 -> fixed-step mode, hanna1, ifine forced to 1
    assert not cmd.turbswitch
    assert cmd.ifine_eff == 1
    assert cmd.method == 0 and cmd.mintime == 900
    assert cmd.ideltas == 6 * 3600
    assert cmd.iout_eff == 1 and not cmd.use_netcdf


def test_parse_releases():
    rel = Releases.from_file(REF / "options" / "RELEASES")
    assert rel.nspec == 1
    assert rel.species[0].name == "AIRTRACER"
    assert rel.species[0].specnum == 24
    assert len(rel.boxes) == 1
    b = rel.boxes[0]
    assert b.lat1 == 20.0 and b.parts == 10000
    assert rel.total_particles == 10000


def test_parse_species_aerosol():
    # SPECIES_040 is Cs-137-like aerosol in the reference set (if present)
    sdir = REF / "options" / "SPECIES"
    cs = [p for p in sdir.iterdir() if p.name.startswith("SPECIES_")]
    assert len(cs) > 10
    sp = Species.from_file(sdir / "SPECIES_024", specnum=24)
    assert sp.name == "AIRTRACER"
    assert not sp.is_aerosol and not sp.wetdep and not sp.drydep


def test_part0_fractions_sum():
    sc = part0(dquer_um=0.4, dsigma=3.3, density=2500.0)
    assert abs(np.sum(sc.fract) - 1.0) < 0.01
    assert sc.vsetaver < 0.0
    assert np.all(sc.vset > 0.0)


def test_parse_outgrid_and_ageclasses():
    og = OutGrid.from_file(REF / "options" / "OUTGRID")
    assert og.numxgrid == 85 and og.numygrid == 65
    assert og.outheights == (100.0, 500.0, 1000.0, 50000.0)
    ac = AgeClasses.from_file(REF / "options" / "AGECLASSES")
    assert ac.nageclass == 1 and ac.lage == (1728000,)


def test_read_available():
    entries = read_available(REF / "AVAILABLE")
    assert len(entries) > 10
    assert entries[0].filename.startswith("EA")
    dt = (entries[1].time - entries[0].time).total_seconds()
    assert dt == 3600.0


def test_pathnames():
    pn = Pathnames.from_file(REF / "pathnames")
    assert pn.options.name == "options"
    assert pn.available.name == "AVAILABLE"
