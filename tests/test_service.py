"""Service layer (utils/flexpart_ifs_utils analog): job-dir preparation
from the runtime configuration + env window, AVAILABLE generation,
namelist patching, and object-store upload round trip."""
import os
from datetime import datetime
from pathlib import Path

import pytest

from flexpart_tpu.service import (EnvironmentParameters, LocalStore,
                                  configure_namelist,
                                  prepare_job_directory, upload_output)
from flexpart_tpu.config.namelist import namelist_groups

TEMPLATE = (Path(__file__).parent.parent / "flexpart_tpu" / "service"
            / "runtime_configuration.example.yaml")
REF_OPTIONS = Path("/root/reference/options")


@pytest.fixture()
def met_dir(tmp_path):
    d = tmp_path / "met"
    d.mkdir()
    for h in (0, 3, 6, 9, 12):
        (d / f"dispf2021062{h // 24}{h % 24:02d}0000").write_bytes(b"x")
    return d


def _env():
    return EnvironmentParameters(
        emission_start=datetime(2021, 6, 20, 0),
        emission_end=datetime(2021, 6, 20, 6),
        simulation_end=datetime(2021, 6, 20, 12))


def test_prepare_job_directory(tmp_path, met_dir):
    job = prepare_job_directory(
        tmp_path / "jobs", REF_OPTIONS, met_dir, "BEZ", TEMPLATE, _env())
    assert (job / "pathnames").exists()
    assert (job / "job").exists()
    assert os.access(job / "job", os.X_OK)
    # COMMAND patched with the rendered window
    cmd = namelist_groups((job / "input" / "COMMAND").read_text(),
                          "command")[0]
    assert int(cmd["ibdate"]) == 20210620
    assert int(cmd["ibtime"]) == 0
    assert int(cmd["iedate"]) == 20210620
    assert int(cmd["loutstep"]) == 10800
    rb = namelist_groups((job / "input" / "RELEASES").read_text(),
                         "release")[0]
    assert float(rb["lon1"]) == pytest.approx(8.2284)
    assert str(rb["comment"]).strip("\"' ") == "Beznau"
    # AVAILABLE covers all met files in the window
    avail = (job / "AVAILABLE").read_text().splitlines()
    assert len(avail) == 3 + 5
    assert "20210620 060000" in avail[5]
    # pathnames points at input/output/data/AVAILABLE
    lines = (job / "pathnames").read_text().splitlines()
    assert lines[0].endswith("input/")
    assert lines[3].endswith("AVAILABLE")


def test_unknown_site_raises(tmp_path, met_dir):
    with pytest.raises(KeyError):
        prepare_job_directory(tmp_path / "j", REF_OPTIONS, met_dir,
                              "NOPE", TEMPLATE, _env())


def test_env_parameters_from_env():
    env = {"EMISSION_START": "2021062000",
           "EMISSION_END": "2021062006",
           "SIMULATION_END": "2021062012"}
    ep = EnvironmentParameters.from_env(env)
    assert ep.template_vars()["SIMULATION_END_ZZ"] == "12"


def test_configure_namelist_preserves_comments(tmp_path):
    nl = tmp_path / "COMMAND"
    nl.write_text("&COMMAND\n"
                  " LDIRECT= 1, ! direction\n"
                  " IBDATE= 20120101, ! start\n"
                  " OTHER= 5,\n"
                  "/\n")
    configure_namelist({"IBDATE": 20210620}, nl)
    text = nl.read_text()
    assert "IBDATE= 20210620," in text
    assert "! start" in text
    assert "OTHER= 5," in text


def test_upload_output_roundtrip(tmp_path, met_dir):
    job = prepare_job_directory(
        tmp_path / "jobs", REF_OPTIONS, met_dir, "TEST", TEMPLATE, _env())
    (job / "output" / "grid_conc_x.npz").write_bytes(b"data1")
    (job / "output" / "sub").mkdir()
    (job / "output" / "sub" / "header").write_bytes(b"data2")
    store = LocalStore(tmp_path / "bucket_root")
    n = upload_output(store, job, "results", prefix="run1")
    assert n == 2
    keys = store.list_objects("results", "run1/")
    assert keys == ["run1/grid_conc_x.npz", "run1/sub/header"]
    dl = tmp_path / "dl"
    store.download("results", "run1/grid_conc_x.npz", dl / "a.npz")
    assert (dl / "a.npz").read_bytes() == b"data1"
