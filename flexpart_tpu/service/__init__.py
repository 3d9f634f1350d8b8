"""Operational service layer (utils/flexpart_ifs_utils analog):
job preparation, object storage, CLI."""
from .prepare import (EnvironmentParameters, configure_namelist,
                      generate_available, prepare_job_directory,
                      render_runtime_configuration, select_files)
from .storage import LocalStore, download_keys, upload_output
