"""Operational logging: stdout + rotating file, one format per phase.

Re-expression of the reference's shared logging layer
(`src/common/logging_utils.py:7-33`): every phase logs through the
same stdout+file logger so a failed run is debuggable from `logs/`
before anyone reaches for the audit table. Differences from the
reference, deliberate for a cluster engine:

  * the log directory is configurable (``SPARK_ETL_LOG_DIR`` env or
    argument) instead of hardcoded ``./logs`` — on a cluster the
    driver's CWD is not a stable place;
  * file logging degrades to stdout-only if the directory can't be
    created (a read-only driver container must not kill the job over
    a log file);
  * configuration is idempotent per logger name, as in the reference.

The *data path* never logs per-row (that would serialize the hot
path); phases log start/finish/metrics — driver-side only.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

_FORMAT = "%(asctime)s | %(levelname)s | %(name)s | %(message)s"


def get_logger(
    name: str,
    log_file: str | None = None,
    log_dir: str | None = None,
) -> logging.Logger:
    """Stdout + optional-file logger, configured once per ``name``.

    ``log_file`` defaults to ``<name>.log``; ``log_dir`` defaults to
    ``$SPARK_ETL_LOG_DIR`` or ``./logs``.
    """
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger  # idempotent config (reference parity)

    logger.setLevel(logging.INFO)
    fmt = logging.Formatter(_FORMAT)

    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)

    directory = Path(log_dir or os.environ.get("SPARK_ETL_LOG_DIR", "logs"))
    try:
        directory.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(directory / (log_file or f"{name}.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    except OSError:
        logger.warning("log dir %s not writable; stdout only", directory)
    logger.propagate = False
    return logger
