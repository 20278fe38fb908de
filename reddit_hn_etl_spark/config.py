"""Env-file configuration (reference parity: python-dotenv usage in
`src/mart/hn_mart.py:33` / `src/load/hn_load.py:41-46`, loaded before
any connection is made).

Spark re-expression without the dependency: a ~20-line `.env` parser
with the same semantics as ``load_dotenv()`` defaults — KEY=VALUE
lines, ``#`` comments, optional ``export`` prefix, single/double
quotes stripped, and NO override of variables already present in the
process environment (the reference relies on that so real env wins
over the file). The engine's tunables all read through ``os.environ``
(``SPARK_GRAFT_CPUS``, ``SPARK_GRAFT_SHUFFLE_PARTITIONS``,
``SPARK_GRAFT_DRIVER_MEM`` in `session.py`; ``SPARK_GRAFT_SF_DIR`` in
`bench.py`), so an env file is a complete deployment-config surface.
"""

from __future__ import annotations

import os

__all__ = ["load_env_file"]


def load_env_file(path: str = ".env", override: bool = False) -> dict[str, str]:
    """Load KEY=VALUE pairs from ``path`` into ``os.environ``.

    Returns the parsed mapping (empty if the file doesn't exist —
    same as ``load_dotenv`` on a missing file: a no-op, not an
    error). Existing environment variables win unless ``override``.
    """
    parsed: dict[str, str] = {}
    if not os.path.isfile(path):
        return parsed
    with open(path, encoding="utf-8") as fh:
        for raw in fh:
            line = raw.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            if line.startswith("export "):
                line = line[len("export "):]
            key, _, val = line.partition("=")
            key = key.strip()
            val = val.strip()
            if len(val) >= 2 and val[0] == val[-1] and val[0] in "'\"":
                val = val[1:-1]
            if not key:
                continue
            parsed[key] = val
            if override or key not in os.environ:
                os.environ[key] = val
    return parsed
