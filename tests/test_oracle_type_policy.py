"""Registry-wide oracle TERMINAL-TYPE policy.

Round 4's only driver failures (`ivm_nation_revenue`,
`daily_value_holt_winters`, `cms_selfjoin_size_estimate`,
`value_conformal_intervals`) shared exactly one trait: a terminal
column whose DuckDB type was HUGEINT or DECIMAL — the types DuckDB's
Python client surfaces as `decimal.Decimal`/wide objects in some
version/conversion paths, which the driver's value hash normalizes
differently from plain `int`. ZERO driver-green queries emitted such
a type. This test freezes the policy: every oracle's result schema
must consist only of portable types (BIGINT/INTEGER/SMALLINT/
DOUBLE/BOOLEAN/VARCHAR/DATE/TIMESTAMP/arrays of those) — a bare
`SUM(bigint_col)` (→ HUGEINT) or un-downcast DECIMAL aggregate must
be wrapped in an explicit CAST before it reaches the final SELECT.

Uses `DESCRIBE <query>` (DuckDB binds without executing), so the
whole 270+-query walk costs milliseconds and needs no Spark session.
"""

from __future__ import annotations

import re

import pytest

from reddit_hn_etl_spark.plans import queries as q

FORBIDDEN_EXACT = {"HUGEINT", "UHUGEINT", "FLOAT", "UBIGINT"}
FORBIDDEN_PREFIX = ("DECIMAL",)


def _violations(type_name: str) -> bool:
    # strip one level of list nesting: a terminal list<DECIMAL> is
    # just as hazardous as a scalar one
    inner = re.sub(r"\[\]$", "", type_name.strip())
    return inner in FORBIDDEN_EXACT or inner.startswith(FORBIDDEN_PREFIX)


def test_no_hugeint_or_decimal_terminal_columns(duck):
    assert len(q.ORACLES) > 250, "registry unexpectedly small"
    offenders: dict[str, dict[str, str]] = {}
    for name, sql in sorted(q.ORACLES.items()):
        desc = duck.execute(f"DESCRIBE {sql}").fetchall()
        flagged = {c[0]: c[1] for c in desc if _violations(c[1])}
        if flagged:
            offenders[name] = flagged
    assert not offenders, (
        "oracles emit driver-hash-hazardous terminal types "
        "(wrap in CAST(... AS BIGINT) / CAST(... AS DOUBLE); see the "
        f"r4 post-mortem in this file's docstring): {offenders}"
    )


def test_oracles_parse_and_bind(duck):
    """Every oracle must at least bind against the real table schemas
    (DESCRIBE raises on unknown columns/functions) — catches silent
    registry rot without paying execution time."""
    for name, sql in sorted(q.ORACLES.items()):
        try:
            duck.execute(f"DESCRIBE {sql}")
        except Exception as ex:  # pragma: no cover - failure reporting
            pytest.fail(f"oracle {name} does not bind: {ex}")
