"""Staging area for oracle queries prepared ahead of registration.

r6-r8 accumulated ten codec/media/LRS queries here while the driver-
verification backlog was above the registry-freeze threshold (builder
rule: no new registrations while > 50 registered queries lack a driver
CORRECTNESS row). The backlog fell to 44 after round 8, so round 9
promoted all ten into ``plans/queries.py`` (verbatim, one ``@_q``
each) and this module is empty again. The mechanism stays: a new
capability lands with its query HERE (same registry shape + DuckDB
oracle, differentially tested by tests/test_pending_queries.py) when
the window has no room, and moves into the registry next rotation.
"""

from __future__ import annotations

PENDING_QUERIES: dict = {}
PENDING_ORACLES: dict[str, str] = {}
