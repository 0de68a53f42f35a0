"""Preflight checks (V2) — fail fast BEFORE any distributed work.

The reference validates its Minio connection and bucket existence up
front (``internal/check/check.go:14-118``); the Spark analogues are
input-relation schema checks, warehouse-path writability, and (diff
mode) manifest readability.  All checks are driver-side metadata
operations — no job is launched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

REQUIRED_PAGE_COLUMNS = {"url": "string", "html": "binary"}
REQUIRED_SOURCE_COLUMNS = {
    "name", "domain", "active", "propername", "pid",
    "identifiertype", "identifierpath", "fixcontextoption",
}


class PreflightError(RuntimeError):
    """A preflight check failed; nothing was executed or written."""


def preflight_checks(pages: DataFrame, sources_dim: DataFrame | None,
                     output_dir: str) -> None:
    """Raise ``PreflightError`` with every problem found (aggregated —
    one round trip through ops, like check.go reporting conn AND bucket)."""
    problems: list[str] = []

    fields = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    for col, want in REQUIRED_PAGE_COLUMNS.items():
        if col not in fields:
            problems.append(f"pages table missing required column '{col}'")
        elif fields[col] != want:
            problems.append(
                f"pages column '{col}' must be {want}, got {fields[col]}"
            )

    if sources_dim is not None:
        missing = REQUIRED_SOURCE_COLUMNS - set(sources_dim.columns)
        if missing:
            problems.append(
                f"sources dim missing columns: {sorted(missing)}"
            )

    parent = os.path.dirname(os.path.abspath(output_dir)) or "."
    if os.path.exists(output_dir) and not os.access(output_dir, os.W_OK):
        problems.append(f"output dir not writable: {output_dir}")
    elif not os.path.exists(output_dir) and not (
        os.path.isdir(parent) and os.access(parent, os.W_OK)
    ):
        problems.append(f"cannot create output dir under: {parent}")

    if problems:
        raise PreflightError("; ".join(problems))
