"""Engine error types.

Mirrors the control-flow contract of the reference
(``getl/common/errors.py:43-61``): ``NoDataToProcess`` is raised by an
incremental source when its file registry reports nothing new, and the
executor catches it to end the whole job cleanly
(``getl/manager.py:50-51``).
"""

from __future__ import annotations

from contextlib import contextmanager


class NoDataToProcess(Exception):
    """Raised when a file registry finds no new files/rows to lift."""


class BlockError(Exception):
    """A block failed to resolve or execute."""


class IndexHealthError(Exception):
    """A persisted ANN/dedup index failed its health gate (the
    ``retrain``/``attention`` trigger fired) before a maintenance
    operation that would have compounded the degradation. Carries
    ``readout`` — the full health row as a dict — so the caller's
    alert/rebuild path has the numbers without re-running the check."""

    def __init__(self, message: str, readout: dict):
        super().__init__(message)
        self.readout = readout


class ValidationError(Exception):
    """A ``transform::validate`` expectation with ``action: fail``
    found violating rows. Carries ``counts`` — a
    ``{expectation_name: violation_count}`` dict for the failing
    expectations."""

    def __init__(self, message: str, counts: dict):
        super().__init__(message)
        self.counts = counts


@contextmanager
def missing_table_as_empty(result_holder: list):
    """Yield, converting a missing-table AnalysisException into a sentinel.

    The reference turns "delta table does not exist" into an empty
    DataFrame (``getl/common/errors.py:43-57``,
    ``getl/blocks/load/entrypoint.py:217,234-236``). We keep the same
    behavior for any path-based read of an absent table.
    """
    from pyspark.errors import AnalysisException

    try:
        yield
    except AnalysisException as exc:
        msg = str(exc)
        markers = (
            "PATH_NOT_FOUND",
            "is not a Delta table",
            "doesn't exist",
            "does not exist",
            "UNABLE_TO_INFER_SCHEMA",
        )
        if any(m in msg for m in markers):
            result_holder.append(None)
        else:
            raise
