"""Session-shared physical-plan strings, captured opportunistically.

``test_demoted_oracle`` EXECUTES ~280 of the ~340 surface queries at
sf0.001 to value-hash them against DuckDB; ``test_plan_lint`` used to
build every query a second time just to read its physical plan — and
building a query runs its eager driver-side work (index fixture
writes, stream drains, pins), so the lint effectively re-ran most of
the query surface (~280 s + ~290 s per suite run). The oracle test now
records each query's executed-plan string here right after building
the frame (one py4j call, pre-action, exactly the state the lint
inspects), and the lint only self-builds the queries nothing else ran.

Both sides treat this as a pure cache: the lint's fallback path is the
same build-and-read it always did, so running test_plan_lint.py alone
(or any -k slice) stays correct, just slower.
"""

from __future__ import annotations

PLANS: dict[str, str] = {}
