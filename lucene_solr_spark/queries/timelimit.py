"""Query time budget — the TimeLimitingCollector analog
(lucene/core/src/java/org/apache/lucene/search/TimeLimitingCollector.java:
1-309): a kill-switch for runaway queries, operationally essential at
10^12 docs.

Spark-first shape: a collector can't tick per-hit inside Catalyst, so
the budget applies at the unit Spark can actually cancel — the JOB.
The query's driver-side action runs in a worker thread tagged with its
own job group; on timeout the group is cancelled (tasks are
interrupted cluster-wide, like interruptOnCancel) and
:class:`TimeExceededError` carries the elapsed time, mirroring the
reference's TimeExceededException(timeAllowed, timeElapsed, lastDoc).
Partial results are NOT returned (the reference's greedy=false mode).
"""

from __future__ import annotations

import threading
import time
import uuid


class TimeExceededError(Exception):
    """Raised when a query exceeds its time budget
    (TimeLimitingCollector.TimeExceededException)."""

    def __init__(self, budget_ms: float, elapsed_ms: float) -> None:
        super().__init__(
            f"query exceeded time budget: allowed {budget_ms:.0f} ms, "
            f"elapsed {elapsed_ms:.0f} ms"
        )
        self.budget_ms = budget_ms
        self.elapsed_ms = elapsed_ms


def run_with_time_budget(spark, action, budget_ms: float):
    """Run ``action()`` (any driver-side callable that triggers Spark
    jobs — e.g. ``lambda: searcher.search(q, 10).collect()``) under a
    wall-clock budget.  On timeout every job in the query's private
    job group is cancelled and TimeExceededError raises."""
    group = f"time-budget-{uuid.uuid4().hex[:8]}"
    sc = spark.sparkContext
    result: list = []
    err: list[BaseException] = []

    def target() -> None:
        sc.setJobGroup(group, f"time-budgeted query ({budget_ms:.0f} ms)",
                       interruptOnCancel=True)
        try:
            result.append(action())
        except BaseException as e:  # noqa: BLE001 — surfaced to caller
            err.append(e)
        finally:
            sc.setJobGroup("", "")

    t0 = time.monotonic()
    th = threading.Thread(target=target, daemon=True)
    th.start()
    th.join(budget_ms / 1000.0)
    if th.is_alive():
        sc.cancelJobGroup(group)
        th.join(10.0)
        raise TimeExceededError(budget_ms, (time.monotonic() - t0) * 1000.0)
    if err:
        # the cancellation exception (or any real failure) propagates
        raise err[0]
    return result[0]
