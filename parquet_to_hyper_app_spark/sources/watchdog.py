"""Job-level timeout watchdog (reference R4, app.py:111-112).

The reference wraps its conversion loop in a wall-clock timeout and
aborts the whole job when exceeded. Spark's native mechanism is job
groups: every action launched inside the `job_timeout` context runs
under a dedicated group, and a daemon timer calls
`SparkContext.cancelJobGroup` when the budget expires — tasks are
killed cluster-wide, not just abandoned driver-side. The context
manager then surfaces the cancellation as the typed
ConversionTimeoutError from the R14 ladder.

This is a *harness* utility by design (SURVEY.md §2A R4): queries stay
declarative; callers that need a budget wrap the action, e.g.::

    with job_timeout(spark, seconds=600, desc="convert lineitem"):
        convert(spark, src, sink)
"""

from __future__ import annotations

import threading
import uuid
from contextlib import contextmanager

from pyspark.sql import SparkSession

from parquet_to_hyper_app_spark.sources.errors import ConversionTimeoutError


@contextmanager
def job_timeout(spark: SparkSession, seconds: float, desc: str = "conversion"):
    """Run the enclosed Spark actions under a wall-clock budget.

    On expiry every job in the watchdog's group is cancelled (running
    tasks are interrupted) and the resulting cancellation error is
    re-raised as ConversionTimeoutError. The timer is a daemon thread —
    nothing lingers if the block finishes early.
    """
    sc = spark.sparkContext
    group = f"p2h-watchdog-{uuid.uuid4().hex[:8]}"
    expired = threading.Event()

    def _cancel() -> None:
        expired.set()
        # ...AndFutureJobs (Spark >= 3.5): cancellation is STICKY — a
        # multi-action block whose budget expires between actions must
        # not let the next action (e.g. the sink write) launch and
        # commit after the deadline. Plain cancelJobGroup only kills
        # jobs running at this instant.
        if hasattr(sc, "cancelJobGroupAndFutureJobs"):
            sc.cancelJobGroupAndFutureJobs(group)
        else:
            try:
                # PySpark's wrapper lags the JVM API; call it directly
                sc._jsc.sc().cancelJobGroupAndFutureJobs(group)
            except Exception:  # pragma: no cover - Spark < 3.5
                sc.cancelJobGroup(group)

    timer = threading.Timer(seconds, _cancel)
    timer.daemon = True
    # interruptOnCancel=True: cancellation interrupts running task
    # threads instead of waiting for them to finish their partition
    sc.setJobGroup(group, desc, interruptOnCancel=True)
    timer.start()
    try:
        yield group
        if expired.is_set():
            raise ConversionTimeoutError(
                f"{desc!r} exceeded its {seconds:.0f}s budget and was cancelled"
            )
    except ConversionTimeoutError:
        raise
    except Exception as e:
        if expired.is_set():
            raise ConversionTimeoutError(
                f"{desc!r} exceeded its {seconds:.0f}s budget and was cancelled"
            ) from e
        raise
    finally:
        timer.cancel()
        sc.setJobGroup(None, None)
