"""Timeout watchdog tests (reference R4 parity)."""

from __future__ import annotations

import time

import pytest

from parquet_to_hyper_app_spark.sources.errors import ConversionTimeoutError
from parquet_to_hyper_app_spark.sources.watchdog import job_timeout


def test_watchdog_no_op_when_fast(spark):
    with job_timeout(spark, seconds=60, desc="fast job"):
        assert spark.range(100).count() == 100


def test_watchdog_cancels_slow_job(spark):
    def slow(it):
        time.sleep(30)
        return it

    with pytest.raises(ConversionTimeoutError, match="budget"):
        with job_timeout(spark, seconds=2, desc="slow job"):
            spark.range(8).rdd.mapPartitions(slow).count()


def test_watchdog_expiry_between_actions_blocks_next_action(spark):
    """Budget expiring while NO job is running must still prevent the
    next action from committing (sticky cancellation): a conversion
    whose sink write starts after the deadline must not 'succeed late'.
    """
    import time

    with pytest.raises(ConversionTimeoutError):
        with job_timeout(spark, seconds=0.5, desc="two-phase job"):
            spark.range(10).count()     # fast action, well inside budget
            time.sleep(1.0)             # driver-side work past the deadline
            spark.range(10).count()     # must be cancelled, not run
