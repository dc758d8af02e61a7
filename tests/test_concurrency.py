# -*- coding: utf-8 -*-
"""run_concurrent_jobs — the shared driver-thread job harness behind
build_kg stage concurrency and domain_cv fold concurrency."""
import time

import pytest

from webstruct_spark.concurrency import run_concurrent_jobs


def test_results_and_dependency_waiting(spark):
    futs = {}

    def dep(name):
        f = futs[name]
        return f if isinstance(f, (int, str)) else f.result()

    tasks = [
        ("a", lambda: 1),
        ("b", lambda: dep("a") + 1),
        ("c", lambda: dep("b") + dep("a")),
    ]
    for workers in (1, 3):
        futs.clear()
        out = run_concurrent_jobs(spark, list(tasks), workers, futs=futs)
        assert {k: (v if isinstance(v, int) else v.result())
                for k, v in out.items()} == {"a": 1, "b": 2, "c": 3}


def test_failure_reraises_root_not_dependent(spark):
    """A dependent blocked on a failed task re-raises the dep's
    exception from its own thread; run_concurrent_jobs must surface
    the ROOT failure (earliest submitted), and a plain failure must
    propagate unchanged.  (Cancellation of still-queued tasks is
    best-effort — a freed worker can legally steal one before the
    cancel lands — so the hard guarantee tested here is the raise;
    the in-flight Spark-job interrupt is pinned by the next test.)"""

    def boom():
        raise ValueError("root cause")

    with pytest.raises(ValueError, match="root cause"):
        run_concurrent_jobs(spark, [("bad", boom)], 2)

    futs = {}
    with pytest.raises(ValueError, match="root cause"):
        run_concurrent_jobs(
            spark,
            [("bad", boom),
             ("dependent", lambda: futs["bad"].result())],
            2,
            futs=futs,
        )


def test_failure_interrupts_inflight_spark_job(spark):
    """A sibling failure must CANCEL the in-flight Spark job (shared
    job group, interruptOnCancel), not let it run out: the slow task
    below would take ~24 s of executor sleep if left alone."""
    sc = spark.sparkContext

    def slow():
        # 8 partitions x 3 s on the 8-core test session
        return sc.parallelize(range(8), 8).map(
            lambda i: time.sleep(3) or i
        ).collect()

    def bad():
        time.sleep(0.5)  # let `slow` get its job in flight first
        raise RuntimeError("sibling failed")

    t0 = time.time()
    with pytest.raises(Exception) as exc_info:
        run_concurrent_jobs(spark, [("slow", slow), ("bad", bad)], 2)
    wall = time.time() - t0
    # the ROOT failure is re-raised, not the cancellation error
    assert "sibling failed" in str(exc_info.value)
    assert wall < 15, "in-flight job was not cancelled (wall=%.1fs)" % wall
