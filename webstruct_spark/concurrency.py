# -*- coding: utf-8 -*-
"""Concurrent Spark jobs from driver threads — the shared harness
behind pipeline.build_kg's stage concurrency and domain_cv's fold
concurrency.

Independent computations (DAG stages, CV folds) submitted as separate
Spark actions from separate driver threads interleave in the
scheduler: one job's driver barriers (iterative collects, Python
worker spin-up) leave executor gaps that another job's stages fill.
Threads go through :func:`pyspark.inheritable_thread_target` so the
caller's job group / local properties propagate and pinned-mode JVM
peer threads are cleaned up on thread exit.

Failure semantics: every task runs under one shared job group; the
first task failure (a) cancels still-QUEUED tasks and (b) cancels the
group's in-flight Spark jobs (``interruptOnCancel=True``), so a
doomed run stops burning cluster time instead of letting the longest
in-flight stage run out before the error propagates.  The ROOT
exception is re-raised; sibling tasks killed by the group cancel are
not consulted.
"""
from __future__ import annotations

import itertools
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

_JOB_GROUP_SEQ = itertools.count()


def run_concurrent_jobs(
    spark,
    named_tasks: Sequence[Tuple[str, Callable[[], object]]],
    workers: int,
    futs: Optional[Dict[str, object]] = None,
) -> Dict[str, object]:
    """Run ``named_tasks`` — ``(name, zero-arg callable)`` pairs in
    TOPOLOGICAL order — as up to ``workers`` concurrent Spark jobs.

    Returns ``{name: result}``.  If ``futs`` (a dict the task
    closures can read) is supplied, each name is bound in it to the
    task's Future (or, with ``workers == 1``, its plain result) as it
    is submitted, so a task may wait on an EARLIER task via
    ``futs[dep]`` — topological submission order guarantees a worker
    only ever blocks on futures submitted before its own task, so the
    earliest unfinished task is always runnable and no pool size
    deadlocks.

    ``workers == 1`` degrades to plain sequential calls in submission
    order (no threads, no job group) — byte-identical results either
    way, since tasks must not depend on completion order.
    """
    futs = {} if futs is None else futs
    if workers <= 1:
        for name, fn in named_tasks:
            futs[name] = fn()
        return dict(futs)

    import threading
    from concurrent.futures import FIRST_EXCEPTION, ThreadPoolExecutor, wait

    sc = spark.sparkContext
    group = "wsjobs-%d-%d" % (os.getpid(), next(_JOB_GROUP_SEQ))
    # set on first failure: a queued task a worker dequeues in the
    # wait()→cancel() race window escapes Future.cancel (it is
    # already running) AND a one-shot cancelJobGroup (its Spark jobs
    # are submitted later) — the flag stops it before it does any
    # work, and the cancel sweep below catches the residue
    abort = threading.Event()

    def _in_group(name: str, fn):
        def run():
            if abort.is_set():
                raise RuntimeError(
                    "task %s aborted: a sibling task failed" % name
                )
            # thread-local: tags this thread's Spark jobs so a sibling
            # failure can interrupt them mid-flight
            sc.setJobGroup(group, "task %s" % name, interruptOnCancel=True)
            return fn()

        return run

    def _wrap(fn):
        try:
            from pyspark import inheritable_thread_target
            try:
                # Spark >= 4: session-form also inherits session tags
                return inheritable_thread_target(spark)(fn)
            except Exception:  # pragma: no cover — pre-tag pyspark
                return inheritable_thread_target(fn)
        except ImportError:  # pragma: no cover — ancient pyspark
            return fn

    with ThreadPoolExecutor(max_workers=workers) as ex:
        submitted: List[Tuple[str, object]] = []
        for name, fn in named_tasks:
            f = ex.submit(_wrap(_in_group(name, fn)))
            futs[name] = f
            submitted.append((name, f))
        done, not_done = wait(
            [f for _n, f in submitted], return_when=FIRST_EXCEPTION
        )
        failed = next(
            # submission order, so a root failure wins over the chained
            # re-raises of its dependents
            (f for _n, f in submitted
             if f in done and f.exception() is not None),
            None,
        )
        if failed is not None:
            abort.set()
            for f in not_done:
                f.cancel()
            # sweep the group cancel until every task drains: a task
            # that slipped past both the flag check and the future
            # cancel may submit Spark jobs AFTER a one-shot
            # cancelJobGroup fired; re-sweeping bounds its wasted
            # cluster time to ~1 s instead of a full stage runtime
            pending = [f for _n, f in submitted]
            while pending:
                try:
                    sc.cancelJobGroup(group)
                except Exception:  # pragma: no cover — best-effort
                    pass
                _done2, pending = wait(pending, timeout=1.0)
            raise failed.exception()
    return {name: f.result() for name, f in submitted}
