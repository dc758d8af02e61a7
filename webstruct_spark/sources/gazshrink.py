# -*- coding: utf-8 -*-
"""The deterministic gazetteer SHRINK shared by every
gazetteer-refresh fixture and gate (driver query kg_refreshed_nodes,
its single-node gold twin, bench q15, pytest): keep only aliases
whose canonical id ends in an EVEN digit.  One definition so the
Spark filter, the gold twin, and the bench can never drift.

Semantics pinned here: a canonical id whose last character is NOT a
digit is DROPPED on both sides — Spark's ``cast("int")`` yields NULL
(filtered out), and the Python twin mirrors that instead of raising.
"""
from __future__ import annotations


def shrink_gazetteer(gaz):
    """Spark-side filter (DataFrame → DataFrame).

    ``try_cast``, not ``cast``: under Spark 4's default ANSI mode a
    plain ``cast("int")`` THROWS on a non-digit tail instead of
    yielding the NULL the pinned drop semantics (and the Python twin)
    require — the refresh query would die mid-job on one malformed
    canonical id rather than drop the row."""
    from pyspark.sql import functions as F

    return gaz.where(
        F.expr(
            "try_cast(substring(canonical_id, -1, 1) AS int)"
        ) % 2 == 0
    )


def keep_alias(canonical_id) -> bool:
    """Single-node twin of :func:`shrink_gazetteer`'s predicate.

    ASCII-digit membership, NOT ``str.isdigit()``: Spark's int cast
    NULLs any non-ASCII-decimal tail ('²' and '٤' included), while
    ``isdigit()`` accepts both and ``int()`` then raises on '²' and
    keeps '٤' — either way a twin divergence.  The empty-string guard
    matters: ``'' in "0123456789"`` is True (substring semantics), so
    without it an empty canonical id reaches ``int('')`` and raises
    instead of dropping like the Spark side's NULL."""
    last = str(canonical_id)[-1:]
    return last != "" and last in "0123456789" and int(last) % 2 == 0
