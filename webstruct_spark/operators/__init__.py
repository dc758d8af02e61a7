"""Spark DataFrame operators.

All per-token work runs in Arrow-vectorized pandas UDFs wrapping the
pinned kernels (never per-row Python UDFs); everything relational
(joins, windows, aggregations, dedup) is declarative DataFrame/SQL so
Catalyst keeps pushdown/pruning/codegen.
"""
