# -*- coding: utf-8 -*-
"""Distributed wapiti train-file sink + template writer (SURVEY §2
K3 + M3): the Spark re-expression of the reference's
``WapitiCRF.fit`` data/template file creation
(/root/reference/webstruct/wapiti.py:206-251, :302-326) — the files a
user would hand to the external wapiti binary.

Layout contract (kernel/wapiti_format.py is the single-node twin,
pinned by the reference doctests):

* one line per token: space-joined feature values in
  ``feature_names`` order (booleans '1'/'0', missing 'None'),
  with the gold tag appended as the last column for training files;
* sequences separated by a blank line, trailing blank line included.

Documented divergence: a sequence with ZERO clean tokens produces no
rows in ``token_rows`` and therefore no block here, while the
reference writes an empty block (``'' + '\\n\\n'``) for it.  Wapiti
ignores empty sequences, so trained models are unaffected; only the
file byte layout differs for empty inputs.

100 TB shape: line assembly is pure Column exprs (codegen), the only
shuffle groups token lines back into per-turn sequences keyed by
(conv_id, turn_idx), and the sink writes one text part-file per
partition — ``n_files`` controls the fan-in (wapiti itself is
single-node, so the caller picks how many shards to feed it).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..kernel.wapiti_format import (
    prepare_wapiti_template,
    unigram_template,
)


def fit_feature_names(
    df: DataFrame,
    features_col: str = "features",
    move_to_front: Sequence[str] = ("token",),
) -> Tuple[str, ...]:
    """Distributed :meth:`WapitiFeatureEncoder.fit`: discover the
    feature-name set from a struct or map column and return the
    deterministic column order (front names first, rest sorted).

    For a struct column the names are schema metadata — no job runs.
    For a ``map<string,_>`` column the distinct keys are aggregated
    distributed (one explode + distinct; the result is a feature
    NAME set — tiny by construction)."""
    field = df.schema[features_col].dataType
    from pyspark.sql import types as T

    if isinstance(field, T.StructType):
        keys = set(field.names)
    elif isinstance(field, T.MapType):
        keys = {
            r["k"]
            for r in df.select(
                F.explode(F.map_keys(F.col(features_col))).alias("k")
            )
            .distinct()
            .collect()
        }
    else:
        raise TypeError(
            "features_col must be a struct or map column, got %s"
            % field.simpleString()
        )
    front = tuple(move_to_front)
    return front + tuple(sorted(keys - set(front)))


def wapiti_value_col(col: Column, dtype) -> Column:
    """``to_wapiti_value`` as a Column: booleans → '1'/'0', NULL (a
    missing feature) → 'None', everything else → its string form —
    exact twin of kernel/wapiti_format.to_wapiti_value."""
    from pyspark.sql import types as T

    if isinstance(dtype, T.BooleanType):
        col = F.when(col, "1").when(~col, "0")
    return F.coalesce(col.cast("string"), F.lit("None"))


def wapiti_line_col(
    df: DataFrame,
    feature_names: Sequence[str],
    features_col: str = "features",
    tag_col: Optional[str] = None,
) -> Column:
    """The wapiti data-file line for each token row: feature values
    space-joined in ``feature_names`` order, gold tag appended when
    ``tag_col`` is given (training format).  concat_ws skips NULLs,
    so every value is pre-coalesced by :func:`wapiti_value_col`."""
    from pyspark.sql import types as T

    field = df.schema[features_col].dataType
    if isinstance(field, T.StructType):
        dtypes: Dict[str, object] = {
            f.name: f.dataType for f in field.fields
        }
    else:  # map column: values share one type
        dtypes = {n: field.valueType for n in feature_names}
    parts = [
        wapiti_value_col(F.col(features_col)[name], dtypes.get(name))
        for name in feature_names
    ]
    if tag_col is not None:
        # a NULL tag must fail loudly: concat_ws would silently skip
        # it and wapiti would read the last feature value as the gold
        # label — corrupted training data with no error
        parts.append(
            F.coalesce(
                F.col(tag_col),
                F.raise_error(
                    F.concat(
                        F.lit("NULL gold tag in wapiti train line for "),
                        F.col(features_col)["token"].cast("string"),
                    )
                ).cast("string"),
            )
        )
    return F.concat_ws(" ", *parts)


def wapiti_sequences(
    lines: DataFrame,
    seq_cols: Sequence[str] = ("conv_id", "turn_idx"),
    line_col: str = "line",
    order_col: str = "tok_idx",
) -> DataFrame:
    """Group per-token lines into one data-file BLOCK per sequence
    (lines joined by newline + the trailing newline that yields the
    blank-line separator when written).  One shuffle, keyed by the
    sequence id."""
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(order_col), F.col(line_col)))
        ),
        lambda s: s[line_col],
    )
    return lines.groupBy(*seq_cols).agg(
        F.concat(F.array_join(ordered, "\n"), F.lit("\n")).alias("block")
    )


def write_wapiti_train_files(
    lines: DataFrame,
    path: str,
    seq_cols: Sequence[str] = ("conv_id", "turn_idx"),
    line_col: str = "line",
    order_col: str = "tok_idx",
    n_files: int = 1,
) -> None:
    """Write wapiti train data as ``n_files`` text part-files under
    ``path``.  Deterministic: sequences sort by ``seq_cols`` within
    each part-file; each row is one sequence block, so the text
    sink's per-row newline produces the reference's blank-line
    separation (wapiti.py:303-310) including after the last block."""
    seqs = wapiti_sequences(lines, seq_cols, line_col, order_col)
    (
        seqs.repartition(n_files)
        .sortWithinPartitions(*seq_cols)
        .select("block")
        .write.mode("overwrite")
        .text(path)
    )


def basic_feature_struct(
    tok: Column, tok_idx: Column, n_tokens: Column,
    role: Column, tool: Column,
) -> Column:
    """A compact per-token feature struct whose every field has an
    exact single-node Python twin (sources/goldbuild.py wapiti gold
    block) — the driver-gated wapiti_lines query runs over THIS
    struct so the DuckDB oracle can read a gold parquet built by the
    identical Python-side dicts.  (The full T1-T18 struct keeps its
    parity via the feature differential tests; line FORMATTING parity
    is what the gate here pins.)"""
    from ..functions.token_features import token_shape

    low = F.lower(tok)
    return F.struct(
        tok.alias("token"),
        low.alias("lower"),
        token_shape(tok).alias("shape"),
        F.substring(low, 1, 3).alias("prefix3"),
        low.substr(F.greatest(F.length(low) - 2, F.lit(1)), F.lit(3))
        .alias("suffix3"),
        F.length(tok).alias("length"),
        (tok_idx == 0).alias("at_block_start"),
        F.when(n_tokens == 1, "1")
        .when(n_tokens <= 10, "short")
        .when(n_tokens <= 20, "medium")
        .otherwise("large")
        .alias("block_length"),
        role.alias("role"),
        tool.alias("tool"),
    )


def wapiti_train_lines(turns: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, tok_idx, line) — the wapiti TRAIN data
    line (features + gold tag) for every clean token of every turn:
    the end-to-end K3/M3 path the driver gates against the
    single-node twin's gold parquet."""
    from .features_op import token_rows

    toks = token_rows(turns)
    feats = toks.withColumn(
        "features",
        basic_feature_struct(
            F.col("token"), F.col("tok_idx"), F.col("n_tokens"),
            F.col("role"), F.col("tool"),
        ),
    )
    names = fit_feature_names(feats, move_to_front=("token",))
    return feats.select(
        "conv_id",
        "turn_idx",
        "tok_idx",
        wapiti_line_col(feats, names, tag_col="tag").alias("line"),
    )


def write_wapiti_template(
    path: str,
    feature_names: Sequence[str],
    feature_template: str = "",
    unigrams_scope: Optional[str] = "*",
) -> str:
    """Driver-side twin of the reference's template file creation
    (wapiti.py:313-323): the user template with names resolved to
    column indices, plus the all-features unigram block when
    ``unigrams_scope`` is set.  Returns the written text."""
    vocab = {f: i for i, f in enumerate(feature_names)}
    text = prepare_wapiti_template(feature_template, vocab)
    if unigrams_scope is not None:
        text += "\n" + unigram_template(feature_names, unigrams_scope)
    with open(path, "w", encoding="utf8") as f:
        f.write(text)
    return text
