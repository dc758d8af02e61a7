# -*- coding: utf-8 -*-
"""Text-analysis operators for a training-data pipeline: token
counting, quality scoring, document fingerprinting, language ID.

Everything except language-ID is pure Column expressions (JVM-side,
codegen'd, SQL-oracle-checkable).  The deterministic formulas are
specified here once; the DuckDB oracle SQL in __spark_entry__ encodes
the identical arithmetic.
"""
from __future__ import annotations

from typing import Dict, List

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

STOPWORDS = (
    "the of and a in to is it for on with as at by an be this that "
    "from or are was but not have has had you we they he she i"
).split()


from ..operators.linking import norm_text_col  # shared definition


def words_col(c: Column) -> Column:
    """Whitespace words of normalized text (empty tokens removed)."""
    return F.filter(F.split(norm_text_col(c), " "), lambda w: F.length(w) > 0)


def token_count(c: Column) -> Column:
    return F.size(words_col(c))


def _stop_count(c: Column) -> Column:
    return F.size(F.filter(words_col(c), lambda x: x.isin(STOPWORDS)))


def _len_sum(c: Column) -> Column:
    return F.aggregate(words_col(c), F.lit(0), lambda acc, x: acc + F.length(x))


def stopword_x10k(c: Column) -> Column:
    """floor(10000·stopwords/n) — integer-scaled ratios are exact and
    engine-portable; double rounding at decimal midpoints is not
    (Spark HALF_UP on exact doubles vs DuckDB scaled-double round
    disagree near 1e-4 midpoints)."""
    n = token_count(c)
    return F.when(
        n > 0, F.floor(F.lit(10000) * _stop_count(c) / n).cast("int")
    ).otherwise(F.lit(0))


def mean_word_len_x100(c: Column) -> Column:
    """floor(100·total_chars/n)."""
    n = token_count(c)
    return F.when(
        n > 0, F.floor(F.lit(100) * _len_sum(c) / n).cast("int")
    ).otherwise(F.lit(0))


def quality_x10k(c: Column) -> Column:
    """Deterministic heuristic quality scaled to [0, 10000]:
    floor(4000·min(n,100)/100) + floor(3000·(n−stops)/n)
    + floor(3000·min(8n, total_chars)/(8n))."""
    n = token_count(c)
    stops = _stop_count(c)
    total = _len_sum(c)
    t1 = F.floor(F.lit(4000) * F.least(n, F.lit(100)) / F.lit(100))
    t2 = F.floor(F.lit(3000) * (n - stops) / n)
    t3 = F.floor(F.lit(3000) * F.least(F.lit(8) * n, total) / (F.lit(8) * n))
    return F.when(n > 0, (t1 + t2 + t3).cast("int")).otherwise(F.lit(0))


def fingerprint(c: Column) -> Column:
    """Stable document fingerprint: md5 of normalized text (identical
    in any engine with md5)."""
    return F.md5(norm_text_col(c))


def text_profile(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(c).alias("n_tokens"),
        F.length(norm_text_col(c)).cast("int").alias("n_chars"),
        stopword_x10k(c).alias("stop_x10k"),
        mean_word_len_x100(c).alias("mwl_x100"),
        quality_x10k(c).alias("quality_x10k"),
        fingerprint(c).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# language ID: character-bigram profile scoring (deterministic, tiny
# built-in profiles). Shared pure function -> pandas UDF + gold builder.

_LANG_PROFILES: Dict[str, List[str]] = {
    "en": ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"],
    "es": ["de", "en", "el", "la", "os", "es", "ar", "ue", "ra", "as"],
    "fr": ["es", "le", "de", "en", "re", "nt", "on", "er", "te", "ou"],
    "de": ["en", "er", "ch", "de", "ei", "ie", "in", "te", "nd", "ge"],
}


def lang_id_py(text: str) -> str:
    """Most-overlapping bigram profile; ties broken by language code
    (lexicographic) — deterministic."""
    t = (text or "").lower()
    bigrams = {t[i : i + 2] for i in range(len(t) - 1)}
    best = ("", -1)
    for lang in sorted(_LANG_PROFILES):
        score = sum(1 for b in _LANG_PROFILES[lang] if b in bigrams)
        if score > best[1]:
            best = (lang, score)
    return best[0]


@pandas_udf(T.StringType())
def lang_id_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lang_id_py)
