# -*- coding: utf-8 -*-
"""Per-token feature functions T1-T18 as pure Column expressions over
an exploded token column — the vectorized re-expression of
/root/reference/webstruct/features/token_features.py,
block_features.py and data_features.py (regexes and literal sets kept
semantically identical; citations per feature).

These stay inside whole-stage codegen: one ``select`` builds the whole
feature struct with zero Python.  ``feature_struct`` is the analog of
the reference's ``_CombinedFeatures`` merge
(feature_extraction.py:166-183).
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# T4 shape classes (token_features.py:107-121; NLTK-derived regexes).
# Reference quirks preserved exactly: the number regex's `$` anchors
# ONLY the second alternative (so '9am' is 'number'); (?U) gives
# Java's \w/\W Python's unicode semantics.
_SHAPE_NUMBER = r"^[-+]?[0-9]+(\.[0-9]*)?|^[0-9]*\.[0-9]+$"
_SHAPE_PUNCT = r"(?U)^\W+$"
_SHAPE_UPCASE = r"^[A-Z][a-z'`]+$"
_SHAPE_CAPS = r"^[A-Z][A-Z'`]+$"
_SHAPE_DOWN = r"^[a-z]+$"
_SHAPE_MIXED = r"(?U)^\w+$"

# T13 email regex (data_features.py:10-16), TLD whitelist intact
_EMAIL_RE = (
    r"(\s|%20|\b)[\w][\w_.-]*@[\w][\w_.-]*\."
    r"([a-z]{2}|aero|asia|biz|cat|com|coop|edu|gov|info|int|jobs|mil|"
    r"moby|museum|name|net|org|pro|tel|travel|xxx)\b"
)

# T14 literal sets (data_features.py:25-47)
STREET_PARTS = (
    "avenue ave ave. boulevard blvd blvd. street str. st. road rd rd. "
    "drive dr dr. lane ln ln. court circle place pl ridgeway parkway "
    "highway park unit block"
).split()
ADDRESS_PARTS = "suite floor p.o. po center".split()
DIRECTIONS = (
    "north south east west n s e w n. s. e. w. ne se sw nw "
    "northeast southeast southwest northwest"
).split()

# T16 month/weekday sets: the exact flattened EN+NL unions from the
# reference (features/datetime_format.py:6-53), lowercased — the
# reference regex is ^(...)$ with IGNORECASE, so case-insensitive set
# membership is equivalent.
MONTHS = (
    "jan january januari jan. feb february februari feb. "
    "mar mrt maart march mrt. maa. maa apr april apr. may mei "
    "jun june juni jun. jul july juli jul. aug august augustus aug. "
    "sep september sep. okt oct october oktober okt. nov november "
    "nov. dec december dec.".split()
)
WEEKDAYS = (
    "mon monday maandag ma. ma tue tuesday dinsdag di. di "
    "wed wednesday woensdag wo. wo thu thursday donderdag do. do "
    "fri friday vrijdag vr. vr sat saturday zaterdag za. za "
    "sun sunday zondag zo. zo".split()
)

RANGES = "t/m - van tot from to".split()


def token_shape(tok: Column) -> Column:
    """T4: number/punct/upcase/caps/downcase/mixedcase/other."""
    return (
        F.when(tok.rlike(_SHAPE_NUMBER), "number")
        .when(tok.rlike(_SHAPE_PUNCT), "punct")
        .when(tok.rlike(_SHAPE_UPCASE), "upcase")
        .when(tok.rlike(_SHAPE_CAPS), "caps")
        .when(tok.rlike(_SHAPE_DOWN), "downcase")
        .when(tok.rlike(_SHAPE_MIXED), "mixedcase")
        .otherwise("other")
    )


def digit_ratio(tok: Column) -> Column:
    digits = F.length(F.regexp_replace(tok, r"\D", ""))
    return digits / F.length(tok)


def number_pattern(tok: Column) -> Column:
    """T7: digits→X mask when digit_ratio >= 0.3, else null."""
    return F.when(
        digit_ratio(tok) >= 0.3, F.regexp_replace(tok, r"\d", "X")
    )


def number_pattern2(tok: Column) -> Column:
    """T7: additionally mask word chars → C."""
    return F.when(
        digit_ratio(tok) >= 0.3,
        F.regexp_replace(F.regexp_replace(tok, r"\d", "X"), r"[^X\W]", "C"),
    )


def feature_struct(tok: Column, tok_idx: Column, block_len: Column,
                   role: Column, tool: Column) -> Column:
    """The full per-token feature struct (T1-T18 + block features
    T9-T12 with role/tool as the transcript analog of parent-tag /
    inside-tag)."""
    low = F.lower(tok)
    return F.struct(
        F.lit(1).alias("bias"),  # T1
        tok.alias("token"),  # T2
        low.alias("lower"),  # T3
        token_shape(tok).alias("shape"),  # T4
        (F.substring(tok, 1, 1) == F.upper(F.substring(tok, 1, 1)))
        .alias("first_upper"),  # T4 (first-char-upper; upper==lower for
        # non-letters matches Python isupper() only for letters — see
        # viterbi featurization note)
        (tok.endswith(".") & (tok != ".")).alias("endswith_dot"),  # T5
        (tok.endswith(":") & (tok != ":")).alias("endswith_colon"),  # T5
        tok.contains("©").alias("has_copyright"),  # T6
        number_pattern(tok).alias("num_pattern"),  # T7
        number_pattern2(tok).alias("num_pattern2"),  # T7
        F.substring(low, 1, 2).alias("prefix2"),  # T8
        F.substring(low, 1, 3).alias("prefix3"),
        F.substring(low, 1, 4).alias("prefix4"),
        low.substr(F.greatest(F.length(low) - 1, F.lit(1)), F.lit(2))
        .alias("suffix2"),
        low.substr(F.greatest(F.length(low) - 2, F.lit(1)), F.lit(3))
        .alias("suffix3"),
        low.substr(F.greatest(F.length(low) - 3, F.lit(1)), F.lit(4))
        .alias("suffix4"),
        role.alias("parent_role"),  # T9 analog
        tool.isNotNull().alias("inside_tool"),  # T10 analog
        (tok_idx == 0).alias("at_block_start"),  # T11
        (tok_idx == block_len - 1).alias("at_block_end"),  # T11
        F.when(block_len == 1, "1")  # T12
        .when(block_len <= 10, "short")
        .when(block_len <= 20, "medium")
        .otherwise("large")
        .alias("block_length"),
        F.lower(tok).rlike(_EMAIL_RE).alias("looks_like_email"),  # T13
        low.isin(STREET_PARTS).alias("common_street_part"),  # T14
        low.isin(ADDRESS_PARTS).alias("common_address_part"),
        low.isin(DIRECTIONS).alias("direction"),
        (
            tok.rlike(r"^[0-9]{4}$")
            & F.substring(tok, 1, 2).isin("19", "20")
        ).alias("looks_like_year"),  # T15
        low.isin(MONTHS).alias("looks_like_month"),  # T16
        low.isin(WEEKDAYS).alias("looks_like_weekday"),
        tok.rlike(r"^\d{1,2}[\.:]\d{2}").alias("looks_like_time"),  # T17
        low.isin(RANGES).alias("looks_like_range"),  # T18
    )
