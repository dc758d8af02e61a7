# -*- coding: utf-8 -*-
"""Wapiti text-format support (closes SURVEY §2 K3 + M3): the train
data file layout and the ``%x[row,col]`` feature-template encoding
that the reference uses to interoperate with the external wapiti CRF
binary (/root/reference/webstruct/wapiti.py:206-251 data files,
:335-474 ``WapitiFeatureEncoder`` / ``prepare_wapiti_template``).

This module is the single-node twin with the reference's exact
observable behavior (its doctests are replicated as goldens in
tests/test_wapiti_format.py); the distributed sink lives in
operators/wapiti_io.py and must stay in lockstep.

One DOCUMENTED divergence: the reference builds ``feature_names_`` as
``move_to_front + tuple(set(...))`` — Python set-iteration order,
nondeterministic across processes — which would break distributed
line assembly and the driver hash oracle.  Here the non-front names
are SORTED; every individual reference doctest (which uses
move_to_front for all its keys) still passes verbatim.
"""
from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

__all__ = [
    "WapitiFeatureEncoder",
    "prepare_wapiti_template",
    "to_wapiti_value",
    "to_train_sequence",
    "sequences_to_data_blocks",
]


def to_wapiti_value(val) -> str:
    """Reference ``_tostr`` parity (wapiti.py:477-494): strings pass
    through, booleans become '1'/'0', everything else (including
    ``None`` for a missing feature) is ``str()``-ed."""
    if isinstance(val, str):
        return val
    if isinstance(val, bool):
        return "1" if val else "0"
    return str(val)


# %x[row,col] macro, also %X/%t/%T/%m/%M; col may be a feature name.
# Spec-level identical to the reference's WAPITI_MACRO_PATTERN
# (wapiti.py:441-449) — it IS the wapiti template grammar.
_MACRO_RE = re.compile(
    r"(%[xXtTmM])\[\s*(-?\d+)\s*,\s*([^\],\s]+)\s*([\],])"
)


def _is_comment(line: str) -> bool:
    return line.strip().startswith("#")


def prepare_wapiti_template(template: str, vocabulary: Dict[str, int]) -> str:
    """Replace feature NAMES with their column indices inside
    ``%x[row,col]`` macros; numeric columns and comment lines pass
    through untouched (reference wapiti.py:452-474).

    >>> vocab = {'token': 0, 'tag': 1}
    >>> prepare_wapiti_template(
    ...     '*:Pos-1 L=%x[-1, tag]\\n*:Suf-2 X=%m[ 0,token,".?.?$"]',
    ...     vocab)
    '*:Pos-1 L=%x[-1,1]\\n*:Suf-2 X=%m[0,0,".?.?$"]'
    >>> prepare_wapiti_template(
    ...     '*:Pos-1 L=%x[-1, tag]\\n# *:Suf-2 X=%m[ 0,token,".?.?$"]',
    ...     vocab)
    '*:Pos-1 L=%x[-1,1]\\n# *:Suf-2 X=%m[ 0,token,".?.?$"]'
    """

    def repl(m: "re.Match[str]") -> str:
        macro, offset, column, rest = m.groups()
        if not column.isdigit():
            column = str(vocabulary[column])
        return "%s[%s,%s%s" % (macro, offset, column, rest)

    return "\n".join(
        line if _is_comment(line) else _MACRO_RE.sub(repl, line)
        for line in template.splitlines()
    )


def unigram_template(names: Sequence[str], scope: str = "*") -> str:
    """Unigram template block for the given feature columns — exact
    reference layout (wapiti.py:408-426); the encoder method
    delegates here so callers with a bare name list need no fitted
    encoder."""
    lines = ["\n# Unigrams for all custom features"]
    for col, name in enumerate(names):
        lines.append("%sfeat:%s=%%x[0,%d]" % (scope, name, col))
    return "\n".join(lines) + "\n"


def to_train_sequence(lines: Sequence[str], tags: Sequence[str]) -> str:
    """One training sequence: each feature line gets its gold tag as
    the LAST column (reference wapiti.py:326-327)."""
    return "\n".join(
        "%s %s" % (line, tag) for line, tag in zip(lines, tags)
    )


def sequences_to_data_blocks(seqs: Iterable[str]) -> str:
    """Wapiti data-file layout: every sequence block is followed by a
    blank line, including the last (reference wapiti.py:303-310
    writes ``seq + '\\n\\n'`` per sequence)."""
    return "".join(s + "\n\n" for s in seqs)


class WapitiFeatureEncoder:
    """Sequence-of-feature-dicts → wapiti data-file lines + template
    preparation (reference wapiti.py:335-437).

    ``move_to_front`` names become the FIRST columns in the given
    order; all other names seen during :meth:`fit` follow, sorted
    (see module docstring for the determinism divergence).
    """

    def __init__(self, move_to_front: Sequence[str] = ("token",)):
        self.move_to_front: Tuple[str, ...] = tuple(move_to_front)
        self.feature_names_: Optional[Tuple[str, ...]] = None
        self.vocabulary_: Optional[Dict[str, int]] = None

    def fit(
        self, X: Sequence[Sequence[dict]], y=None
    ) -> "WapitiFeatureEncoder":
        return self.partial_fit(X)

    def partial_fit(
        self, X: Sequence[Sequence[dict]], y=None
    ) -> "WapitiFeatureEncoder":
        keys = set(self.feature_names_ or ())
        front = set(self.move_to_front)
        for feature_dicts in X:
            for dct in feature_dicts:
                keys.update(dct.keys())
        keys -= front
        self.feature_names_ = self.move_to_front + tuple(sorted(keys))
        self.vocabulary_ = {
            f: i for i, f in enumerate(self.feature_names_)
        }
        return self

    def transform_single(self, feature_dicts: Sequence[dict]) -> List[str]:
        """One sequence of dicts → one wapiti line per token: the
        ``to_wapiti_value`` of every known feature, space-joined in
        ``feature_names_`` order (missing keys render as 'None' —
        ``dict.get`` parity with the reference)."""
        names = self.feature_names_
        if names is None:
            raise ValueError("encoder is not fitted")
        return [
            " ".join(to_wapiti_value(dct.get(k)) for k in names)
            for dct in feature_dicts
        ]

    def transform(self, X: Sequence[Sequence[dict]]) -> List[List[str]]:
        return [self.transform_single(dicts) for dicts in X]

    def prepare_template(self, template: str) -> str:
        if self.vocabulary_ is None:
            raise ValueError("encoder is not fitted")
        return prepare_wapiti_template(template, self.vocabulary_)

    def unigram_features_template(self, scope: str = "*") -> str:
        """Unigram template block for every known feature — exact
        reference layout (wapiti.py:408-426 doctests):

        >>> we = WapitiFeatureEncoder(['token', 'tag'])
        >>> _ = we.fit([[{'token': 'the', 'tag': 'DT'},
        ...              {'token': 'dog', 'tag': 'NN'}]])
        >>> print(we.unigram_features_template())
        <BLANKLINE>
        # Unigrams for all custom features
        *feat:token=%x[0,0]
        *feat:tag=%x[0,1]
        <BLANKLINE>
        """
        if self.feature_names_ is None:
            raise ValueError("encoder is not fitted")
        return unigram_template(self.feature_names_, scope)

    def reset(self) -> None:
        self.feature_names_ = None
        self.vocabulary_ = None
