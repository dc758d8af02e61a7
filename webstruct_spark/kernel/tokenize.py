# -*- coding: utf-8 -*-
"""Treebank-style word tokenizer with exact reference parity.

Reproduces the observable semantics of the reference tokenizer
(``/root/reference/webstruct/text_tokenizers.py:9-217``):

* the 10 ordered split rules (``text_tokenizers.py:130-141``),
* the open-quote pre-pass (``text_tokenizers.py:143-161``),
* exact ``(chars, position, length)`` char offsets into the original
  string, and
* the DefaultTokenizer rule that drops standalone ``,`` / ``;``
  (``text_tokenizers.py:201-214``).

Implementation is NOT the reference's per-position rule loop: the rule
list is compiled into one alternation scanned with a single
``finditer`` pass (O(n) instead of O(n·rules) ``re.match`` calls on
string slices).  Equivalence argument: the reference tries rules in
order at each character position and the first match wins; a Python
regex alternation tried by ``finditer`` examines positions left to
right and alternatives in listed order at each position, which is the
identical precedence.  ``$``-anchored rules behave the same because the
reference matches them against the suffix ``text[i:]`` whose end is the
same end-of-string position.

Gated by the reference's own doctest goldens in
``tests/test_kernel_tokenize.py``.
"""
from __future__ import annotations

import re
from typing import Iterable, List, Tuple

Token = Tuple[str, int, int]  # (chars, position, length)

# (pattern, replacement); replacement None means "emit matched text".
# Order is load-bearing — it is the reference's rule precedence.
_RULES = [
    (r"\s+", ""),  # whitespace separates, emits nothing
    (r"“", "``"),
    (r'["”]', "''"),
    (r"``", None),
    (r"…|\.\.\.", "..."),
    (r"--", None),
    (r",(?=\D|$)", None),  # comma splits only before a non-digit / end
    (r"\.$", None),  # final dot
    (r"[;#$£%&|!?\[\](){}<>]", None),
    (r"'(?=\s)|''", None),
]

_SCANNER = re.compile(
    "|".join("(?P<r%d>%s)" % (i, pat) for i, (pat, _) in enumerate(_RULES)),
    re.UNICODE,
)
_REPLACEMENT = {"r%d" % i: repl for i, (_, repl) in enumerate(_RULES)}

# A double quote at string start or after whitespace / open bracket is
# an opening quote (reference ``open_quotes`` regex).
_OPEN_QUOTE = re.compile(r'(^|[\s(\[{<])"')

_DROPPED_STANDALONE = frozenset({",", ";"})

# Fast-path safety: a whitespace-delimited word that contains none of
# these triggers scans to itself as a single token in any context.
# Rules 8 (final dot) and 10 ('-before-whitespace) are context
# dependent and handled by the endswith checks in `_scan`; no trigger
# pattern can span a whitespace gap, so word-local scanning with a
# one-space boundary sentinel is exactly equivalent to the full-
# segment scan (differential-fuzzed vs the reference implementation).
_UNSAFE = re.compile(r'[“"”`…,;#$£%&|!?\[\](){}<>]')
_WORD_RE = re.compile(r"\S+")


def _scan_core(segment: str, base: int, out: List[Token]) -> None:
    """The rule scanner: single alternation pass over a segment."""
    last = 0
    for m in _SCANNER.finditer(segment):
        start = m.start()
        if start > last:
            out.append((segment[last:start], base + last, start - last))
        repl = _REPLACEMENT[m.lastgroup]
        chars = m.group() if repl is None else repl
        if chars:
            out.append((chars, base + start, m.end() - start))
        last = m.end()
    if last < len(segment):
        out.append((segment[last:], base + last, len(segment) - last))


def _scan(segment: str, base: int, out: List[Token]) -> None:
    """Scan one quote-free segment, appending tokens with offsets
    shifted by ``base``.

    Words without rule-trigger characters bypass the scanner entirely;
    unsafe words are scanned with a trailing-space sentinel when they
    are not segment-final (so the $-anchored and whitespace-lookahead
    rules see the same context as in the full-segment scan)."""
    seglen = len(segment)
    unsafe_search = _UNSAFE.search
    append = out.append
    for m in _WORD_RE.finditer(segment):
        w = m.group()
        end = m.end()
        # `$` matches at segment end AND just before one final newline
        # (Python re semantics) — a trailing dot is rule-8-splittable
        # exactly when nothing but "" or "\n" follows the word.
        at_dollar = end == seglen or (
            end == seglen - 1 and segment[seglen - 1] == "\n"
        )
        if (
            unsafe_search(w) is None
            and "--" not in w
            and "..." not in w
            and "''" not in w
            and not w.endswith("'")
            and not (at_dollar and w.endswith("."))
        ):
            append((w, base + m.start(), len(w)))
        elif end == seglen:
            _scan_core(w, base + m.start(), out)
        elif at_dollar:
            # followed by the segment-final newline: sentinel "\n"
            # preserves both rule 8 ($ before final newline) and the
            # whitespace lookahead of rule 10
            _scan_core(w + "\n", base + m.start(), out)
        else:
            _scan_core(w + " ", base + m.start(), out)


def segment_words_py(text: str) -> List[Token]:
    """WordTokenizer-parity segmentation: list of (chars, position,
    length) covering ``text``.  Pure-Python path; also the
    differential oracle for the native kernel."""
    out: List[Token] = []
    start = 0
    for q in _OPEN_QUOTE.finditer(text):
        quote_pos = q.end() - 1
        _scan(text[start:quote_pos], start, out)
        out.append(("``", quote_pos, 1))
        start = q.end()
    _scan(text[start:], start, out)
    return out


def default_segment_words_py(text: str) -> List[Token]:
    """DefaultTokenizer parity: ``segment_words`` minus standalone
    ``,`` / ``;`` tokens (reference drops them because they break tag
    sets, ``text_tokenizers.py:201-214``)."""
    return [
        t for t in segment_words_py(text) if t[0] not in _DROPPED_STANDALONE
    ]


# Native C kernel (gcc-compiled on first use; tests/test_ctok_differential.py
# fuzzes it against the Python oracle above).  Falls back transparently.
try:
    from ._ctok_build import load as _load_ctok

    ctok = _load_ctok()
except Exception:  # pragma: no cover - build environment without gcc
    ctok = None

if ctok is not None:
    segment_words = ctok.segment_words
    default_segment_words = ctok.default_segment_words
else:  # pragma: no cover
    segment_words = segment_words_py
    default_segment_words = default_segment_words_py


def tokenize_batch(
    texts: Iterable[str], drop_punct: bool = True
) -> List[List[Token]]:
    """Batch entry point used by the Arrow pandas UDF wrappers."""
    seg = default_segment_words if drop_punct else segment_words
    return [seg(t or "") for t in texts]
