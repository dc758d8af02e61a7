# -*- coding: utf-8 -*-
"""IOB2/BILOU sequence codec with exact reference parity.

Reproduces ``/root/reference/webstruct/sequence_encoding.py``:

* marker classification ``__(START|END)_(\\w+?)__``
  (``sequence_encoding.py:163-192``),
* the stateful encode scan — markers are consumed, every surviving
  token gets a tag, mismatched close markers raise
  (``sequence_encoding.py:58-85``),
* lenient grouping with the dangling ``I-X`` → ``B-X`` repair rule and
  the strict mode that raises instead
  (``sequence_encoding.py:134-159``).

The repair rule is load-bearing for triple P/R parity.  Gated by the
reference doctest goldens in ``tests/test_kernel_bilou.py``.
"""
from __future__ import annotations

import re
from typing import Any, Iterable, List, Sequence, Tuple

_MARKER_RE = re.compile(r"__(START|END)_(\w+?)__")


def classify_token(token: str) -> Tuple[str, str]:
    """Classify one token as ('start', TYPE) / ('end', TYPE) /
    ('token', chars)."""
    m = _MARKER_RE.match(token)
    if m:
        return m.group(1).lower(), m.group(2)
    return "token", token


def limit_tags(tokens: Sequence, tagset, chars_of=lambda t: t) -> List:
    """Tagset projection (P3): drop ``__START_X__``/``__END_X__``
    marker tokens whose type is NOT in ``tagset``, keeping every text
    token (positions untouched) — reference ``_limit_tags``
    (/root/reference/webstruct/html_tokenizer.py:323-332).

    ``tokens`` may be raw strings or (chars, pos, len) tuples via
    ``chars_of``.  ``tagset=None`` is the identity.
    """
    if tagset is None:
        return list(tokens)
    keep = set(tagset)
    out = []
    for tok in tokens:
        kind, value = classify_token(chars_of(tok))
        if kind in ("start", "end") and value not in keep:
            continue
        out.append(tok)
    return out


def encode_tokens(tokens: Sequence[str]) -> List[Tuple[int, str]]:
    """Stateful IOB2 encode of a marker-bearing token stream.

    Returns ``[(index_into_tokens, iob2_tag)]`` for the non-marker
    tokens, in order.  Raises ``ValueError`` on a close marker that
    does not match the currently open type.
    """
    out: List[Tuple[int, str]] = []
    tag = "O"
    for idx, token in enumerate(tokens):
        if not token.startswith("__"):
            # fast path: the marker regex is anchored at "__", so a
            # non-"__" token is always ('token', ...)
            out.append((idx, tag))
            if tag[0] == "B":
                tag = "I" + tag[1:]
            continue
        kind, value = classify_token(token)
        if kind == "start":
            tag = "B-" + value
        elif kind == "end":
            if value != tag[2:]:
                raise ValueError(
                    "Invalid tag sequence: close tag %r doesn't match "
                    "open tag %r." % (value, tag)
                )
            tag = "O"
        else:
            out.append((idx, tag))
            if tag.startswith("B"):
                tag = "I" + tag[1:]
    return out


def group_tags(
    data: Iterable[Tuple[Any, str]], strict: bool = False
) -> List[Tuple[List[Any], str]]:
    """Group an ``(info, iob2_tag)`` stream into runs
    ``([infos], entity_type_or_'O')``.

    Lenient mode (default) repairs a dangling ``I-X`` that does not
    continue an open ``X`` run into ``B-X``; strict mode raises.
    """
    groups: List[Tuple[List[Any], str]] = []
    buf: List[Any] = []
    tag = "O"
    for info, iob_tag in data:
        if iob_tag.startswith("I-") and tag != iob_tag[2:]:
            if strict:
                raise ValueError(
                    "Invalid sequence: %s tag can't start sequence" % iob_tag
                )
            iob_tag = "B-" + iob_tag[2:]
        if iob_tag.startswith("B-"):
            if buf:
                groups.append((buf, tag))
            buf = []
        elif iob_tag == "O":
            if buf and tag != "O":
                groups.append((buf, tag))
                buf = []
        tag = "O" if iob_tag == "O" else iob_tag[2:]
        buf.append(info)
    if buf:
        groups.append((buf, tag))
    return groups


def decode_mentions(
    infos: Sequence[Any], tags: Sequence[str]
) -> List[Tuple[List[Any], str]]:
    """Non-'O' runs of a tagged sequence: the mention spans."""
    return [(items, t) for items, t in group_tags(zip(infos, tags)) if t != "O"]
