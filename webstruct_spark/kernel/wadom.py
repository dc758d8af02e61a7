# -*- coding: utf-8 -*-
"""WebAnnotator annotation ingestion with nested/overlapping-span
support — the full semantics of
/root/reference/webstruct/loaders.py:56-104 ``WebAnnotatorLoader``:

* spans carrying the same ``wa-id`` (split across elements, nested
  inside other annotations) form ONE entity,
* `` __START_T__ `` is prepended to the FIRST element's text and
  `` __END_T__ `` appended to the LAST element's direct text (before
  its children — exact ``_process_entities`` text-node ops),
* ``known_entities`` prunes spans of other wa-types first
  (``_prune_tags``/``drop_tag``: wrapper removed, content kept),
* ``<wa-color>`` legend subtrees are dropped (``_cleanup_tree``).

lxml is not available in this environment, so a minimal stack-based
HTML element tree (text/children/tail, void-element aware) is built
directly; because the output consumed downstream is the document-order
TEXT (the tokenizer's input), ``drop_tag`` is equivalent to skipping
the wrapper during text extraction — which is what this does.

Gated by the reference's own nested-fragment golden
(tests/test_loaders.py ``test_wa_nested_fragment``) ported to
tests/test_wa_nested.py.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Set

_TAG_RE = re.compile(
    r"<!--.*?-->|<(/?)([a-zA-Z][a-zA-Z0-9_-]*)((?:\s[^<>]*?)?)(/?)>",
    re.DOTALL,
)
_ATTR_RE = re.compile(r"([a-zA-Z_][\w.:-]*)\s*=\s*\"([^\"]*)\"")

_VOID = frozenset(
    "br img hr meta link input base area col embed source track wbr".split()
)


class _Node:
    __slots__ = ("tag", "attrs", "text", "children", "tail")

    def __init__(self, tag: str, attrs: Dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.text = ""
        self.children: List["_Node"] = []
        self.tail = ""


def _append_text(cur: _Node, chunk: str) -> None:
    if not chunk:
        return
    if cur.children:
        cur.children[-1].tail += chunk
    else:
        cur.text += chunk


def parse_html(s: str) -> _Node:
    """Minimal well-formed-ish HTML → element tree (comments dropped,
    void elements self-closing, stray close tags ignored)."""
    root = _Node("#root", {})
    stack = [root]
    pos = 0
    for m in _TAG_RE.finditer(s):
        _append_text(stack[-1], s[pos : m.start()])
        pos = m.end()
        if m.group(2) is None:
            continue  # comment
        closing, tag, attr_str, selfclose = (
            m.group(1), m.group(2).lower(), m.group(3) or "", m.group(4),
        )
        if closing:
            # pop to the matching open tag, ignore if unmatched
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            continue
        node = _Node(tag, dict(_ATTR_RE.findall(attr_str)))
        stack[-1].children.append(node)
        if not selfclose and tag not in _VOID:
            stack.append(node)
    _append_text(stack[-1], s[pos:])
    return root


def _iter_dfs(node: _Node):
    for c in node.children:
        yield c
        yield from _iter_dfs(c)


def _doc_text(node: _Node, out: List[str], skip: Set[int]) -> None:
    out.append(node.text)
    for c in node.children:
        if id(c) in skip:
            out.append(c.tail)  # drop_tree keeps no content; tail stays
            continue
        _doc_text(c, out, skip)
        out.append(c.tail)


def _drop_tag_prune(node: _Node, known: Set[str]) -> None:
    """lxml ``drop_tag`` for every span whose wa-type is unknown:
    remove the wrapper, splice its text/children/tail into the parent
    at the same position (bottom-up, so nested unknown spans fold
    correctly) — exact ``_prune_tags`` restructuring."""
    new_children: List[_Node] = []
    for c in node.children:
        _drop_tag_prune(c, known)
        wa_type = c.attrs.get("wa-type")
        if c.tag == "span" and wa_type is not None and wa_type not in known:
            # text merges into the preceding position
            if new_children:
                new_children[-1].tail += c.text
            else:
                node.text += c.text
            new_children.extend(c.children)
            # tail lands after the spliced children (or same position)
            if new_children:
                new_children[-1].tail += c.tail
            else:
                node.text += c.tail
        else:
            new_children.append(c)
    node.children = new_children


def wa_to_markers(html: str, known_entities: Optional[Set[str]] = None) -> str:
    """WebAnnotator 'save format' HTML → marker-bearing plain text."""
    tree = parse_html(html)
    if known_entities is not None:
        _drop_tag_prune(tree, set(known_entities))
    entities: Dict[str, List[_Node]] = {}
    for el in _iter_dfs(tree):
        if el.tag == "span" and el.attrs.get("wa-id") is not None:
            entities.setdefault(el.attrs["wa-id"], []).append(el)
    for elems in entities.values():
        tp = elems[0].attrs.get("wa-type", "")
        elems[0].text = " __START_%s__ %s" % (tp, elems[0].text or "")
        elems[-1].text = "%s __END_%s__ " % (elems[-1].text or "", tp)
    drop: Set[int] = set()
    for el in _iter_dfs(tree):  # _cleanup_tree: wa-color legend subtree
        if el.tag == "wa-color":
            drop.add(id(el))
    out: List[str] = []
    _doc_text(tree, out, drop)
    return "".join(out)
