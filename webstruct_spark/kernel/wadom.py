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
# attribute values: double-quoted, single-quoted, or unquoted — the
# same tolerance as lxml's HTML parser in the reference loader (a
# WebAnnotator span with wa-id='1' must not silently drop annotations)
_ATTR_RE = re.compile(
    r"([a-zA-Z_][\w.:-]*)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s\"'<>`]+))"
)

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
        node = _Node(
            tag,
            {
                m.group(1): m.group(2)
                if m.group(2) is not None
                else (m.group(3) if m.group(3) is not None else m.group(4))
                for m in _ATTR_RE.finditer(attr_str)
            },
        )
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
    import html as _html

    # lxml exposes DOM text unescaped; mirror that
    return _html.unescape("".join(out))


# ---------------------------------------------------------------------------
# K2: to_webannotator export — the inverse direction.  The reference
# (/root/reference/webstruct/webannotator.py:376-434) spends its
# complexity on splitting annotations across DOM element boundaries;
# transcript turns are flat text, so the export reduces to marker-run →
# <span> conversion plus the color legend.  Colors follow the
# reference's published DEFAULT_COLORS table
# (webannotator.py:21-39); past 16 entity types the reference picks
# random colors — here they are blake2b-derived instead so the export
# is deterministic (documented divergence).

import hashlib as _hashlib

_MARKER = re.compile(r"__(START|END)_(\w+?)__")

DEFAULT_COLORS = [
    ("#000000", "#33CCFF"), ("#000000", "#FF0000"),
    ("#000000", "#33FF33"), ("#000000", "#CC66CC"),
    ("#000000", "#FF9900"), ("#000000", "#99FFFF"),
    ("#000000", "#FF6666"), ("#000000", "#66FF99"),
    ("#FFFFFF", "#3333FF"), ("#FFFFFF", "#660000"),
    ("#FFFFFF", "#006600"), ("#FFFFFF", "#663366"),
    ("#FFFFFF", "#993300"), ("#FFFFFF", "#336666"),
    ("#FFFFFF", "#666600"), ("#FFFFFF", "#009900"),
]


class EntityColors(dict):
    """{'type': (fg, bg, entity_index)}, generating entries on first
    access (reference EntityColors, webannotator.py:50-62)."""

    def __missing__(self, key):
        idx = len(self)
        if idx < len(DEFAULT_COLORS):
            fg, bg = DEFAULT_COLORS[idx]
        else:  # deterministic overflow colors (reference uses random);
            # rehash until the background is distinct from every
            # already-assigned one so two types never share a legend
            # color (the reference's random choice can collide)
            taken = {b for _f, b, _i in self.values()} | {
                b for _f, b in DEFAULT_COLORS
            }
            fg = "#000000"
            salt = -1  # first probe = unsalted hash (stable names)
            while True:
                probe = key if salt < 0 else "%s\x00%d" % (key, salt)
                h = _hashlib.blake2b(probe.encode("utf-8"), digest_size=4)
                bg = "#%06X" % (int.from_bytes(h.digest(), "big") & 0xFFFFFF)
                if bg not in taken:
                    break
                salt += 1
        self[key] = (fg, bg, idx)
        return self[key]


def entity_colors_from_html(html: str) -> EntityColors:
    """Reference EntityColors.from_htmlbytes: recover the color map
    from <wa-color> legend elements."""
    colors = EntityColors()
    for el in _iter_dfs(parse_html(html)):
        if el.tag == "wa-color":
            idx = int(el.attrs["id"][len("WA-color-"):])
            colors[el.attrs["type"]] = (
                el.attrs.get("fg", ""), el.attrs.get("bg", ""), idx,
            )
    return colors


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def markers_to_webannotator(
    text: str,
    entity_colors: Optional[EntityColors] = None,
    next_wa_id: int = 1,
):
    """Marker-bearing text → WebAnnotator 'save format' HTML fragment.

    Returns ``(html, entity_colors, next_wa_id)`` so a caller can
    thread a shared color map / id counter across turns of a document.
    Raises ValueError on a close marker that does not match the open
    type (encoder parity); an unclosed entity closes at text end.
    """
    colors = entity_colors if entity_colors is not None else EntityColors()
    out: List[str] = []
    open_type: Optional[str] = None
    pos = 0
    for m in _MARKER.finditer(text):
        chunk = _escape(text[pos : m.start()])
        pos = m.end()
        kind, value = m.group(1), m.group(2)
        if kind == "START":
            out.append(chunk)
            if open_type is not None:
                out.append("</span>")
            fg, bg, _idx = colors[value]
            out.append(
                '<span style="color: %s; background-color: %s;" '
                'wa-subtypes="" wa-id="%d" wa-type="%s" '
                'class="WebAnnotator_%s">' % (fg, bg, next_wa_id, value, value)
            )
            next_wa_id += 1
            open_type = value
        else:
            if value != (open_type or ""):
                raise ValueError(
                    "Invalid tag sequence: close tag %r doesn't match "
                    "open tag %r." % (value, open_type or "O")
                )
            out.append(chunk)
            out.append("</span>")
            open_type = None
    out.append(_escape(text[pos:]))
    if open_type is not None:
        out.append("</span>")
    return "".join(out), colors, next_wa_id


def wa_color_legend(colors: EntityColors) -> str:
    """<wa-color> legend elements (reference _add_wacolor_elements)."""
    return "".join(
        '<wa-color id="WA-color-%d" bg="%s" fg="%s" class="WebAnnotator_'
        'color_%s" type="%s"></wa-color>' % (idx, bg, fg, typ, typ)
        for typ, (fg, bg, idx) in sorted(
            colors.items(), key=lambda kv: kv[1][2]
        )
    )
