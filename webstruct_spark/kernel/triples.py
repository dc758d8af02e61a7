# -*- coding: utf-8 -*-
"""Triple assembly from entity groups — the KG-graft analog of the
reference's record assembly (``extract_entitiy_groups``,
/root/reference/webstruct/model.py:139-160).

The rule is deterministic and shared verbatim by the single-node gold
builder and the Spark operator, so the two must agree bit-for-bit:

* subject = the first entity in the group whose type appears earliest
  in ``SUBJECT_PRIORITY`` (falling back to the group's first entity),
* one triple per OTHER entity in the group:
  ``(subj_text, 'has_' + lower(member_type), member_text)``,
* group order and within-group entity order follow document order, so
  triple output order is deterministic under stable
  (conv_id, turn_idx) input ordering.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

SUBJECT_PRIORITY = ("ORG", "PER", "STREET")

Entity = Tuple[str, str]  # (text, type)
Triple = Tuple[str, str, str]  # (subj, pred, obj)


def subject_index(entities: Sequence[Entity]) -> int:
    for wanted in SUBJECT_PRIORITY:
        for i, (_text, etype) in enumerate(entities):
            if etype == wanted:
                return i
    return 0


def assemble_triples_typed(
    entities: Sequence[Entity],
) -> List[Tuple[str, str, str, str, str]]:
    """(subj, pred, obj, subj_type, obj_type) per triple."""
    if len(entities) < 2:
        return []
    si = subject_index(entities)
    subj, subj_type = entities[si]
    out: List[Tuple[str, str, str, str, str]] = []
    for i, (text, etype) in enumerate(entities):
        if i == si:
            continue
        out.append((subj, "has_" + etype.lower(), text, subj_type, etype))
    return out


def assemble_triples(entities: Sequence[Entity]) -> List[Triple]:
    """Triples for one entity group (possibly empty for singleton
    groups)."""
    return [(s, p, o) for s, p, o, _st, _ot in assemble_triples_typed(entities)]
