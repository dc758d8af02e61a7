# -*- coding: utf-8 -*-
"""The fused single-pass extraction must match the two-pass
encode→decode composition on adversarial marker streams, including the
exception messages for malformed close markers."""
import random

from webstruct_spark.operators.extract import (
    _extract_turn_entities_twopass,
    extract_turn_entities,
)


def test_fused_equals_twopass_fuzz():
    rng = random.Random(7)
    types_ = ["PER", "ORG", "CITY", "TEL"]
    words = [
        "alpha", "Beta", "214-351-2456", "w.", "x", "don't", "a,b",
        "...", "--", "__STARTFOO__", "Email:", '"quoted"',
    ]
    for _trial in range(3000):
        parts = []
        open_t = None
        for _ in range(rng.randint(0, 14)):
            r = rng.random()
            if r < 0.18 and open_t is None:
                open_t = rng.choice(types_)
                parts.append("__START_%s__" % open_t)
            elif r < 0.3 and open_t is not None:
                if rng.random() < 0.25:  # adjacent START
                    open_t = rng.choice(types_)
                    parts.append("__START_%s__" % open_t)
                else:
                    parts.append("__END_%s__" % open_t)
                    open_t = None
            else:
                parts.append(rng.choice(words))
        text = " ".join(parts)
        try:
            a, ea = _extract_turn_entities_twopass(text), None
        except ValueError as e:
            a, ea = None, str(e)
        try:
            b, eb = extract_turn_entities(text), None
        except ValueError as e:
            b, eb = None, str(e)
        assert a == b and ea == eb, (text, a, ea, b, eb)


def test_fused_mismatched_close_message_matches_reference_format():
    try:
        extract_turn_entities("__START_PER__ John __END_ORG__")
        assert False
    except ValueError as e:
        assert "close tag 'ORG' doesn't match open tag 'I-PER'" in str(e)
