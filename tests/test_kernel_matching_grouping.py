# -*- coding: utf-8 -*-
"""Goldens for smart_join (/root/reference/webstruct/utils.py:61-75),
LongestMatch (utils.py:207-226) and grouping distances/threshold
selection (/root/reference/webstruct/grouping.py:158-160 and the
two-record address case from tests/test_crfsuite.py:133-161
re-expressed over flat token blocks)."""
from webstruct_spark.kernel.grouping import (
    best_clustering,
    block_positions,
    cluster_by_threshold,
    clustering_score,
    entities_with_positions,
    span_distances,
)
from webstruct_spark.kernel.matching import LongestMatcher
from webstruct_spark.kernel.smartjoin import smart_join


def test_smart_join():
    assert smart_join(["Hello", ",", "world", "!"]) == "Hello, world!"
    assert smart_join(["(", "303", ")", "444-7777"]) == "(303) 444-7777"


def test_longest_match_golden():
    known = {
        "North Las",
        "North Las Vegas",
        "North Pole",
        "Vegas USA",
        "Las Vegas",
        "USA",
        "Toronto",
    }
    lm = LongestMatcher(known)
    assert lm.max_length == 3
    tokens = ["Toronto", "to", "North", "Las", "Vegas", "USA"]
    assert lm.find_ranges(tokens) == [
        (0, 1, "Toronto"),
        (2, 5, "North Las Vegas"),
        (5, 6, "USA"),
    ]


def test_longest_match_dict_keys():
    lm = LongestMatcher({"North": "direction", "North Las Vegas": "location"})
    tokens = ["Toronto", "to", "North", "Las", "Vegas", "USA"]
    assert lm.find_ranges(tokens) == [(2, 5, "North Las Vegas")]


def test_span_distances_golden():
    assert span_distances([(0, 1), (5, 10), (11, 12)]) == [0, 4, 1]


def test_block_positions_first_token_zero():
    # single block of 3 tokens: parent/elem constant
    assert block_positions([1, 1, 1], [1, 1, 1]) == [0, 2, 4]
    # new turn = parent AND elem change => +3 extra
    assert block_positions([1, 1, 2, 2], [1, 1, 2, 2]) == [0, 2, 7, 9]


def _record(tel, fax, street_no):
    """One address record as (token, tag) pairs."""
    pairs = [
        (street_no, "B-STREET"),
        ("W.", "I-STREET"),
        ("Lovers", "I-STREET"),
        ("Lane", "I-STREET"),
        ("Dallas", "B-CITY"),
        ("TX", "B-STATE"),
        ("75206", "B-ZIPCODE"),
        ("Phone", "O"),
        (tel, "B-TEL"),
        ("Fax", "O"),
        (fax, "B-FAX"),
    ]
    return [p[0] for p in pairs], [p[1] for p in pairs]


def test_two_record_grouping_with_dont_penalize():
    """Transcript analog of the reference golden e2e: two address
    records, far apart, must split into exactly two groups with
    dont_penalize={'TEL','FAX'}."""
    toks1, tags1 = _record("214-351-2456", "214-904-1716", "4503")
    toks2, tags2 = _record("214-352-0031", "214-350-5302", "4515")
    filler = ["some", "unrelated", "chatter", "between", "offices"] * 4
    toks = toks1 + filler + toks2
    tags = tags1 + ["O"] * len(filler) + tags2
    # each record in its own block (turn); filler split across turns
    elems = (
        [0] * len(toks1)
        + [1] * (len(filler) // 2)
        + [2] * (len(filler) - len(filler) // 2)
        + [3] * len(toks2)
    )
    positions = block_positions(elems, elems)
    thr, score, clusters = best_clustering(
        toks, tags, positions, dont_penalize={"TEL", "FAX"}
    )
    texts = [
        [(" ".join(t), tag) for t, tag, _d in cluster] for cluster in clusters
    ]
    assert len(texts) == 2
    assert texts[0] == [
        ("4503 W. Lovers Lane", "STREET"),
        ("Dallas", "CITY"),
        ("TX", "STATE"),
        ("75206", "ZIPCODE"),
        ("214-351-2456", "TEL"),
        ("214-904-1716", "FAX"),
    ]
    assert texts[1][0] == ("4515 W. Lovers Lane", "STREET")
    assert len(texts[1]) == 6


def test_threshold_tie_goes_to_larger():
    """max() over descending thresholds keeps the largest on ties."""
    entities = [(["a"], "ORG"), (["b"], "PER"), (["c"], "CITY")]
    distances = [0, 4, 4]
    for thr in (4,):
        clusters = cluster_by_threshold(entities, distances, thr)
        assert len(clusters) == 1
    # scores equal for thresholds 4 (one cluster) — best_clustering
    # must return 4, not a smaller candidate
    toks = ["a", "x", "b", "y", "c"]
    tags = ["B-ORG", "O", "B-PER", "O", "B-CITY"]
    positions = [0, 2, 4, 6, 8]
    thr, _s, _c = best_clustering(toks, tags, positions)
    dists = span_distances([(0, 0), (4, 4), (8, 8)])
    assert thr == max(set(dists[1:]))


def test_clustering_score_penalizes_duplicates():
    cl_dup = [[(["a"], "TEL", 0), (["b"], "TEL", 1)]]
    cl_ok = [[(["a"], "TEL", 0), (["b"], "FAX", 1)]]
    assert clustering_score(cl_dup, 0) == -3
    assert clustering_score(cl_ok, 0) == 1
    assert clustering_score(cl_dup, 0, dont_penalize={"TEL"}) == 1


def test_entities_with_positions():
    toks = ["hi", "John", "Doe", "bye", "Acme"]
    tags = ["O", "B-PER", "I-PER", "O", "B-ORG"]
    pos = [0, 2, 4, 6, 8]
    ents, spans = entities_with_positions(toks, tags, pos)
    assert [(t, tag) for t, tag in ents] == [
        (["John", "Doe"], "PER"),
        (["Acme"], "ORG"),
    ]
    assert spans == [(2, 4), (8, 8)]


def test_substrings_reference_goldens():
    from webstruct_spark.kernel.utils import substrings

    assert substrings("abc", 1, 100) == ["a", "ab", "abc", "b", "bc", "c"]
    assert substrings("abc", 2, 100) == ["ab", "abc", "bc"]
    assert substrings("abc", 1, 2) == ["a", "ab", "b", "bc", "c"]
    assert substrings("abc", 1, 3, "$") == [
        "$a", "a", "$ab", "ab", "$abc", "abc", "abc$",
        "b", "bc", "bc$", "c", "c$",
    ]


def test_human_sorted():
    from webstruct_spark.kernel.utils import human_sorted

    assert human_sorted(["f10.html", "f2.html", "f1.html"]) == [
        "f1.html", "f2.html", "f10.html",
    ]
