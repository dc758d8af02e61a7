# -*- coding: utf-8 -*-
"""Kernel tests: dedup sketches and Viterbi tagging."""
import numpy as np

from webstruct_spark.kernel.dedup import (
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    simhash64,
    simhash_band_keys,
    word_shingles,
)
from webstruct_spark.kernel.viterbi import (
    RuleModel,
    build_tagset,
    iob2_transitions,
    merge_top_n,
    viterbi_decode,
)


def test_shingles_and_jaccard():
    a = word_shingles("the quick brown fox jumps")
    b = word_shingles("the quick brown fox leaps")
    assert "the quick brown" in a
    assert 0 < jaccard(a, b) < 1
    assert jaccard(a, a) == 1.0
    assert jaccard(set(), set()) == 1.0
    assert jaccard(a, set()) == 0.0


def test_minhash_similar_docs_share_bands():
    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    t2 = t1 + "lambda"
    s1 = minhash_signature(word_shingles(t1))
    s2 = minhash_signature(word_shingles(t2))
    assert len(s1) == 64
    # high jaccard -> most signature slots agree
    agree = sum(1 for a, b in zip(s1, s2) if a == b)
    assert agree > 40
    b1, b2 = set(lsh_band_keys(s1)), set(lsh_band_keys(s2))
    assert b1 & b2  # at least one shared band -> candidate pair
    # dissimilar docs share nothing
    s3 = minhash_signature(word_shingles("totally different words here now"))
    assert not (set(lsh_band_keys(s3)) & b1)


def test_minhash_deterministic():
    s = minhash_signature(word_shingles("stable input text"))
    assert s == minhash_signature(word_shingles("stable input text"))


def test_simhash_hamming():
    t1 = "one two three four five six seven eight nine ten " * 4
    t2 = t1 + "eleven"
    h1, h2 = simhash64(t1), simhash64(t2)
    assert hamming64(h1, h1) == 0
    assert hamming64(h1, h2) <= 6
    h3 = simhash64("completely unrelated content with other tokens")
    assert hamming64(h1, h3) > 10
    # pigeonhole: hamming<4 docs share a 16-bit band
    if hamming64(h1, h2) < 4:
        assert set(simhash_band_keys(h1)) & set(simhash_band_keys(h2))


def test_viterbi_forbids_dangling_i():
    tags = build_tagset(["PER"])
    trans = iob2_transitions(tags)
    # emissions scream I-PER at position 0; decode must not start with it
    em = np.full((3, len(tags)), 0.0)
    em[0, tags.index("I-PER")] = 10.0
    em[1, tags.index("I-PER")] = 10.0
    path = viterbi_decode(em, trans)
    decoded = [tags[i] for i in path]
    assert decoded[0] != "I-PER"


def test_rule_model_tags_gazetteer_and_shapes():
    model = RuleModel(
        {"Acme Corp": "ORG", "Dallas": "CITY", "TX": "STATE"},
        ("ORG", "PER", "CITY", "STATE", "ZIPCODE", "COUNTRY",
         "STREET", "TEL", "FAX", "EMAIL"),
    )
    toks = ["Contact", "Acme", "Corp", "in", "Dallas", "TX", "75206",
            "Phone:", "214-351-2456", "Email:", "ada@acme.com"]
    tags = model.predict(toks)
    assert tags[1] == "B-ORG" and tags[2] == "I-ORG"
    assert tags[4] == "B-CITY"
    assert tags[5] == "B-STATE"
    assert tags[6] == "B-ZIPCODE"
    assert tags[8] == "B-TEL"
    assert tags[10] == "B-EMAIL"
    # fax context flips TEL->FAX
    tags2 = model.predict(["Fax:", "214-351-2456"])
    assert tags2[1] == "B-FAX"


def test_merge_top_n_overlay():
    # chain1 has PER at 0-1; chain2 adds ORG at 3 in an O slot and a
    # conflicting PER at 1 that must NOT overwrite
    c1 = ["B-PER", "I-PER", "O", "O"]
    c2 = ["O", "B-PER", "O", "B-ORG"]
    assert merge_top_n([c1, c2]) == ["B-PER", "I-PER", "O", "B-ORG"]
    assert merge_top_n([]) == []
