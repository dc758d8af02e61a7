# -*- coding: utf-8 -*-
"""Tokenizer golden tests — the reference WordTokenizer doctest corpus
verbatim (/root/reference/webstruct/text_tokenizers.py:13-124), exact
(chars, position, length) triples included."""
from webstruct_spark.kernel.tokenize import (
    default_segment_words,
    segment_words,
    tokenize_batch,
)


def chars(toks):
    return [t[0] for t in toks]


def test_muffins():
    s = "Good muffins cost $3.88\nin New York. Email: muffins@gmail.com"
    assert segment_words(s) == [
        ("Good", 0, 4),
        ("muffins", 5, 7),
        ("cost", 13, 4),
        ("$", 18, 1),
        ("3.88", 19, 4),
        ("in", 24, 2),
        ("New", 27, 3),
        ("York.", 31, 5),
        ("Email:", 37, 6),
        ("muffins@gmail.com", 44, 17),
    ]


def test_comma_before_nondigit_splits():
    assert segment_words("Shelbourne Road,") == [
        ("Shelbourne", 0, 10),
        ("Road", 11, 4),
        (",", 15, 1),
    ]


def test_comma_inside_number_kept():
    assert segment_words("population of 100,000") == [
        ("population", 0, 10),
        ("of", 11, 2),
        ("100,000", 14, 7),
    ]


def test_pipe_splits():
    assert segment_words("Hello|World") == [
        ("Hello", 0, 5),
        ("|", 5, 1),
        ("World", 6, 5),
    ]


def test_quotes_sentence():
    s2 = '"We beat some pretty good teams to get here," Slocum said.'
    assert segment_words(s2) == [
        ("``", 0, 1),
        ("We", 1, 2),
        ("beat", 4, 4),
        ("some", 9, 4),
        ("pretty", 14, 6),
        ("good", 21, 4),
        ("teams", 26, 5),
        ("to", 32, 2),
        ("get", 35, 3),
        ("here", 39, 4),
        (",", 43, 1),
        ("''", 44, 1),
        ("Slocum", 46, 6),
        ("said", 53, 4),
        (".", 57, 1),
    ]


def test_multiline_contractions_brackets():
    s3 = (
        "Well, we couldn't have this predictable,\n"
        'cliche-ridden, "Touched by an\n'
        'Angel" (a show creator John Masius\n'
        "worked on) wanna-be if she didn't."
    )
    assert segment_words(s3) == [
        ("Well", 0, 4),
        (",", 4, 1),
        ("we", 6, 2),
        ("couldn't", 9, 8),
        ("have", 18, 4),
        ("this", 23, 4),
        ("predictable", 28, 11),
        (",", 39, 1),
        ("cliche-ridden", 41, 13),
        (",", 54, 1),
        ("``", 56, 1),
        ("Touched", 57, 7),
        ("by", 65, 2),
        ("an", 68, 2),
        ("Angel", 71, 5),
        ("''", 76, 1),
        ("(", 78, 1),
        ("a", 79, 1),
        ("show", 81, 4),
        ("creator", 86, 7),
        ("John", 94, 4),
        ("Masius", 99, 6),
        ("worked", 106, 6),
        ("on", 113, 2),
        (")", 115, 1),
        ("wanna-be", 117, 8),
        ("if", 126, 2),
        ("she", 129, 3),
        ("didn't", 133, 6),
        (".", 139, 1),
    ]


def test_bare_quote_variants():
    assert segment_words('"') == [("``", 0, 1)]
    assert segment_words('" a') == [("``", 0, 1), ("a", 2, 1)]
    assert segment_words('["a') == [("[", 0, 1), ("``", 1, 1), ("a", 2, 1)]


def test_copyright_line():
    s = "Copyright © 2014 Foo Bar and Buzz Spam. All Rights Reserved."
    assert segment_words(s) == [
        ("Copyright", 0, 9),
        ("\xa9", 10, 1),
        ("2014", 12, 4),
        ("Foo", 17, 3),
        ("Bar", 21, 3),
        ("and", 25, 3),
        ("Buzz", 29, 4),
        ("Spam.", 34, 5),
        ("All", 40, 3),
        ("Rights", 44, 6),
        ("Reserved", 51, 8),
        (".", 59, 1),
    ]


def test_default_tokenizer_drops_standalone_comma_semicolon():
    toks = default_segment_words("a, b; c 1,000")
    assert chars(toks) == ["a", "b", "c", "1,000"]


def test_unicode_quotes_and_ellipsis():
    assert chars(segment_words("x“y”z")) == ["x", "``", "y", "''", "z"]
    assert chars(segment_words("wait… done...now")) == [
        "wait",
        "...",
        "done",
        "...",
        "now",
    ]


def test_double_dash_and_marker_tokens_survive():
    assert chars(segment_words("a--b")) == ["a", "--", "b"]
    assert chars(segment_words("__START_PER__ John __END_PER__")) == [
        "__START_PER__",
        "John",
        "__END_PER__",
    ]


def test_batch_matches_single():
    texts = ["Hello|World", "", "a, b"]
    batch = tokenize_batch(texts, drop_punct=False)
    assert batch == [segment_words(t) for t in texts]
    assert tokenize_batch([None]) == [[]]
