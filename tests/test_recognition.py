"""Recognition kernel goldens: string merge (reference fixture values,
tests/common/test_models_recognition_utils.py:6-31), CTC decode, crop
splitting."""

import numpy as np
import pytest

from doctr_spark.functions.vocabs import FONT, decode_sequence, encode_string, translate
from doctr_spark.operators.recognition import (
    ctc_best_path,
    indices_to_logits,
    levenshtein,
    merge_multi_strings,
    merge_strings,
    remap_preds,
    split_crops,
    split_wide_crop,
)


def test_levenshtein():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "abd") == 1
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3


@pytest.mark.parametrize(
    ("a", "b", "expected"),
    [
        ("abc", "def", "abcdef"),
        ("abcd", "def", "abcdef"),
        ("abcde", "def", "abcdef"),
        ("abcdef", "def", "abcdef"),
        ("abcccc", "cccccc", "abcccccccc"),
        ("abc", "", "abc"),
        ("", "abc", "abc"),
        ("", "", ""),
    ],
)
def test_merge_strings(a, b, expected):
    assert merge_strings(a, b, 1.4) == expected


@pytest.mark.parametrize(
    ("seqs", "expected"),
    [
        (["abcd", "def", "efgh", "ijk"], "abcdefghijk"),
        (["abcdi", "defk", "efghi", "aijk"], "abcdefghijk"),
    ],
)
def test_merge_multi_strings(seqs, expected):
    assert merge_multi_strings(seqs, 1.4) == expected


def test_ctc_best_path_basic():
    vocab = "AB"
    blank = 2
    # path: A A blank B B -> "AB"
    T, V = 5, 3
    logits = np.full((T, V), -5.0)
    for t, k in enumerate([0, 0, blank, 1, 1]):
        logits[t, k] = 5.0
    [(word, conf)] = ctc_best_path(logits, vocab)
    assert word == "AB"
    assert 0.0 < conf <= 1.0


def test_ctc_collapse_and_blank():
    vocab = "HELO"
    blank = 4
    # H H E blank L L blank L O -> "HELLO"
    seq = [0, 0, 1, blank, 2, 2, blank, 2, 3]
    logits = np.full((len(seq), 5), 0.0)
    for t, k in enumerate(seq):
        logits[t, k] = 8.0
    [(word, _)] = ctc_best_path(logits, vocab)
    assert word == "HELLO"


def test_ctc_all_blank():
    vocab = "AB"
    logits = np.zeros((4, 3))
    logits[:, 2] = 9.0
    [(word, conf)] = ctc_best_path(logits, vocab)
    assert word == ""


def test_ctc_confidence_is_min_of_max_softmax():
    vocab = "A"
    logits = np.array([[5.0, 0.0], [1.0, 0.0]])  # second step less confident
    [(word, conf)] = ctc_best_path(logits, vocab)
    e = np.exp
    expected = float(e(1) / (e(1) + e(0)))
    assert word == "A"
    assert abs(conf - expected) < 1e-12


def test_indices_to_logits_roundtrip():
    s = "HELLO, WORLD! 42"
    s2 = "".join(c for c in s if c in FONT)  # drop the space
    idxs = encode_string(s2, FONT)
    [(word, conf)] = ctc_best_path(indices_to_logits(idxs), FONT)
    assert word == s2
    # repeated chars must survive the blank interleave
    idxs2 = encode_string("AAA", FONT)
    [(w2, _)] = ctc_best_path(indices_to_logits(idxs2), FONT)
    assert w2 == "AAA"


def test_split_wide_crop():
    assert split_wide_crop(100, 20) is None  # AR 5 <= 8
    ranges = split_wide_crop(200, 20)  # AR 10 -> 1 subcrop? n = int(10//6) = 1
    assert ranges is not None
    crop = np.zeros((10, 200))
    new, cmap, remap = split_crops([crop])
    assert remap
    assert isinstance(cmap[0], tuple)


def test_split_and_remap_roundtrip():
    preds = [("abcd", 0.9), ("cdef", 0.8)]
    out = remap_preds(preds, [(0, 2)], 1.4)
    assert out == [("abcdef", 0.8)]
    out2 = remap_preds([("xyz", 0.5)], [0], 1.4)
    assert out2 == [("xyz", 0.5)]


def test_vocab_roundtrip():
    s = "HELLO123!"
    assert decode_sequence(encode_string(s, FONT), FONT) == s


def test_translate():
    assert translate("héllo wörld", "latin") == "helloworld"
    assert translate("ab cd", "latin") == "abcd"
    assert translate("ab\xa0cd", "latin") == "ab■cd"  # NBSP is not str.whitespace
    assert translate("a☃b", "latin") == "a■b"


def test_vocab_table_breadth():
    """The full reference vocab table (datasets/vocabs.py:11-155) ships as
    data: spot-check sizes, composition identities, and ordering (encode
    index = position)."""
    import string

    from doctr_spark.functions.vocabs import VOCABS, encode_string

    # component + composed entries all present
    for name in (
        "arabic", "bangla", "gujarati", "hindi", "hebrew", "russian",
        "ukrainian", "czech", "danish", "dutch", "finnish", "croatian",
        "norwegian", "polish", "swedish", "vietnamese", "multilingual",
        "ancient_greek",
    ):
        assert name in VOCABS and len(VOCABS[name]) > 0
    assert len(VOCABS) >= 53
    # composition identities
    assert VOCABS["latin"] == string.digits + string.ascii_letters + string.punctuation
    assert VOCABS["english"] == VOCABS["latin"] + "°" + "£€¥¢฿"
    assert VOCABS["french"].startswith(VOCABS["english"])
    assert VOCABS["russian"].endswith("₽") and VOCABS["ukrainian"].endswith("₴")
    # hebrew composes all five component sets
    for part in ("hebrew_letters", "hebrew_vowels", "hebrew_punctuation",
                 "hebrew_cantillations", "hebrew_specials"):
        assert VOCABS[part] in VOCABS["hebrew"]
    # multilingual is deduplicated and ends with the section sign
    assert len(set(VOCABS["multilingual"])) == len(VOCABS["multilingual"])
    assert VOCABS["multilingual"].endswith("§")
    # ordering contract: digit '5' encodes to index 5 in every digit-prefixed vocab
    assert encode_string("5", VOCABS["latin"]) == [5]
    assert encode_string("५", VOCABS["hindi"])[0] == len(VOCABS["hindi_letters"]) + 5
