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


def test_eos_decode_vitstr_and_sar_semantics():
    """The parallel (non-CTC) postprocessor family, reference semantics:
    ViTSTR conf = mean max-softmax over the first len(word) positions
    (vitstr/pytorch.py:155-180); SAR conf = min max-softmax over ALL
    positions including <eos>/padding (sar/pytorch.py:309-333)."""
    from doctr_spark.functions.vocabs import FONT
    from doctr_spark.operators.recognition import eos_decode, softmax

    v = len(FONT)
    L = 6
    logits = np.zeros((L, v + 2))
    a, b = FONT.index("A"), FONT.index("B")
    logits[0, a] = 9.0
    logits[1, b] = 5.0  # weaker second char -> lower per-position prob
    logits[2:, v] = 9.0  # <eos> + padding
    (w_mean, c_mean), = eos_decode(logits, FONT, conf="mean")
    (w_min, c_min), = eos_decode(logits, FONT, conf="min")
    assert w_mean == w_min == "AB"
    sm = softmax(logits[None], axis=-1).max(axis=-1)[0]
    assert np.isclose(c_mean, sm[:2].mean())  # word-length slice only
    assert np.isclose(c_min, sm.min())  # all positions, incl. eos/pad
    assert c_min < c_mean  # the weak 'B' position drags the min below the mean


def test_eos_decode_empty_word_and_sos_render():
    from doctr_spark.functions.vocabs import FONT
    from doctr_spark.operators.recognition import eos_decode

    v = len(FONT)
    # eos at position 0 -> empty word; ViTSTR pins conf to 0.0
    logits = np.zeros((3, v + 2))
    logits[:, v] = 9.0
    assert eos_decode(logits, FONT, conf="mean") == [("", 0.0)]
    # a predicted <sos> before eos renders as the literal token string,
    # exactly like the reference's embedding join
    logits2 = np.zeros((3, v + 2))
    logits2[0, FONT.index("A")] = 9.0
    logits2[1, v + 1] = 9.0  # <sos>
    logits2[2, v] = 9.0
    (w, _), = eos_decode(logits2, FONT, conf="mean")
    assert w == "A<sos>"


def test_indices_to_eos_logits_roundtrip_every_char():
    from doctr_spark.functions.vocabs import FONT, encode_string
    from doctr_spark.operators.recognition import eos_decode, indices_to_eos_logits

    for word in ("A", "KILO", "A+B=C", "100%", FONT[:20]):
        got_mean = eos_decode(indices_to_eos_logits(encode_string(word, FONT)), FONT, "mean")
        got_min = eos_decode(indices_to_eos_logits(encode_string(word, FONT)), FONT, "min")
        assert got_mean[0][0] == word
        assert got_min[0][0] == word
        assert got_mean[0][1] > 0.99 and got_min[0][1] > 0.99

    with pytest.raises(ValueError, match="max_length"):
        indices_to_eos_logits(list(range(40)), FONT, max_length=32)


def test_parallel_recognizers_through_the_seam(spark):
    """extract_turns per-turn equality through BOTH non-CTC recognizer
    variants (ViTSTR-mean and SAR-min postprocessors)."""
    from pyspark.sql import functions as F

    from doctr_spark.plans.models import SAR_RECOGNIZER, VITSTR_RECOGNIZER
    from doctr_spark.plans.pipeline import extract_turns
    from doctr_spark.sources.corpus import make_transcripts

    gen = make_transcripts(spark, 2, partitions=2, ocr_ratio=1.0, html_ratio=0.0)
    inp = gen.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    exp = gen.select("conv_id", "turn_idx", "expected_text")
    for rec in (VITSTR_RECOGNIZER, SAR_RECOGNIZER):
        m = extract_turns(inp, recognizer=rec).join(exp, ["conv_id", "turn_idx"])
        n_total = m.count()
        n_exact = m.filter(F.col("extracted_text") == F.col("expected_text")).count()
        assert n_total > 0 and n_exact == n_total, rec[0]


def test_ctc_best_path_custom_blank_index():
    """VIPTR-style parameterized blank: a non-default blank index is
    filtered from the collapsed path with class indices mapping straight
    into vocab (reference viptr/pytorch.py:50-76)."""
    from doctr_spark.functions.vocabs import FONT
    from doctr_spark.operators.recognition import ctc_best_path

    v = len(FONT)
    c, d = FONT.index("C"), FONT.index("D")
    # chars with nonzero indices so blank=0 never collides with a real class
    assert c != 0 and d != 0
    T = 5
    logits = np.full((T, v + 1), -5.0)
    for t, k in enumerate([0, c, c, 0, d]):
        logits[t, k] = 5.0
    (w0, _), = ctc_best_path(logits, FONT, blank=0)
    assert w0 == "CD"
    # default blank (len(vocab)) treats index 0 as a real class
    logits2 = np.full((3, v + 1), -5.0)
    for t, k in enumerate([0, v, c]):
        logits2[t, k] = 5.0
    (w1, _), = ctc_best_path(logits2, FONT)
    assert w1 == FONT[0] + "C"
