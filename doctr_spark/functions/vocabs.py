"""Character vocabularies + encode/decode/translate kernels.

Semantics mirror the reference's vocab layer (doctr/datasets/vocabs.py:43-104
and doctr/datasets/utils.py:35-170): a vocab is an ordered character string;
``encode`` maps chars to indices, ``decode`` indices to chars, ``translate``
projects an arbitrary string into a vocab (NFD-normalize to ascii, drop
whitespace, unknown -> '■').

``FONT`` is the charset of our deterministic raster font (sources/font.py);
it is the working vocab of the synthetic OCR path.
"""

from __future__ import annotations

import string
import unicodedata
from collections.abc import Sequence

import numpy as np

UNKNOWN_CHAR = "■"

VOCABS: dict[str, str] = {
    "digits": string.digits,
    "ascii_letters": string.ascii_letters,
    "punctuation": string.punctuation,
    "currency": "£€¥¢฿",
}
VOCABS["latin"] = VOCABS["digits"] + VOCABS["ascii_letters"] + VOCABS["punctuation"]
VOCABS["english"] = VOCABS["latin"] + "°" + VOCABS["currency"]
# latin-family extensions (accent sets as in the reference vocab table)
VOCABS["french"] = VOCABS["english"] + "àâéèêëîïôùûüçÀÂÉÈÊËÎÏÔÙÛÜÇ"
VOCABS["german"] = VOCABS["english"] + "äöüßÄÖÜẞ"
VOCABS["spanish"] = VOCABS["english"] + "áéíóúüñÁÉÍÓÚÜÑ" + "¡¿"
VOCABS["italian"] = VOCABS["english"] + "àèéìíîòóùúÀÈÉÌÍÎÒÓÙÚ"
VOCABS["portuguese"] = VOCABS["english"] + "áàâãéêíïóôõúüçÁÀÂÃÉÊÍÏÓÔÕÚÜÇ"
VOCABS["legacy_french"] = VOCABS["latin"] + "°" + "àâéèêëîïôùûçÀÂÉÈËÎÏÔÙÛÇ" + VOCABS["currency"]
# charset of the deterministic 5x7 raster font (uppercase-only OCR path)
VOCABS["font"] = string.ascii_uppercase + string.digits + "!?.,:;'\"()-+=/%$#@&*<>[]_"

FONT = VOCABS["font"]


def translate(input_string: str, vocab_name: str, unknown_char: str = UNKNOWN_CHAR) -> str:
    """Project a string into a vocab: drop whitespace, NFD-fold accents to
    ascii, replace anything else with ``unknown_char``.
    (reference semantics: doctr/datasets/utils.py:35-66)
    """
    vocab = VOCABS.get(vocab_name)
    if vocab is None:
        raise KeyError(f"unknown vocab {vocab_name!r}")
    out = []
    for ch in input_string:
        if ch in vocab:
            out.append(ch)
            continue
        if ch in string.whitespace:
            continue
        folded = unicodedata.normalize("NFD", ch).encode("ascii", "ignore").decode("ascii")
        out.append(folded if folded and folded in vocab else unknown_char)
    return "".join(out)


def encode_string(input_string: str, vocab: str) -> list[int]:
    """Char -> vocab index list; raises on out-of-vocab chars.
    (reference semantics: doctr/datasets/utils.py:69-93)
    """
    missing = {c for c in input_string if c not in vocab}
    if missing:
        raise ValueError(f"characters {missing} not in vocab")
    return [vocab.index(c) for c in input_string]


def decode_sequence(input_seq: Sequence[int] | np.ndarray, mapping: str) -> str:
    """Vocab index sequence -> string. (doctr/datasets/utils.py:96-117)"""
    arr = np.asarray(input_seq, dtype=np.int64)
    if arr.size and arr.max() >= len(mapping):
        raise ValueError("index out of vocab range")
    return "".join(mapping[i] for i in arr.tolist())


def font_normalize(text: str) -> str:
    """Project text into the raster-font charset: uppercase, fold accents,
    keep font chars, collapse whitespace runs to single spaces. This is the
    generator-side ground-truth transform for OCR payload turns.
    """
    folded = unicodedata.normalize("NFD", text.upper()).encode("ascii", "ignore").decode("ascii")
    words = []
    for raw_word in folded.split():
        kept = "".join(c for c in raw_word if c in FONT)
        if kept:
            words.append(kept)
    return " ".join(words)
