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

# The vocab table is DATA, mirroring the reference's published character
# sets (doctr/datasets/vocabs.py:11-155) in full: script component sets
# first, then the composed per-language vocabs. Character membership and
# ORDER are the behavioral contract (encode/decode index = position).
VOCABS: dict[str, str] = {
    # Arabic & Persian
    "arabic_diacritics": "ًٌٍَُِّْ",
    "arabic_digits": "٠١٢٣٤٥٦٧٨٩",
    "arabic_letters": "ءآأؤإئابةتثجحخدذرزسشصضطظعغـفقكلمنهوىي",
    "arabic_punctuation": "؟؛«»—",
    "persian_letters": "پچڢڤگ",
    # Bangla
    "bangla_digits": "০১২৩৪৫৬৭৮৯",
    "bangla_letters": "অআইঈউঊঋএঐওঔকখগঘঙচছজঝঞটঠডঢণতথদধনপফবভমযরলশষসহ়ঽািীুূৃেৈোৌ্ৎংঃঁ",
    # Cyrillic
    "generic_cyrillic_letters": "абвгдежзийклмнопрстуфхцчшщьюяАБВГДЕЖЗИЙКЛМНОПРСТУФХЦЧШЩЬЮЯ",
    "russian_cyrillic_letters": "ёыэЁЫЭ",
    "russian_signs": "ъЪ",
    # Greek
    "ancient_greek": "αβγδεζηθικλμνξοπρστυφχψωΑΒΓΔΕΖΗΘΙΚΛΜΝΞΟΠΡΣΤΥΦΧΨΩ",
    # Gujarati
    "gujarati_consonants": "ખગઘચછજઝઞટઠડઢણતથદધનપફબભમયરલવશસહળક્ષ",
    "gujarati_digits": "૦૧૨૩૪૫૬૭૮૯",
    "gujarati_punctuation": "૰ઽ◌ંઃ॥ૐ઼ઁ" + "૱",
    "gujarati_vowels": "અઆઇઈઉઊઋએઐઓ",
    # Hindi
    "hindi_digits": "०१२३४५६७८९",
    "hindi_letters": "अआइईउऊऋॠऌॡएऐओऔंःकखगघङचछजझञटठडढणतथदधनपफबभमयरलवशषसह",
    "hindi_punctuation": "।,?!:्ॐ॰॥",
    # Hebrew — combining marks and presentation forms are built from
    # explicit codepoints: literal strings of combining characters get
    # reordered/NFKD-folded by editors, silently corrupting the table
    "hebrew_cantillations": "".join(chr(c) for c in range(0x0591, 0x05B0)),
    "hebrew_letters": "אבגדהוזחטיךכלםמןנסעףפץצקרשת",
    "hebrew_specials": (
        "".join(chr(c) for c in range(0x05EF, 0x05F3))        # ׯ װ ױ ײ
        + "".join(chr(c) for c in range(0xFB1D, 0xFB37))      # yod-hiriq..telisha + ligatures
        + "".join(chr(c) for c in (0xFB38, 0xFB39, 0xFB3A, 0xFB3B, 0xFB3C, 0xFB3E))
        + "".join(chr(c) for c in (0xFB40, 0xFB41, 0xFB43, 0xFB44))
        + "".join(chr(c) for c in range(0xFB46, 0xFB50))
    ),
    # NB: U+05BC (dagesh) sits between the vowel and punctuation ranges
    # and is in NEITHER — faithful to the reference table, which also
    # omits the standalone point (precomposed dagesh letters are in
    # hebrew_specials). Same for U+25CC inside gujarati_punctuation above:
    # the reference ships the dotted-circle placeholder and so do we.
    "hebrew_punctuation": "".join(chr(c) for c in range(0x05BD, 0x05C7)) + "׳״",
    "hebrew_vowels": "".join(chr(c) for c in range(0x05B0, 0x05BC)) + chr(0x05C7),
    # Latin
    "digits": string.digits,
    "ascii_letters": string.ascii_letters,
    "punctuation": string.punctuation,
    "currency": "£€¥¢฿",
}

VOCABS["latin"] = VOCABS["digits"] + VOCABS["ascii_letters"] + VOCABS["punctuation"]
VOCABS["english"] = VOCABS["latin"] + "°" + VOCABS["currency"]

# Latin-family languages: english + the language's accent set (+ extras)
_LATIN_EXTENSIONS = {
    "czech": "áčďéěíňóřšťúůýžÁČĎÉĚÍŇÓŘŠŤÚŮÝŽ",
    "danish": "æøåÆØÅ",
    "dutch": "áéíóúüñÁÉÍÓÚÜÑ",
    "french": "àâéèêëîïôùûüçÀÂÉÈÊËÎÏÔÙÛÜÇ",
    "finnish": "äöÄÖ",
    "german": "äöüßÄÖÜẞ",
    "croatian": "ČčĆćĐđŠšŽž",
    "italian": "àèéìíîòóùúÀÈÉÌÍÎÒÓÙÚ",
    "norwegian": "æøåÆØÅ",
    "polish": "ąćęłńóśźżĄĆĘŁŃÓŚŹŻ",
    "portuguese": "áàâãéêíïóôõúüçÁÀÂÃÉÊÍÏÓÔÕÚÜÇ",
    "spanish": "áéíóúüñÁÉÍÓÚÜÑ" + "¡¿",
    "swedish": "åäöÅÄÖ",
    "vietnamese": (
        "áàảạãăắằẳẵặâấầẩẫậđéèẻẽẹêếềểễệóòỏõọôốồổộỗơớờởợỡúùủũụưứừửữựíìỉĩịýỳỷỹỵ"
        "ÁÀẢẠÃĂẮẰẲẴẶÂẤẦẨẪẬĐÉÈẺẼẸÊẾỀỂỄỆÓÒỎÕỌÔỐỒỔỘỖƠỚỜỞỢỠÚÙỦŨỤƯỨỪỬỮỰÍÌỈĨỊÝỲỶỸỴ"
    ),
}
for _lang, _ext in _LATIN_EXTENSIONS.items():
    VOCABS[_lang] = VOCABS["english"] + _ext
VOCABS["legacy_french"] = VOCABS["latin"] + "°" + "àâéèêëîïôùûçÀÂÉÈËÎÏÔÙÛÇ" + VOCABS["currency"]

# Non-latin compositions
VOCABS["hebrew"] = (
    VOCABS["english"] + VOCABS["hebrew_letters"] + VOCABS["hebrew_vowels"]
    + VOCABS["hebrew_punctuation"] + VOCABS["hebrew_cantillations"]
    + VOCABS["hebrew_specials"] + "₪"
)
VOCABS["arabic"] = (
    VOCABS["digits"] + VOCABS["arabic_digits"] + VOCABS["arabic_letters"]
    + VOCABS["persian_letters"] + VOCABS["arabic_diacritics"]
    + VOCABS["arabic_punctuation"] + VOCABS["punctuation"]
)
VOCABS["bangla"] = VOCABS["bangla_letters"] + VOCABS["bangla_digits"]
VOCABS["gujarati"] = (
    VOCABS["gujarati_vowels"] + VOCABS["gujarati_consonants"]
    + VOCABS["gujarati_digits"] + VOCABS["gujarati_punctuation"] + VOCABS["punctuation"]
)
VOCABS["hindi"] = VOCABS["hindi_letters"] + VOCABS["hindi_digits"] + VOCABS["hindi_punctuation"]
VOCABS["russian"] = (
    VOCABS["generic_cyrillic_letters"] + VOCABS["russian_cyrillic_letters"]
    + VOCABS["russian_signs"] + VOCABS["digits"] + VOCABS["punctuation"] + "₽"
)
VOCABS["ukrainian"] = (
    VOCABS["generic_cyrillic_letters"] + VOCABS["digits"] + VOCABS["punctuation"]
    + VOCABS["currency"] + "ґіїєҐІЇЄ₴"
)
VOCABS["multilingual"] = "".join(
    dict.fromkeys(
        "".join(
            VOCABS[lang]
            for lang in (
                "french", "portuguese", "spanish", "german", "czech", "croatian",
                "polish", "dutch", "italian", "norwegian", "danish", "finnish",
                "swedish",
            )
        )
        + "§"
    )
)

# charset of the deterministic 5x7 raster font (uppercase-only OCR path) —
# engine-specific, not in the reference table
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
