"""General language identification: character n-gram profiles +
Unicode-script routing.

The reference wraps langdetect (``models/_utils.py:156-172``), which is
absent from this sandbox; the round-2 stand-in was a handful of marker
words (functions/text.py — kept, it has an exact SQL twin and serves the
documents-table oracle). This module is the general-text upgrade: the
classic Cavnar-Trenkle "N-Gram-Based Text Categorization" (1994)
rank-order classifier over 1-3 char-gram profiles, with the training
profiles built at import from small embedded per-language samples (the
profiles ARE the committed model weights, like models_data/ for the
conv nets). Non-Latin scripts short-circuit on Unicode block ratios
(hiragana/katakana -> ja before the shared CJK ideographs -> zh, hangul
-> ko, Cyrillic -> ru, Arabic -> ar, Hebrew -> he, Greek -> el) — block
membership is a stronger signal than any n-gram statistic.

Scale shape: classification is a pure per-row function executed as one
Arrow-batched pandas UDF (a metadata-rate op, not the hot extraction
path); profiles are tiny dicts closed over by the UDF, shipped once per
worker. Accuracy bound stated honestly: ~10 Latin-script European
languages + 6 script families, trained on ~300-char samples — suitable
for corpus bucketing, not ISO-complete coverage.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

PROFILE_SIZE = 300
MIN_LETTERS = 20  # short-text gate (reference get_language gates short input)

# Embedded training samples: everyday prose, one small paragraph each.
_TRAIN: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog. this is a simple "
        "sentence written in plain english. we are going to the market "
        "tomorrow morning because the weather should be good. children "
        "play in the park while their parents watch from the benches. i "
        "would like a cup of tea with milk and a little sugar, please."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund. dies ist "
        "ein einfacher satz in deutscher sprache. wir gehen morgen früh "
        "auf den markt, weil das wetter gut werden soll. die kinder "
        "spielen im park, während ihre eltern von den bänken aus "
        "zuschauen. ich hätte gern eine tasse tee mit milch und etwas "
        "zucker, bitte."
    ),
    "fr": (
        "le rapide renard brun saute par-dessus le chien paresseux. ceci "
        "est une phrase simple écrite en français. nous irons au marché "
        "demain matin parce que le temps devrait être beau. les enfants "
        "jouent dans le parc pendant que leurs parents regardent depuis "
        "les bancs. je voudrais une tasse de thé avec du lait et un peu "
        "de sucre, s'il vous plaît."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso. esta es "
        "una frase sencilla escrita en español. iremos al mercado mañana "
        "por la mañana porque el tiempo debería ser bueno. los niños "
        "juegan en el parque mientras sus padres miran desde los bancos. "
        "quisiera una taza de té con leche y un poco de azúcar, por favor."
    ),
    "it": (
        "la veloce volpe marrone salta sopra il cane pigro. questa è una "
        "frase semplice scritta in italiano. andremo al mercato domani "
        "mattina perché il tempo dovrebbe essere bello. i bambini giocano "
        "nel parco mentre i loro genitori guardano dalle panchine. vorrei "
        "una tazza di tè con latte e un po' di zucchero, per favore."
    ),
    "pt": (
        "a rápida raposa marrom salta sobre o cão preguiçoso. esta é uma "
        "frase simples escrita em português. vamos ao mercado amanhã de "
        "manhã porque o tempo deve estar bom. as crianças brincam no "
        "parque enquanto os pais observam dos bancos. eu gostaria de uma "
        "xícara de chá com leite e um pouco de açúcar, por favor."
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond. dit is een "
        "eenvoudige zin geschreven in het nederlands. we gaan "
        "morgenochtend naar de markt omdat het weer goed zou moeten zijn. "
        "de kinderen spelen in het park terwijl hun ouders vanaf de "
        "bankjes toekijken. ik wil graag een kopje thee met melk en een "
        "beetje suiker, alstublieft."
    ),
    "sv": (
        "den snabba bruna räven hoppar över den lata hunden. detta är en "
        "enkel mening skriven på svenska. vi går till marknaden i morgon "
        "bitti eftersom vädret borde bli bra. barnen leker i parken medan "
        "deras föräldrar tittar på från bänkarna. jag skulle vilja ha en "
        "kopp te med mjölk och lite socker, tack."
    ),
    "pl": (
        "szybki brązowy lis przeskakuje nad leniwym psem. to jest proste "
        "zdanie napisane po polsku. jutro rano pójdziemy na targ, "
        "ponieważ pogoda powinna być dobra. dzieci bawią się w parku, "
        "podczas gdy ich rodzice patrzą z ławek. poproszę filiżankę "
        "herbaty z mlekiem i odrobiną cukru."
    ),
    "tr": (
        "hızlı kahverengi tilki tembel köpeğin üzerinden atlar. bu türkçe "
        "yazılmış basit bir cümledir. hava güzel olacağı için yarın sabah "
        "pazara gideceğiz. çocuklar parkta oynarken anne babaları "
        "banklardan izliyor. süt ve biraz şeker ile bir fincan çay "
        "istiyorum lütfen."
    ),
}

# (lang, lo, hi) checked in order — kana before the shared CJK block
_SCRIPTS: list[tuple[str, int, int]] = [
    ("ja", 0x3040, 0x30FF),  # hiragana + katakana
    ("ko", 0xAC00, 0xD7AF),  # hangul syllables
    ("zh", 0x4E00, 0x9FFF),  # CJK unified ideographs
    ("ru", 0x0400, 0x04FF),  # cyrillic
    ("ar", 0x0600, 0x06FF),  # arabic
    ("he", 0x0590, 0x05FF),  # hebrew
    ("el", 0x0370, 0x03FF),  # greek
]


def _grams(text: str) -> list[str]:
    """1-3 char-grams over space-padded lowercase words (letters only)."""
    words = "".join(ch if ch.isalpha() else " " for ch in text.lower()).split()
    out: list[str] = []
    for w in words:
        padded = f" {w} "
        for n in (1, 2, 3):
            out.extend(padded[i : i + n] for i in range(len(padded) - n + 1))
    return out

def _profile(text: str) -> dict[str, int]:
    """gram -> rank (0 = most frequent), top PROFILE_SIZE; ties break by
    gram codepoint order so the profile is deterministic."""
    counts: dict[str, int] = {}
    for g in _grams(text):
        counts[g] = counts.get(g, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:PROFILE_SIZE]
    return {g: r for r, (g, _) in enumerate(ranked)}


_PROFILES: dict[str, dict[str, int]] | None = None


def profiles() -> dict[str, dict[str, int]]:
    global _PROFILES
    if _PROFILES is None:
        _PROFILES = {lang: _profile(sample) for lang, sample in _TRAIN.items()}
    return _PROFILES


def classify_text(text: str) -> tuple[str, float]:
    """(language, confidence) for one string — 'unknown' below the
    short-text gate. Script blocks first; else rank-order distance to
    each profile, confidence = relative margin to the runner-up."""
    if not text:
        return ("unknown", 0.0)
    letters = [ch for ch in text if ch.isalpha()]
    n_letters = len(letters)
    # script routing BEFORE the length gate: a Unicode block ratio is
    # reliable on much shorter text than n-gram statistics (ideographic
    # scripts convey more per character)
    if n_letters >= 4:
        for lang, lo, hi in _SCRIPTS:
            in_block = sum(1 for ch in letters if lo <= ord(ch) <= hi)
            if in_block / n_letters >= 0.3:
                return (lang, round(in_block / n_letters, 6))
    if n_letters < MIN_LETTERS:
        return ("unknown", 0.0)
    text_ranks = _profile(text)
    max_pen = PROFILE_SIZE
    dists: list[tuple[float, str]] = []
    for lang, prof in profiles().items():
        d = sum(abs(r - prof.get(g, max_pen)) if g in prof else max_pen
                for g, r in text_ranks.items())
        dists.append((d / max(1, len(text_ranks)), lang))
    dists.sort()
    (d1, lang1), (d2, _) = dists[0], dists[1]
    conf = round((d2 - d1) / max(d2, 1e-9), 6)
    return (lang1, conf)


def lang_id_ngram(col: Column) -> Column:
    """struct<lang, conf> column: the general n-gram/script language ID,
    Arrow-batched (one Python pass per record batch)."""

    @F.pandas_udf("struct<lang: string, conf: double>")
    def run(s: pd.Series) -> pd.DataFrame:
        results = [classify_text(t if isinstance(t, str) else "") for t in s]
        return pd.DataFrame(
            {"lang": [r[0] for r in results], "conf": [r[1] for r in results]}
        )

    return run(col)
