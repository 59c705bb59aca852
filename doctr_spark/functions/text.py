"""Text-analysis column builders for large-scale corpus pipelines:
token counting, quality scoring, language-ID heuristic, fingerprinting.

Every op here is expressed with built-in JVM-side column functions (no
Python in the hot path) and has an exactly-matching DuckDB SQL twin
(`*_SQL` strings) so the driver's oracle can verify values bit-for-bit.
Floats are rounded to 6 decimals on both sides before comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# language marker words for the n-gram/stopword heuristic language ID.
# Deliberately tiny and deterministic — the point is the distributed
# pattern (pure column math over 100 TB), not linguistic accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " los ", " una "],
    "zh": ["的", "是", "了"],
}


def token_count(col: Column) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(col), r"\s+"))
    )


TOKEN_COUNT_SQL = (
    "CASE WHEN length(trim({c})) = 0 THEN 0 "
    "ELSE len(regexp_split_to_array(trim({c}), '\\s+')) END"
)


def char_class_ratio(col: Column, keep_regex: str) -> Column:
    """Fraction of characters matching a class, 0.0 for empty strings."""
    return F.round(
        F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
            F.length(F.regexp_replace(col, keep_regex, "")) / F.length(col)
        ),
        6,
    )


def char_class_ratio_sql(c: str, keep_regex: str) -> str:
    # NOTE: DuckDB needs the 'g' flag to replace all occurrences
    return (
        f"round(CASE WHEN length({c}) = 0 THEN 0.0 "
        f"ELSE length(regexp_replace({c}, '{keep_regex}', '', 'g')) * 1.0 / length({c}) END, 6)"
    )


ALPHA_REGEX = "[^A-Za-z]"  # ratio of alphabetic chars: strip non-alpha, measure remainder
DIGIT_REGEX = "[^0-9]"
SPACE_REGEX = "[^ ]"


def marker_hits(col: Column, marker: str) -> Column:
    """Occurrences of a marker substring in ' '||lower(text)||' '."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    return (F.length(padded) - F.length(F.replace(padded, F.lit(marker)))) / len(marker)


def marker_hits_sql(c: str, marker: str) -> str:
    p = f"' ' || lower({c}) || ' '"
    esc = marker.replace("'", "''")
    return f"(length({p}) - length(replace({p}, '{esc}', ''))) / {len(marker)}"


def lang_scores(col: Column) -> dict[str, Column]:
    return {
        lang: sum((marker_hits(col, m) for m in markers), F.lit(0.0))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_scores_sql(c: str) -> dict[str, str]:
    return {
        lang: " + ".join(marker_hits_sql(c, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """argmax language by marker score; 'unknown' when all scores are 0.
    Ties break by the fixed language order. Linear-size expression:
    best = greatest(scores), then a first-match when-chain — a naive
    running-max fold doubles the tree per language (exponential codegen)."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    out = F.lit("unknown")
    for lang in reversed(LANG_MARKERS):  # first declared lang wins ties
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("unknown"))


def lang_id_conf(col: Column) -> tuple[Column, Column]:
    """(language, confidence) — the reference get_language contract
    (models/_utils.py:156-172): top language plus a confidence score,
    'unknown'/0.0 for short or indecisive text. Confidence here =
    best_score / total_score over the marker heuristic (the langdetect
    probability analogue); short-text gate: len(text) <= 1, or <= 5 with
    confidence <= 0.2, returns unknown — mirroring the reference's
    thresholds."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    total = sum(scores.values(), F.lit(0.0))
    conf = F.round(F.when(total > 0, best / total).otherwise(F.lit(0.0)), 6)
    lang = lang_id(col)
    short_gate = (F.length(col) <= 1) | ((F.length(col) <= 5) & (conf <= 0.2))
    gated = short_gate | (lang == "unknown")
    return (
        F.when(gated, F.lit("unknown")).otherwise(lang),
        F.when(gated, F.lit(0.0)).otherwise(conf),
    )


def lang_id_conf_sql(c: str) -> tuple[str, str]:
    """DuckDB twins of :func:`lang_id_conf`."""
    s = lang_scores_sql(c)
    best = "greatest(" + ", ".join(f"({v})" for v in s.values()) + ")"
    total = " + ".join(f"({v})" for v in s.values())
    conf = f"round(CASE WHEN ({total}) > 0 THEN ({best}) * 1.0 / ({total}) ELSE 0.0 END, 6)"
    lang = lang_id_sql(c)
    gate = f"(length({c}) <= 1 OR (length({c}) <= 5 AND ({conf}) <= 0.2) OR ({lang}) = 'unknown')"
    return (
        f"CASE WHEN {gate} THEN 'unknown' ELSE ({lang}) END",
        f"CASE WHEN {gate} THEN 0.0 ELSE ({conf}) END",
    )


def lang_id_sql(c: str) -> str:
    s = lang_scores_sql(c)
    best = "greatest(" + ", ".join(f"({v})" for v in s.values()) + ")"
    chain = "'unknown'"
    for lang in reversed(LANG_MARKERS):
        chain = f"CASE WHEN ({s[lang]}) = ({best}) THEN '{lang}' ELSE {chain} END"
    return f"CASE WHEN ({best}) > 0 THEN {chain} ELSE 'unknown' END"


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: alpha-heavy, some length,
    not all digits/punct. quality = 0.6*alpha_ratio + 0.4*min(tokens,64)/64."""
    alpha = char_class_ratio(col, ALPHA_REGEX)
    toks = token_count(col)
    return F.round(alpha * 0.6 + F.least(toks, F.lit(64)) / 64.0 * 0.4, 6)


def quality_score_sql(c: str) -> str:
    alpha = char_class_ratio_sql(c, ALPHA_REGEX)
    toks = TOKEN_COUNT_SQL.format(c=c)
    return f"round(({alpha}) * 0.6 + least(({toks}), 64) / 64.0 * 0.4, 6)"


def normalized_text(col: Column) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


NORMALIZED_SQL = "trim(regexp_replace(lower({c}), '\\s+', ' ', 'g'))"


def fingerprint(col: Column) -> Column:
    """Content fingerprint = md5 hex of normalized text."""
    return F.md5(F.encode(normalized_text(col), "UTF-8"))


FINGERPRINT_SQL = "md5(" + NORMALIZED_SQL + ")"


# ------------------------------------------------------- ascii fold


def _fold_tables() -> tuple[str, str]:
    """1:1 diacritic fold table (Latin-1 Supplement through Latin
    Extended-B): NFKD-decompose, keep the ascii base char. Built once at
    import from stdlib unicodedata so the Spark expression and the SQL twin
    share the exact same literal."""
    import unicodedata

    src, dst = [], []
    for cp in range(0xC0, 0x250):
        ch = chr(cp)
        folded = unicodedata.normalize("NFKD", ch).encode("ascii", "ignore").decode()
        if len(folded) == 1:
            src.append(ch)
            dst.append(folded)
    return "".join(src), "".join(dst)


# multi-char expansions translate() can't express (anyascii semantics for
# the symbols the reference's tests exercise: the ("EUR", "€") pair plus
# common Latin ligatures). The full anyascii table is package data in the
# reference; this from-scratch fold covers Latin scripts + these symbols
# and leaves other scripts unmapped (documented divergence).
FOLD_MULTI = [
    ("€", "EUR"), ("ß", "ss"), ("ẞ", "SS"),
    ("Æ", "AE"), ("æ", "ae"), ("Œ", "OE"), ("œ", "oe"),
    ("Þ", "Th"), ("þ", "th"), ("Ð", "D"), ("ð", "d"),
]
_FOLD_SRC, _FOLD_DST = _fold_tables()


def ascii_fold(col: Column) -> Column:
    """Deterministic ascii transliteration (anyascii analogue): multi-char
    expansions then the 1:1 diacritic translate."""
    for s, d in FOLD_MULTI:
        col = F.replace(col, F.lit(s), F.lit(d))
    return F.translate(col, _FOLD_SRC, _FOLD_DST)


def ascii_fold_sql(expr: str) -> str:
    """DuckDB twin of :func:`ascii_fold` (same tables, same order)."""
    for s, d in FOLD_MULTI:
        expr = f"replace({expr}, '{s}', '{d}')"
    return f"translate({expr}, '{_FOLD_SRC}', '{_FOLD_DST}')"


# 4-level string match (doctr/utils/metrics.py:23-41 semantics: raw,
# caseless, anyascii, unicase — the anyascii levels use the own ascii_fold
# transliteration above; fold-then-lower ordering matters so ("EUR", "€")
# matches at unicase, mirroring the reference's comment)
def string_match(a: Column, b: Column) -> tuple[Column, Column, Column, Column]:
    raw = (a == b).cast("int")
    caseless = (F.lower(a) == F.lower(b)).cast("int")
    fa, fb = ascii_fold(a), ascii_fold(b)
    anyascii = (fa == fb).cast("int")
    unicase = (F.lower(fa) == F.lower(fb)).cast("int")
    return raw, caseless, anyascii, unicase


# ------------------------------------------------------------ PII scrub

# Ordered redaction rules (training-data curation staple). Patterns use
# only constructs with identical semantics in Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repeats, \b — no lookaround, no
# backreferences. ORDER MATTERS: email first (its digits must not be
# phone-eaten), id/ip before phone (the phone class includes dots and
# dashes and would swallow both).
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9()\-\s.]{6,}[0-9]", "<PHONE>"),
]


def scrub_pii(col: Column) -> Column:
    """Redact emails / SSN-style ids / IPv4s / international phone numbers
    to typed tags, applied in rule order so earlier redactions can't be
    re-matched (tags carry no digits). Pure JVM regexp_replace chain — the
    scrub runs inside whole-stage codegen, no Python."""
    for _, pat, tag in PII_RULES:
        col = F.regexp_replace(col, pat, tag)
    return col


def scrub_pii_sql(expr: str) -> str:
    """DuckDB twin of :func:`scrub_pii` (same rules, same order; DuckDB
    standard strings pass backslashes through verbatim)."""
    for _, pat, tag in PII_RULES:
        pat_sql = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{tag}', 'g')"
    return expr


def pii_count_cols(col: Column) -> list[Column]:
    """Per-rule match counts, evaluated on the progressively scrubbed text
    (identical to what scrub_pii replaces at each stage)."""
    out = []
    for _, pat, tag in PII_RULES:
        out.append(F.size(F.regexp_extract_all(col, F.lit(pat), 0)))
        col = F.regexp_replace(col, pat, tag)
    return out


def pii_count_sql(expr: str) -> list[str]:
    out = []
    for _, pat, tag in PII_RULES:
        pat_sql = pat.replace("'", "''")
        out.append(f"len(regexp_extract_all({expr}, '{pat_sql}'))")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{tag}', 'g')"
    return out


# ------------------------------------------------------------ URL stats

URL_REGEX = r"https?://[^\s/$.?#][^\s]*"
DOMAIN_REGEX = r"https?://([^/\s:]+)"


def url_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(URL_REGEX), 0))


def distinct_domains_csv(col: Column) -> Column:
    """Sorted comma-joined distinct domains referenced by a text column
    (the blocklist-filtering primitive). JVM-side end to end."""
    return F.array_join(
        F.array_sort(F.array_distinct(F.regexp_extract_all(col, F.lit(DOMAIN_REGEX), 1))), ","
    )


URL_COUNT_SQL = "len(regexp_extract_all({c}, 'https?://[^\\s/$.?#][^\\s]*'))"
DOMAINS_CSV_SQL = (
    "coalesce(array_to_string(list_sort(list_distinct("
    "regexp_extract_all({c}, 'https?://([^/\\s:]+)', 1))), ','), '')"
)


# GPT-2-style pre-tokenizer segments (lookahead-free so the Java-regex
# Spark side and the RE2 DuckDB oracle scan identically): contractions,
# optionally space-prefixed letter runs / digit runs / symbol runs.
BPE_SEGMENT_REGEX = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(col: Column) -> Column:
    """Subword-token estimate: count of BPE pre-tokenizer segments (the
    'BPE-ish regex' counter of the training-data stats suite; whitespace
    runs themselves are not tokens)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_SEGMENT_REGEX), 0))


BPE_TOKEN_COUNT_SQL = (
    "len(regexp_extract_all({c}, '"
    + BPE_SEGMENT_REGEX.replace("'", "''").replace("{", "{{").replace("}", "}}")
    + "'))"
)


# ------------------------------------------------- window chunking


def split_into_windows(col: Column, window: int, stride: int) -> Column:
    """Split normalized text into overlapping token windows (the
    long-document chunking op before pretraining: window = context length,
    stride < window = overlap). Pure JVM higher-order functions: tokens
    once, then slice per window start — array<struct<window_idx, start_tok,
    n_tokens, chunk>>. Documents shorter than one window yield one chunk."""
    if window < 1 or stride < 1:
        raise ValueError(f"window/stride must be >= 1, got {window}/{stride}")
    toks = F.split(normalized_text(col), " ")
    n = F.size(toks)
    # coverage windows, capped so no start falls past the last token (with
    # stride > window the uncapped formula would emit empty past-the-end
    # windows with negative n_tokens)
    n_windows = F.greatest(
        F.lit(1),
        F.least(
            (F.ceil((n - F.lit(window)) / F.lit(stride)) + 1).cast("int"),
            (F.floor((n - 1) / F.lit(stride)) + 1).cast("int"),
        ),
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_windows - 1), lambda i: i * stride
    )
    return F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("window_idx"),
            s.alias("start_tok"),
            F.least(F.lit(window), n - s).alias("n_tokens"),
            F.array_join(F.slice(toks, s + 1, window), " ").alias("chunk"),
        ),
    )
