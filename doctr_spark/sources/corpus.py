"""Deterministic synthetic transcript corpus (generator + ground truth).

Produces the input table of BASELINE.json's input_hint —
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)`` — plus the per-turn equality oracle ``expected_text``,
computed at generation time from the same pure semantics the engine must
reproduce (the reference pins goldens the same way: synthetic fixtures with
expected values baked in, tests/conftest.py:27-42).

Turn payload mix:
- plain turns: expected = text verbatim
- html turns : boilerplate-wrapped paragraphs; expected = paragraphs joined
  by "\\n\\n" (docTR block-render semantics)
- ocr turns  : rendered raster-font page bundles in the ``tool`` envelope;
  expected = pages rendered to text with docTR join semantics
  (" " / "\\n" / "\\n\\n\\n\\n")

Everything is keyed on a stable integer hash of (conv_id, turn_idx) — no
sequential RNG state — so generation is embarrassingly parallel and
identical regardless of partitioning. ``make_transcripts`` fans the
generation out with mapInPandas, which is how a 10^12-turn corpus would be
materialized on a real cluster.
"""

from __future__ import annotations

import datetime as dt
import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..functions.render import PAGE_SEP
from .font import DEFAULT_SCALE, expected_page_lines, render_page
from .payloads import encode_page_bundle, tool_envelope

BASE_TS = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

_PLAIN_BANK = (
    "the quick brown fox jumps over a lazy dog while spark executors shuffle "
    "arrow batches across partitions and catalyst prunes columns from parquet "
    "scans before any python code ever runs on the cluster nodes at all"
).split()

_OCR_BANK = (
    "ALPHA BRAVO CHARLIE DELTA ECHO FOXTROT GOLF HOTEL INDIA JULIET KILO LIMA "
    "MIKE NOVEMBER OSCAR PAPA QUEBEC ROMEO SIERRA TANGO UNIFORM VICTOR WHISKEY "
    "XRAY YANKEE ZULU 42 100% (NOTE) READY. GO! WHY? A+B=C R&D #1 $99 OK,"
).split()

_ROLES = ("user", "assistant", "tool")


def _h(key: str) -> int:
    """Stable 64-bit hash of a string key."""
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")


def _pick(bank: list[str], seed: int, n: int) -> list[str]:
    return [bank[(seed + 31 * i) % len(bank)] for i in range(n)]


def conv_length(conv_idx: int, mean_turns: int, long_every: int, long_turns: int) -> int:
    """Skewed length distribution: every ``long_every``-th conversation is a
    hot key with ``long_turns`` turns (drives the skew/salting story)."""
    if long_every > 0 and conv_idx % long_every == 0:
        return long_turns
    return 3 + _h(f"len/{conv_idx}") % (2 * mean_turns - 3)


def gen_turn(
    conv_idx: int,
    turn_idx: int,
    ocr_ratio: float = 0.2,
    html_ratio: float = 0.3,
    scale: int = DEFAULT_SCALE,
    rot_ratio: float = 0.0,
    artefact_ratio: float = 0.0,
) -> dict:
    """Deterministically build one turn row (incl. ground-truth text).
    ``rot_ratio``: fraction of OCR pages stored rotated by a random quarter
    turn (exercises the orientation-detection stage).
    ``artefact_ratio``: fraction of OCR pages with a solid non-text block
    appended (exercises artefact filtering; never changes expected text)."""
    seed = _h(f"turn/{conv_idx}/{turn_idx}")
    role = _ROLES[turn_idx % 3]
    kind_draw = (seed % 1000) / 1000.0
    ts = BASE_TS + dt.timedelta(hours=conv_idx % 240, minutes=turn_idx)

    if kind_draw < ocr_ratio:
        # OCR payload turn: 1-2 rendered pages
        n_pages = 1 + seed % 2
        pages, page_texts = [], []
        for p in range(n_pages):
            pseed = _h(f"page/{conv_idx}/{turn_idx}/{p}")
            words = _pick(_OCR_BANK, pseed, 4 + pseed % 10)
            img, _ = render_page(words, scale=scale)
            if artefact_ratio > 0 and (pseed % 991) / 991.0 < artefact_ratio:
                img = _append_artefact(img, pseed, scale)
            if rot_ratio > 0 and (pseed % 997) / 997.0 < rot_ratio:
                img = np.ascontiguousarray(np.rot90(img, 1 + pseed % 3))
            pages.append(img)
            # artefacts are non-text elements: like the reference's
            # Artefact nodes they do not contribute to page.render()
            page_texts.append("\n".join(expected_page_lines(words, scale=scale)))
        bundle = encode_page_bundle(pages, scale)
        return {
            "conv_id": f"conv-{conv_idx:06d}",
            "turn_idx": turn_idx,
            "role": role,
            "text": f"[attachment: {n_pages} page(s)]",
            "tool": tool_envelope("page_bundle", bundle),
            "ts": ts,
            "expected_text": PAGE_SEP.join(page_texts),
            "payload_kind": "ocr",
        }
    if kind_draw < ocr_ratio + html_ratio:
        # HTML turn: boilerplate around known paragraphs
        n_paras = 1 + seed % 3
        paras = [" ".join(_pick(_PLAIN_BANK, _h(f"para/{conv_idx}/{turn_idx}/{i}"), 5 + (seed >> (4 * i)) % 9)) for i in range(n_paras)]
        body = "".join(f"<p>{p}</p>\n" for p in paras)
        html = (
            "<html><head><title>t</title><style>p{margin:0}</style></head><body>"
            f"<nav>Home | Docs | About</nav><header>site-{conv_idx % 7}</header>"
            f'<div id="main">{body}</div>'
            "<script>trackPageView();</script>"
            f"<footer>&copy; 2026 corp</footer><aside>ad {seed % 100}</aside></body></html>"
        )
        return {
            "conv_id": f"conv-{conv_idx:06d}",
            "turn_idx": turn_idx,
            "role": role,
            "text": html,
            "tool": "",
            "ts": ts,
            "expected_text": "\n\n".join(paras),
            "payload_kind": "html",
        }
    # plain text turn
    words = _pick(_PLAIN_BANK, seed, 4 + seed % 12)
    text = " ".join(words)
    return {
        "conv_id": f"conv-{conv_idx:06d}",
        "turn_idx": turn_idx,
        "role": role,
        "text": text,
        "tool": "",
        "ts": ts,
        "expected_text": text,
        "payload_kind": "plain",
    }


def _append_artefact(img: np.ndarray, seed: int, scale: int) -> np.ndarray:
    """Extend the page downward and draw a solid ink block (logo/photo
    stand-in) with enough clearance (9s) that the detector's vertical
    fusing never bridges it into the text."""
    h, w = img.shape
    clear = 9 * scale
    a_h = (10 + seed % 20) * scale
    a_w = (30 + seed % 60) * scale
    x0 = 8 * scale + (seed >> 3) % max(1, w - a_w - 16 * scale)
    out = np.full((h + clear + a_h + 8 * scale, w), 255, dtype=np.uint8)
    out[:h] = img
    out[h + clear : h + clear + a_h, x0 : x0 + a_w] = 0
    return out


def gen_conversation(
    conv_idx: int,
    mean_turns: int = 8,
    long_every: int = 0,
    long_turns: int = 256,
    ocr_ratio: float = 0.2,
    html_ratio: float = 0.3,
    scale: int = DEFAULT_SCALE,
    rot_ratio: float = 0.0,
    artefact_ratio: float = 0.0,
) -> list[dict]:
    n = conv_length(conv_idx, mean_turns, long_every, long_turns)
    return [
        gen_turn(conv_idx, t, ocr_ratio, html_ratio, scale, rot_ratio, artefact_ratio)
        for t in range(n)
    ]


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)
GENERATED_SCHEMA = TRANSCRIPT_SCHEMA + ", expected_text string, payload_kind string"


def make_transcripts_pdf(n_convs: int, **kwargs) -> pd.DataFrame:
    """Driver-side generation (tests / tiny corpora)."""
    rows: list[dict] = []
    for c in range(n_convs):
        rows.extend(gen_conversation(c, **kwargs))
    return pd.DataFrame(rows)


def make_transcripts(spark, n_convs: int, partitions: int | None = None, **kwargs):
    """Distributed generation: one task per conv-id range slice, via
    mapInPandas over spark.range — the pattern that scales to 10^12 turns.

    Returns a DataFrame with ground-truth columns included; callers split
    it into input (drop expected) and oracle (select expected).
    """
    partitions = partitions or max(8, n_convs // 64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for conv_idx in pdf["id"].tolist():
                rows.extend(gen_conversation(int(conv_idx), **kwargs))
            if rows:
                out = pd.DataFrame(rows)
                out["ts"] = pd.to_datetime(out["ts"], utc=True)
                out["turn_idx"] = out["turn_idx"].astype(np.int32)
                yield out

    return (
        spark.range(0, n_convs, 1, partitions)
        .mapInPandas(gen, schema=GENERATED_SCHEMA)
    )
