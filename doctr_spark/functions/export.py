"""Export sinks (reference §2.8): nested dict/JSON export and hOCR XML.

Parity targets:
- export()/from_dict(): nested Word/Line/Block/Page dicts
  (doctr/io/elements.py:45-56,103,178,241,420) — here a flat-to-nested
  rebuild from the Arrow-friendly words array.
- export_as_xml(): hOCR (ocr_page / ocr_carea / ocr_par / ocr_line /
  ocrx_word, absolute-pixel bboxes, x_wconf)
  (doctr/io/elements.py:316-418).
"""

from __future__ import annotations

import json
from xml.sax.saxutils import escape


def artefact_render(artefact_type: str) -> str:
    """Render semantics of a non-textual Artefact element — ``[TYPE]``
    (reference io/elements.py:109-138 Artefact.render)."""
    return f"[{artefact_type.upper()}]"


def artefact_export(artefacts: list[dict]) -> list[dict]:
    """Artefact dicts -> exported nodes with the reference's
    ``_exported_keys`` (geometry, type, confidence)."""
    return [
        {
            "geometry": ((a["xmin"], a["ymin"]), (a["xmax"], a["ymax"])),
            "type": a.get("type", "block"),
            "confidence": a.get("confidence", 1.0),
        }
        for a in artefacts
    ]


def page_export(
    words: list[dict],
    dims: tuple[int, int],
    page_idx: int = 0,
    artefacts: list[dict] | None = None,
) -> dict:
    """Nested export dict from the flat words array (value/confidence/
    geometry/line_idx/word_idx), one block holding all lines; detected
    non-text artefacts export as typed Artefact nodes on the block (they
    render as [TYPE] and never contribute to the block text, reference
    io/elements.py:109-138)."""
    lines: dict[int, list[dict]] = {}
    for w in sorted(words, key=lambda w: (w["line_idx"], w["word_idx"])):
        lines.setdefault(w["line_idx"], []).append(
            {
                "value": w["value"],
                "confidence": w["confidence"],
                "geometry": ((w["xmin"], w["ymin"]), (w["xmax"], w["ymax"])),
            }
        )
    line_objs = []
    for line_idx in sorted(lines):
        ws = lines[line_idx]
        geom = (
            (min(w["geometry"][0][0] for w in ws), min(w["geometry"][0][1] for w in ws)),
            (max(w["geometry"][1][0] for w in ws), max(w["geometry"][1][1] for w in ws)),
        )
        line_objs.append({"geometry": geom, "words": ws})
    artefact_objs = artefact_export(artefacts or [])
    # block geometry = enclosing bbox of lines AND artefacts (reference
    # Block semantics, io/elements.py:76-95 resolve over all children)
    geoms = [ln["geometry"] for ln in line_objs] + [a["geometry"] for a in artefact_objs]
    block = {
        "geometry": (
            (min(g[0][0] for g in geoms), min(g[0][1] for g in geoms)),
            (max(g[1][0] for g in geoms), max(g[1][1] for g in geoms)),
        )
        if geoms
        else ((0.0, 0.0), (0.0, 0.0)),
        "lines": line_objs,
        "artefacts": artefact_objs,
    }
    has_content = bool(geoms)
    return {"page_idx": page_idx, "dimensions": dims, "blocks": [block] if has_content else []}


def page_from_dict(d: dict) -> list[dict]:
    """Inverse of page_export: back to the flat words array."""
    out = []
    for block in d.get("blocks", []):
        for line_idx, line in enumerate(block["lines"]):
            for word_idx, w in enumerate(line["words"]):
                (x0, y0), (x1, y1) = w["geometry"]
                out.append(
                    {
                        "value": w["value"],
                        "confidence": w["confidence"],
                        "xmin": x0,
                        "ymin": y0,
                        "xmax": x1,
                        "ymax": y1,
                        "line_idx": line_idx,
                        "word_idx": word_idx,
                    }
                )
    return out


def page_to_json(words: list[dict], dims: tuple[int, int], page_idx: int = 0) -> str:
    return json.dumps(page_export(words, dims, page_idx), sort_keys=True)


def export_hocr(words: list[dict], dims: tuple[int, int], page_idx: int = 0, lang: str = "en") -> str:
    """hOCR XML for one page; bboxes in absolute pixels, confidence as
    x_wconf percent."""
    h, w = dims
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<html xmlns="http://www.w3.org/1999/xhtml" xml:lang="en">',
        "<body>",
        f'<div class="ocr_page" id="page_{page_idx + 1}" title="image; bbox 0 0 {w} {h}; ppageno 0">',
        f'<div class="ocr_carea" id="block_{page_idx + 1}_1">',
        f'<p class="ocr_par" id="par_{page_idx + 1}_1">',
    ]
    lines: dict[int, list[dict]] = {}
    for word in sorted(words, key=lambda x: (x["line_idx"], x["word_idx"])):
        lines.setdefault(word["line_idx"], []).append(word)
    for line_idx in sorted(lines):
        ws = lines[line_idx]
        lx0 = int(min(x["xmin"] for x in ws) * w)
        ly0 = int(min(x["ymin"] for x in ws) * h)
        lx1 = int(max(x["xmax"] for x in ws) * w)
        ly1 = int(max(x["ymax"] for x in ws) * h)
        out.append(
            f'<span class="ocr_line" id="line_{page_idx + 1}_{line_idx + 1}" '
            f'title="bbox {lx0} {ly0} {lx1} {ly1}; baseline 0 0">'
        )
        for word in ws:
            x0, y0 = int(word["xmin"] * w), int(word["ymin"] * h)
            x1, y1 = int(word["xmax"] * w), int(word["ymax"] * h)
            conf = int(round(word["confidence"] * 100))
            out.append(
                f'<span class="ocrx_word" id="word_{page_idx + 1}_{line_idx + 1}_{word["word_idx"] + 1}" '
                f'title="bbox {x0} {y0} {x1} {y1}; x_wconf {conf}">{escape(word["value"])}</span>'
            )
        out.append("</span>")
    out.extend(["</p>", "</div>", "</div>", "</body>", "</html>"])
    return "\n".join(out)


def export_kie_xml(
    predictions: dict[str, list[dict]], dims: tuple[int, int], page_idx: int = 0
) -> str:
    """hOCR-style XML for a KIE page, mirroring reference
    io/elements.py:496-590: one ``ocr_carea`` per *prediction* (id
    ``{class}_prediction_{n}``, global running count) with nested
    ``ocr_par`` / ``ocr_line`` / ``ocrx_word`` all sharing the word's bbox
    (the reference's PDF/A-compatibility workaround — KIE predictions are
    flat words, so all four levels collapse to the same box), pixel coords
    via ``int(round(rel * dim))``. Classes iterate in sorted order for
    determinism (the reference iterates dict insertion order)."""
    h, w = dims
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<html xmlns="http://www.w3.org/1999/xhtml" xml:lang="en">',
        "<body>",
        f'<div class="ocr_page" id="page_{page_idx + 1}" title="image; bbox 0 0 {w} {h}; ppageno 0">',
    ]
    n = 1
    for cls in sorted(predictions):
        for word in predictions[cls]:
            x0, y0 = int(round(word["xmin"] * w)), int(round(word["ymin"] * h))
            x1, y1 = int(round(word["xmax"] * w)), int(round(word["ymax"] * h))
            bbox = f"bbox {x0} {y0} {x1} {y1}"
            conf = int(round(word.get("confidence", 1.0) * 100))
            c = escape(cls)
            out.append(f'<div class="ocr_carea" id="{c}_prediction_{n}" title="{bbox}">')
            out.append(f'<p class="ocr_par" id="{c}_par_{n}" title="{bbox}">')
            out.append(
                f'<span class="ocr_line" id="{c}_line_{n}" '
                f'title="{bbox}; baseline 0 0; x_size 0; x_descenders 0; x_ascenders 0">'
            )
            out.append(
                f'<span class="ocrx_word" id="{c}_word_{n}" '
                f'title="{bbox}; x_wconf {conf}">{escape(word["value"])}</span>'
            )
            out.extend(["</span>", "</p>", "</div>"])
            n += 1
    out.extend(["</div>", "</body>", "</html>"])
    return "\n".join(out)
