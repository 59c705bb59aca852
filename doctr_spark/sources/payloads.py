"""Payload codecs: opaque binary page bundles + typed metadata.

A *page bundle* is the transport format for OCR-able payloads embedded in
transcript rows (the ``tool`` column carries a JSON envelope referencing
it). Multimodal columns follow the binary-plus-typed-metadata pattern: the
bytes are opaque at plan level and only decoded inside Arrow-batched UDFs.

Real-world decoders (PDF rasterization a la doctr/io/pdf.py:16-43, image
decode a la doctr/io/image/base.py:16-53) need pypdfium2 / cv2 which are
not in this container: they are gated behind import-tries and raise
NotImplementedError with a clear message, while the deterministic bundle
codec keeps the Spark-side plumbing (schema, batching, explode) real.
"""

from __future__ import annotations

import base64
import json
import struct
import zlib

import numpy as np

MAGIC = b"DSPG"  # doctr-spark page bundle
VERSION = 1


def encode_page_bundle(pages: list[np.ndarray], scale: int) -> bytes:
    """Serialize grayscale uint8 pages -> bundle bytes (zlib per page)."""
    parts = [MAGIC, struct.pack(">BHB", VERSION, len(pages), scale)]
    for page in pages:
        if page.dtype != np.uint8 or page.ndim != 2:
            raise ValueError("pages must be 2-D uint8 arrays")
        h, w = page.shape
        blob = zlib.compress(page.tobytes(), level=6)
        parts.append(struct.pack(">HHI", h, w, len(blob)))
        parts.append(blob)
    return b"".join(parts)


def decode_page_bundle(data: bytes) -> tuple[list[np.ndarray], int]:
    """Bundle bytes -> (pages, scale)."""
    if data[:4] != MAGIC:
        raise ValueError("not a page bundle")
    version, n_pages, scale = struct.unpack(">BHB", data[4:8])
    if version != VERSION:
        raise ValueError(f"unsupported bundle version {version}")
    off = 8
    pages = []
    for _ in range(n_pages):
        h, w, blob_len = struct.unpack(">HHI", data[off : off + 8])
        off += 8
        raw = zlib.decompress(data[off : off + blob_len])
        off += blob_len
        pages.append(np.frombuffer(raw, dtype=np.uint8).reshape(h, w))
    return pages, scale


def bundle_meta(data: bytes) -> dict:
    """Cheap metadata peek without decompressing pixels."""
    if data[:4] != MAGIC:
        raise ValueError("not a page bundle")
    version, n_pages, scale = struct.unpack(">BHB", data[4:8])
    off = 8
    dims = []
    for _ in range(n_pages):
        h, w, blob_len = struct.unpack(">HHI", data[off : off + 8])
        dims.append((h, w))
        off += 8 + blob_len
    return {"version": version, "n_pages": n_pages, "scale": scale, "dims": dims, "n_bytes": len(data)}


def tool_envelope(kind: str, payload: bytes) -> str:
    """JSON envelope stored in the transcript ``tool`` column."""
    return json.dumps({"kind": kind, "b64": base64.b64encode(payload).decode("ascii")})


def parse_tool_envelope(tool: str) -> tuple[str, bytes] | None:
    """Inverse of tool_envelope; None when the column holds no payload."""
    if not tool or not tool.startswith("{"):
        return None
    try:
        obj = json.loads(tool)
    except json.JSONDecodeError:
        return None
    if not isinstance(obj, dict) or "kind" not in obj or "b64" not in obj:
        return None
    return obj["kind"], base64.b64decode(obj["b64"])


# ----------------------------------------------------- real-world decoders


def read_pdf_pages(
    pdf_bytes: bytes,
    scale: float = 2.0,
    rgb_mode: bool = True,
    password: str | None = None,
) -> list[np.ndarray]:
    """PDF bytes -> list of (H, W, 3) uint8 page rasters.

    Mirrors the reference's ``read_pdf`` (io/pdf.py:16-43): pypdfium2
    render at ``scale`` (1 = 72 dpi; the default 2 = 144 dpi),
    ``rev_byteorder`` for RGB output, document closed after render. Gated:
    pypdfium2 is not in this container, so the call raises
    NotImplementedError there — tests exercise the wiring with a stub
    module and skip the real path when the import fails."""
    try:
        import pypdfium2 as pdfium
    except ImportError as exc:
        raise NotImplementedError(
            "real PDF rasterization requires pypdfium2, which is not installed; "
            "use deterministic page bundles (encode_page_bundle) instead"
        ) from exc
    pdf = pdfium.PdfDocument(pdf_bytes, password=password)
    try:
        # copy: to_numpy() can alias the PdfBitmap's buffer, which is freed
        # when the bitmap is GC'd / the document closes below — returned
        # arrays must own their pixels
        return [
            np.array(page.render(scale=scale, rev_byteorder=rgb_mode).to_numpy(), copy=True)
            for page in pdf
        ]
    finally:
        pdf.close()


def read_image(
    img_bytes: bytes,
    output_size: tuple[int, int] | None = None,
    rgb_output: bool = True,
) -> np.ndarray:
    """Encoded image bytes -> (H, W, 3) uint8 array.

    Mirrors the reference's ``read_img_as_numpy`` (io/image/base.py:16-53):
    cv2.imdecode in BGR, optional bilinear resize to ``output_size``
    (H, W), optional BGR->RGB swap. Gated: cv2 is not in this container."""
    try:
        import cv2
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires cv2, which is not installed; "
            "use deterministic page bundles (encode_page_bundle) instead"
        ) from exc
    img = cv2.imdecode(np.frombuffer(img_bytes, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("unable to read file.")
    if isinstance(output_size, tuple):
        img = cv2.resize(img, output_size[::-1], interpolation=cv2.INTER_LINEAR)
    if rgb_output:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) RGB -> (H, W) uint8 via ITU-R 601 luma; 2-D passthrough.
    Bridges the real decoders (RGB rasters) into the grayscale OCR
    pipeline."""
    if img.ndim == 2:
        return img.astype(np.uint8, copy=False)
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    return np.clip(0.299 * r + 0.587 * g + 0.114 * b, 0, 255).astype(np.uint8)
