"""NumpySession — a pure-numpy executor for the small ONNX op set the tiny
model zoo exports (Conv, Sigmoid, Sub, ReduceMax, Transpose).

This is the sandbox fallback behind the onnx_detector / onnx_recognizer
factories (plans/models.py): when onnxruntime is installed it is used; when
it is not, the SAME committed ``.onnx`` file executes through this class —
the loader contract (parse a real serialized checkpoint, run its graph) is
exercised either way. The run() signature mirrors
onnxruntime.InferenceSession.run so the factories need no branching beyond
session construction.

Ops follow the public ONNX operator spec (opset 13 semantics):
  Conv       — 2D, group=1, dilations=1; attrs: pads [hb, wb, he, we],
               strides [sh, sw]; zero padding
  Sigmoid    — elementwise logistic
  Sub        — elementwise with numpy broadcasting
  ReduceMax  — attrs: axes (ints), keepdims (int, default 1)
  Transpose  — attr: perm (ints)

Arithmetic runs in float64 internally (the deterministic tiny weights are
saturating, so float32 vs float64 never flips a decode) and returns
float32, matching the graph's declared tensor type.
"""

from __future__ import annotations

import numpy as np

from .onnx_proto import decode_model

_SUPPORTED = {"Conv", "Sigmoid", "Sub", "ReduceMax", "Transpose"}
_FFT_CACHE_MAX = 8  # kernel spectra per session; FIFO eviction (see Conv)


def _next_fast_len(n: int) -> int:
    """Smallest 5-smooth number >= n (numpy's FFT is O(n^2)-ish on large
    prime lengths; page/crop dims routinely land on primes)."""
    while True:
        m = n
        for p in (2, 3, 5):
            while m % p == 0:
                m //= p
        if m == 1:
            return n
        n += 1


def _conv2d(
    x: np.ndarray, w: np.ndarray, b: np.ndarray | None, attrs: dict, fft_cache: dict
) -> np.ndarray:
    pads = attrs.get("pads", [0, 0, 0, 0])
    sh, sw = attrs.get("strides", [1, 1])
    if attrs.get("group", 1) != 1 or attrs.get("dilations", [1, 1]) != [1, 1]:
        raise NotImplementedError("NumpySession Conv supports group=1, dilation=1")
    n, c, h, wd = x.shape
    m, c2, kh, kw = w.shape
    if c != c2:
        raise ValueError(f"Conv channel mismatch: input {c}, kernel {c2}")
    xp = np.pad(
        x.astype(np.float64), ((0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3]))
    )
    wk = w.astype(np.float64)
    if kh * kw * m > 256:
        # FFT cross-correlation: one forward transform per (batch, channel),
        # one inverse per output channel — O(M·HW·logHW) instead of the
        # sliding-window O(M·HW·kh·kw). float64 FFT rounding (~1e-9
        # relative) is far inside the tiny zoo's saturating-logit margins.
        # Kernel spectra are cached per FFT shape (weights are per-session
        # constants; crop batches repeat a handful of padded shapes).
        hp, wp = xp.shape[2], xp.shape[3]
        fh, fw = _next_fast_len(hp + kh - 1), _next_fast_len(wp + kw - 1)
        ck = (id(w), fh, fw)
        fk = fft_cache.get(ck)
        if fk is None:
            fk = np.fft.rfft2(wk[:, :, ::-1, ::-1], (fh, fw))  # (M, C, fh, fw')
            while len(fft_cache) >= _FFT_CACHE_MAX:
                fft_cache.pop(next(iter(fft_cache)))  # FIFO eviction
            fft_cache[ck] = fk
        fx = np.fft.rfft2(xp, (fh, fw))  # (N, C, fh, fw')
        spec = np.einsum("ncyx,mcyx->nmyx", fx, fk)  # channel contraction
        full = np.fft.irfft2(spec, (fh, fw))  # (N, M, fh, fw)
        out = full[:, :, kh - 1 : hp, kw - 1 : wp]
        out = out[:, :, ::sh, ::sw]
    else:
        win = np.lib.stride_tricks.sliding_window_view(xp, (kh, kw), axis=(2, 3))
        win = win[:, :, ::sh, ::sw]  # (N, C, H', W', kh, kw)
        out = np.einsum("nchwyx,mcyx->nmhw", win, wk)
    if b is not None:
        out = out + b.astype(np.float64)[None, :, None, None]
    return out


def _reduce_max(x: np.ndarray, attrs: dict) -> np.ndarray:
    axes = tuple(attrs["axes"])
    return x.max(axis=axes, keepdims=bool(attrs.get("keepdims", 1)))


class NumpySession:
    """onnxruntime.InferenceSession-compatible executor for the supported
    op subset; raises NotImplementedError on any other node type so a real
    exported model that needs more ops fails loudly, not wrongly."""

    def __init__(self, model_path: str):
        with open(model_path, "rb") as fh:
            self.model = decode_model(fh.read())
        unsupported = sorted(
            {n["op_type"] for n in self.model["nodes"]} - _SUPPORTED
        )
        if unsupported:
            raise NotImplementedError(
                f"NumpySession does not implement ONNX ops {unsupported}; "
                "install onnxruntime for full coverage"
            )
        # kernel spectra keyed (weights id, fft shape). BOUNDED at
        # _FFT_CACHE_MAX: sessions live for the worker process
        # (resolve_model singleton), and on heterogeneous page sizes every
        # distinct padded shape would otherwise pin a multi-MB complex
        # spectrum forever (recompute cost on eviction is one rfft2)
        self._fft_cache: dict = {}

    def get_inputs(self):  # minimal parity with InferenceSession
        class _Info:
            def __init__(self, name):
                self.name = name

        return [_Info(n) for n in self.model["inputs"]]

    def run(self, output_names, feed: dict[str, np.ndarray]) -> list[np.ndarray]:
        values: dict[str, np.ndarray] = dict(self.model["initializers"])
        for k, v in feed.items():
            values[k] = np.asarray(v)
        for node in self.model["nodes"]:
            ins = [values[i] for i in node["inputs"]]
            op = node["op_type"]
            if op == "Conv":
                out = _conv2d(
                    ins[0], ins[1], ins[2] if len(ins) > 2 else None,
                    node["attrs"], self._fft_cache,
                )
            elif op == "Sigmoid":
                out = 1.0 / (1.0 + np.exp(-ins[0].astype(np.float64)))
            elif op == "Sub":
                out = ins[0].astype(np.float64) - ins[1].astype(np.float64)
            elif op == "ReduceMax":
                out = _reduce_max(ins[0], node["attrs"])
            elif op == "Transpose":
                out = np.transpose(ins[0], node["attrs"]["perm"])
            values[node["outputs"][0]] = out
        wanted = output_names or self.model["outputs"]
        return [values[n].astype(np.float32) for n in wanted]
