"""FAST/TextNet layer reparameterization — inference-time folding of the
multi-branch conv blocks into one conv (reference
models/modules/layers/pytorch.py:141-230 `FASTConvLayer` /
models/detection/fast/pytorch.py:283 `reparameterize`), re-derived in
numpy so fused weights can be produced for any runtime (ONNX, torch, or a
pandas-UDF conv) without a deep-learning framework.

The training-time layer computes
``relu(bn(conv_kxk(x)) + bn(conv_kx1(x)) + bn(conv_1xk(x)) + bn_id(x))``;
because every branch is linear, each folds to an equivalent ``k x k``
kernel+bias and the branches sum — the fused layer is a single biased conv
with identical outputs (verified numerically in tests against a naive
direct convolution of the unfused branches).

All kernels are (out_ch, in_ch/groups, kh, kw) float arrays; a BN is the
dict {gamma, beta, mean, var, eps}.
"""

from __future__ import annotations

import numpy as np


def fuse_conv_bn(kernel: np.ndarray, bn: dict) -> tuple[np.ndarray, np.ndarray]:
    """Fold a BatchNorm into the preceding (bias-free) conv:
    ``w' = w * gamma/std``, ``b' = beta - mean * gamma/std`` with
    ``std = sqrt(var + eps)`` (reference `_fuse_bn_tensor`)."""
    std = np.sqrt(bn["var"] + bn.get("eps", 1e-5))
    t = (bn["gamma"] / std).reshape(-1, 1, 1, 1)
    return kernel * t, bn["beta"] - bn["mean"] * bn["gamma"] / std


def pad_kernel_to(kernel: np.ndarray, target_ks: tuple[int, int]) -> np.ndarray:
    """Zero-pad a (O,I,kh,kw) kernel symmetrically to (O,I,KH,KW)
    (reference `_pad_to_mxn_tensor`)."""
    kh, kw = kernel.shape[2:]
    th, tw = target_ks
    ph, pw = (th - kh) // 2, (tw - kw) // 2
    return np.pad(kernel, ((0, 0), (0, 0), (ph, th - kh - ph), (pw, tw - kw - pw)))


def identity_kernel(in_channels: int, groups: int = 1) -> np.ndarray:
    """The 1x1 kernel that reproduces the identity map per group
    (reference `_identity_to_conv`)."""
    input_dim = in_channels // groups
    k = np.zeros((in_channels, input_dim, 1, 1), dtype=np.float64)
    for i in range(in_channels):
        k[i, i % input_dim, 0, 0] = 1.0
    return k


def reparameterize_fast_layer(
    main_kernel: np.ndarray,
    main_bn: dict,
    ver_kernel: np.ndarray | None = None,
    ver_bn: dict | None = None,
    hor_kernel: np.ndarray | None = None,
    hor_bn: dict | None = None,
    id_bn: dict | None = None,
    groups: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Equivalent single (kernel, bias) for the 4-branch FAST layer
    (reference `_get_equivalent_kernel_bias`): each branch BN-folds, pads
    to the main kernel's k x k, and the branches sum."""
    target_ks = main_kernel.shape[2:]
    kernel, bias = fuse_conv_bn(main_kernel, main_bn)
    for br_kernel, br_bn in ((ver_kernel, ver_bn), (hor_kernel, hor_bn)):
        if br_kernel is not None:
            kb, bb = fuse_conv_bn(br_kernel, br_bn)
            kernel = kernel + pad_kernel_to(kb, target_ks)
            bias = bias + bb
    if id_bn is not None:
        in_ch = main_kernel.shape[0]  # identity requires out == in
        kid, bid = fuse_conv_bn(identity_kernel(in_ch, groups), id_bn)
        kernel = kernel + pad_kernel_to(kid, target_ks)
        bias = bias + bid
    return kernel, bias


def conv2d_same(x: np.ndarray, kernel: np.ndarray, bias: np.ndarray | None = None) -> np.ndarray:
    """Direct 'same'-padded stride-1 conv (N,C,H,W) x (O,I,kh,kw) — the
    verification executor for the fused weights (and the shape a
    pandas-UDF conv stage would run per Arrow batch)."""
    n, c, h, w = x.shape
    o, i, kh, kw = kernel.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    xp = np.pad(x, ((0, 0), (0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw)))
    out = np.zeros((n, o, h, w), dtype=np.float64)
    for dy in range(kh):
        for dx in range(kw):
            patch = xp[:, :, dy : dy + h, dx : dx + w]  # (N,C,H,W)
            out += np.einsum("nchw,oc->nohw", patch, kernel[:, :, dy, dx])
    if bias is not None:
        out += bias.reshape(1, -1, 1, 1)
    return out


def batchnorm(x: np.ndarray, bn: dict) -> np.ndarray:
    std = np.sqrt(bn["var"] + bn.get("eps", 1e-5))
    return (x - bn["mean"].reshape(1, -1, 1, 1)) / std.reshape(1, -1, 1, 1) * bn[
        "gamma"
    ].reshape(1, -1, 1, 1) + bn["beta"].reshape(1, -1, 1, 1)
