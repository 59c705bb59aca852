"""Regenerate doctr_spark/models_data/tiny_conv_v1.npz (the committed
weights of the tiny-conv model pair — see plans/tiny_conv.py).

Usage: python scripts/make_tiny_weights.py [out_path]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doctr_spark.plans.tiny_conv import WEIGHTS_PATH, make_tiny_weights  # noqa: E402


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else WEIGHTS_PATH
    os.makedirs(os.path.dirname(out), exist_ok=True)
    weights = make_tiny_weights()
    np.savez(out, **weights)
    sizes = {k: getattr(v, "shape", ()) for k, v in weights.items()}
    print(f"wrote {out}: {sizes}")


if __name__ == "__main__":
    main()
