"""Capture imresize goldens from the REFERENCE implementation.

Runs /root/reference/util/imresize.py (pure numpy, importable read-only) on
deterministic inputs and stores input/output pairs in
tests/goldens/imresize_golden.npz, so the suite pins our re-derived
data/imresize.py against the reference's actual numbers without importing
reference code at test time (same pattern as tools/make_goldens.py).

Run where /root/reference exists:
  PYTHONPATH=/root/repo python tools/make_imresize_golden.py
"""

import importlib.util
import os

import numpy as np

REF = "/root/reference/util/imresize.py"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                   "imresize_golden.npz")

CASES = [
    # (name, shape, scale_or_None, output_shape_or_None, kernel)
    ("cubic_down", (37, 53, 3), 0.5, None, "cubic"),
    ("cubic_up4", (16, 16, 3), 4.0, None, "cubic"),
    ("cubic_down_quarter", (64, 48, 3), 0.25, None, "cubic"),
    ("linear_down", (33, 21, 3), 0.5, None, "linear"),
    ("lanczos2_up", (12, 18, 3), 2.0, None, "lanczos2"),
    ("lanczos3_down", (40, 40, 3), 0.3, None, "lanczos3"),
    ("box_down", (24, 24, 3), 0.5, None, "box"),
    ("outshape", (20, 30, 3), None, (10, 10), "cubic"),
]


def main():
    spec = importlib.util.spec_from_file_location("ref_imresize", REF)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.default_rng(42)
    payload = {}
    for name, shape, scale, oshape, kernel in CASES:
        img = rng.uniform(size=shape)
        out = ref.imresize(img, scale_factor=scale, output_shape=oshape,
                           kernel=kernel)
        payload[f"{name}__in"] = img
        payload[f"{name}__out"] = np.asarray(out)
        payload[f"{name}__meta"] = np.array(
            [scale if scale is not None else -1.0,
             oshape[0] if oshape else -1, oshape[1] if oshape else -1],
            np.float64)
        payload[f"{name}__kernel"] = np.frombuffer(kernel.encode(), np.uint8)
    np.savez(OUT, **payload)
    print(f"wrote {len(CASES)} cases to {OUT}")


if __name__ == "__main__":
    main()
