"""Regenerate the golden-image artifact (SURVEY.md §4 item 5).

Run from the repo root:  python tests/golden/generate.py

Produces tests/golden/demo_512.npz: one fixed-seed 512x512 frame of the
demo scene (depth 13, spp 1, frame 0) under a 32^2 atmosphere sky,
rendered by the XLA oracle on CPU, stored as float16 (the comparison
tolerance is far coarser than f16 quantization).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from tests.test_golden import GOLDEN_PATH, render_golden  # noqa: E402

if __name__ == "__main__":
    img = render_golden()
    np.savez_compressed(GOLDEN_PATH, image=img.astype(np.float16))
    print(f"wrote {GOLDEN_PATH}: shape {img.shape}, "
          f"mean {img.mean():.5f}, max {img.max():.3f}")
