"""Minimal dependency-free PNG output.

The reference saves screenshots as ``Screenshots/Samples_{N}.png`` by reading
back the front buffer (src/Render/Gui.cs:28-33, src/Render/Objects/
Framebuffer.cs:67-82), flipping vertically because GL rows are bottom-up.
Same here: renderer images are GL-row-ordered (row 0 = bottom) and are
flipped at export.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def image_to_uint8_rows(image_gl_rows: np.ndarray) -> np.ndarray:
    """GL-row-ordered float [H,W,3] in [0,1] -> top-down uint8 [H,W,3]."""
    img = np.asarray(image_gl_rows)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    return img[::-1]  # vertical flip: GL bottom-up -> PNG top-down


def write_png(path: str, image_gl_rows: np.ndarray) -> None:
    """Write an RGB PNG. Accepts float [0,1] or uint8, GL row order."""
    img = image_to_uint8_rows(image_gl_rows)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.shape[2] > 3:
        img = img[:, :, :3]

    raw = b"".join(b"\x00" + img[row].tobytes() for row in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        block = tag + data
        return struct.pack(">I", len(data)) + block + struct.pack(">I", zlib.crc32(block) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(raw, 6))
               + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(payload)
