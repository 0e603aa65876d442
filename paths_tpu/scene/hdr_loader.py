"""Radiance .hdr (RGBE) loader, pure numpy.

Replaces the reference's ``image::hdr`` decode (serde.rs:359-385).  Supports
the common `-Y h +X w` raster with new-style RLE scanlines and flat data.
"""

from __future__ import annotations

import numpy as np


def load_hdr(path: str) -> np.ndarray:
    """Returns (H, W, 3) float32 linear RGB."""
    with open(path, "rb") as f:
        data = f.read()

    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance HDR file")

    # Header ends at a blank line; next line is the resolution spec.
    pos = 0
    fmt_ok = False
    while True:
        nl = data.find(b"\n", pos)
        line = data[pos:nl].strip()
        pos = nl + 1
        if line.startswith(b"FORMAT="):
            fmt_ok = b"32-bit_rle_rgbe" in line
        if line == b"":
            break
    nl = data.find(b"\n", pos)
    res = data[pos:nl].split()
    pos = nl + 1
    if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"{path}: unsupported resolution spec {res}")
    if not fmt_ok:
        raise ValueError(f"{path}: unsupported FORMAT")
    height, width = int(res[1]), int(res[3])

    raw = np.frombuffer(data, np.uint8, offset=pos)
    rgbe = np.zeros((height, width, 4), np.uint8)
    off = 0
    for y in range(height):
        if (
            off + 4 <= len(raw)
            and raw[off] == 2
            and raw[off + 1] == 2
            and ((int(raw[off + 2]) << 8) | int(raw[off + 3])) == width
        ):
            # New-style RLE: 4 components run-length encoded per scanline.
            off += 4
            for c in range(4):
                x = 0
                while x < width:
                    count = int(raw[off]); off += 1
                    if count > 128:  # run
                        rgbe[y, x : x + count - 128, c] = raw[off]
                        off += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x : x + count, c] = raw[off : off + count]
                        off += count
                        x += count
        else:
            # Flat scanline.
            row = raw[off : off + width * 4].reshape(width, 4)
            rgbe[y] = row
            off += width * 4

    mantissa = rgbe[..., :3].astype(np.float32)
    exponent = rgbe[..., 3].astype(np.int32)
    scale = np.where(
        exponent == 0, 0.0, np.ldexp(1.0, exponent - 136)
    ).astype(np.float32)
    return mantissa * scale[..., None]
