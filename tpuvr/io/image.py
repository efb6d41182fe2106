"""Image output — PNG/PPM writers (reference: framebuffer/PNG writer,
SURVEY.md §2.1)."""

from __future__ import annotations

import numpy as np


def tonemap(rgb, gamma: float = 2.2):
    """Clamp + gamma-encode linear radiance to displayable [0, 1]."""
    rgb = np.clip(np.asarray(rgb, dtype=np.float32), 0.0, 1.0)
    return rgb ** (1.0 / gamma)


def write_png(path: str, rgb):
    """Write an (H, W, 3) float image (linear radiance) as PNG."""
    from PIL import Image

    arr = (tonemap(rgb) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr, mode="RGB").save(path)


def write_ppm(path: str, rgb):
    """Dependency-free PPM writer (binary P6)."""
    arr = (tonemap(rgb) * 255.0 + 0.5).astype(np.uint8)
    h, w = arr.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(arr.tobytes())
