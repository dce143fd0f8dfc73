"""Host-side image decode/encode (the reference's imread/imwrite sites).

The reference does disk I/O through OpenCV (reference src/srcnn.cpp:462
``imread``, :670 ``imwrite``).  We prefer the same codecs via the cv2 binding
(bit-identical decode for JPEG/PNG), falling back to PIL when cv2 is absent.
All in-memory images are BGR uint8 HxWx3, matching the reference convention.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

try:
    import cv2  # type: ignore

    _HAVE_CV2 = True
except Exception:  # pragma: no cover - exercised only on cv2-less installs
    _HAVE_CV2 = False


def sniff_format(path: str | Path) -> str | None:
    """Magic-byte format detection (reference test.cpp:136-195 parity).

    Returns "jpeg", "png", "bmp", or None.
    """
    try:
        with open(path, "rb") as f:
            head = f.read(8)
    except OSError:
        return None
    if head[:2] == b"\xff\xd8":
        return "jpeg"
    if head[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if head[:2] == b"BM":
        return "bmp"
    return None


def imread_bgr(path: str | Path) -> np.ndarray | None:
    """Decode an image file to BGR uint8 [H, W, 3]; None on failure."""
    path = str(path)
    if _HAVE_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        return img if img is not None and img.size else None
    try:
        from PIL import Image

        rgb = np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)
        return rgb[..., ::-1].copy()
    except Exception:
        return None


def imwrite_bgr(path: str | Path, bgr: np.ndarray) -> bool:
    """Encode a BGR uint8 image to ``path`` (format from extension)."""
    path = str(path)
    bgr = np.asarray(bgr, dtype=np.uint8)
    if _HAVE_CV2:
        return bool(cv2.imwrite(path, bgr))
    try:
        from PIL import Image

        Image.fromarray(bgr[..., ::-1]).save(path)
        return True
    except Exception:
        return False
