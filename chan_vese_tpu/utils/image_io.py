"""Image I/O and visualization (SURVEY.md C13, C14).

Loads 8-bit images into float grids at the framework's canonical [0, 255]
operating point (see CVParams docstring); writes masks, contour overlays
and (optional) evolution GIFs. PIL is the primary backend with an imageio
fallback; .npy/.npz round-trips need only numpy.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def load_image(path, color: bool = False, dtype=np.float32) -> np.ndarray:
    """Load an image as float in [0, 255]; (H, W) gray or (H, W, 3)."""
    path = Path(path)
    if path.suffix == ".npy":
        return np.asarray(np.load(path), dtype)
    if path.suffix == ".npz":
        with np.load(path) as z:
            return np.asarray(z[z.files[0]], dtype)
    try:
        from PIL import Image
        img = Image.open(path)
        img = img.convert("RGB" if color else "L")
        return np.asarray(img, dtype)
    except ImportError:
        import imageio.v3 as iio
        arr = iio.imread(path)
        arr = np.asarray(arr, dtype)
        if color:
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            return arr[..., :3]
        if arr.ndim == 3:
            arr = arr[..., :3] @ np.asarray([0.299, 0.587, 0.114], dtype)
        return arr


def save_mask(path, mask) -> None:
    """Write a boolean mask as an 8-bit PNG (255 = inside)."""
    arr = (np.asarray(mask).astype(np.uint8)) * 255
    _save_u8(path, arr)


def save_labels(path, labels) -> None:
    """Write an integer phase-label map spread over [0, 255]."""
    lab = np.asarray(labels)
    k = max(int(lab.max()), 1)
    _save_u8(path, (lab.astype(np.float32) * (255.0 / k)).astype(np.uint8))


def contour_overlay(image, mask, color=(255, 0, 0)) -> np.ndarray:
    """Burn the mask boundary into an RGB copy of ``image``."""
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    img = np.clip(img, 0, 255).astype(np.uint8).copy()
    m = np.asarray(mask, bool)
    inner = m.copy()
    inner[1:, :] &= m[:-1, :]
    inner[:-1, :] &= m[1:, :]
    inner[:, 1:] &= m[:, :-1]
    inner[:, :-1] &= m[:, 1:]
    boundary = m & ~inner
    img[boundary] = color
    return img


def save_overlay(path, image, mask, color=(255, 0, 0)) -> None:
    _save_u8(path, contour_overlay(image, mask, color))


def save_evolution_gif(path, image, phi_frames, every: int = 1,
                       duration_ms: float = 80.0) -> None:
    """Animated contour evolution (SURVEY.md C14 'evolution video').

    duration_ms: per-frame display time; imageio v3's GIF plugin takes
    milliseconds (the v2 API took seconds - easy to get a uselessly fast
    animation).
    """
    import imageio.v3 as iio
    frames = [contour_overlay(image, np.asarray(phi) >= 0)
              for phi in phi_frames[::every]]
    iio.imwrite(Path(path), frames, duration=duration_ms, loop=0)


def _save_u8(path, arr: np.ndarray) -> None:
    path = Path(path)
    if path.suffix == ".npy":
        np.save(path, arr)
        return
    try:
        from PIL import Image
        Image.fromarray(arr).save(path)
    except ImportError:
        import imageio.v3 as iio
        iio.imwrite(path, arr)
