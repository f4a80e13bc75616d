"""Synthetic test images (SURVEY.md §4.2).

Intensities follow the framework's canonical [0, 255] operating point
(see CVParams docstring); ``noise`` is in the same units.
"""

import numpy as np


def two_disks(h=64, w=64, fg=217.0, bg=38.0, noise=0.0, seed=0, dtype=np.float64):
    """Grayscale image with two bright disks on dark background + GT mask."""
    rng = np.random.default_rng(seed)
    i, j = np.mgrid[0:h, 0:w].astype(np.float64)
    d1 = np.hypot(i - 0.3 * h, j - 0.3 * w) < 0.15 * min(h, w)
    d2 = np.hypot(i - 0.68 * h, j - 0.65 * w) < 0.2 * min(h, w)
    gt = d1 | d2
    img = np.where(gt, fg, bg).astype(dtype)
    if noise:
        img = img + noise * rng.standard_normal(img.shape)
    return img.astype(dtype), gt


def colored_squares(h=64, w=64, noise=0.0, seed=1, dtype=np.float64):
    """RGB image: colored squares on a gray background + GT mask (B:8)."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), (30.0, 40.0, 50.0), dtype=dtype)
    gt = np.zeros((h, w), dtype=bool)
    # two differently-colored squares, both far from the dark background and
    # closer to their mutual mean than to it (feasible for 2-phase vector CV)
    img[h // 8: h // 8 + h // 4, w // 8: w // 8 + w // 4] = (230.0, 200.0, 60.0)
    gt[h // 8: h // 8 + h // 4, w // 8: w // 8 + w // 4] = True
    img[h // 2: h // 2 + h // 3, w // 2: w // 2 + w // 3] = (210.0, 60.0, 230.0)
    gt[h // 2: h // 2 + h // 3, w // 2: w // 2 + w // 3] = True
    if noise:
        img = img + noise * rng.standard_normal(img.shape)
    return img.astype(dtype), gt


def four_regions(h=64, w=64, noise=0.0, seed=2, dtype=np.float64):
    """Piecewise-constant 4-region image for multiphase (B:9).

    Returns (img, labels) with labels in {0, 1, 2, 3}.
    """
    rng = np.random.default_rng(seed)
    labels = np.zeros((h, w), dtype=np.int32)
    labels[: h // 2, w // 2:] = 1
    labels[h // 2:, : w // 2] = 2
    labels[h // 2:, w // 2:] = 3
    # carve a disk of class 3 inside class 0 to make it non-trivial
    i, j = np.mgrid[0:h, 0:w]
    disk = np.hypot(i - h // 4, j - w // 4) < min(h, w) // 8
    labels[disk] = 3
    values = np.array([13.0, 89.0, 166.0, 242.0])
    img = values[labels].astype(dtype)
    if noise:
        img = img + noise * rng.standard_normal(img.shape)
    return img.astype(dtype), labels


def iou(a, b):
    a = np.asarray(a, bool)
    b = np.asarray(b, bool)
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / max(union, 1)
