"""chan_vese() one-call convenience API."""

import numpy as np

from chan_vese_tpu import chan_vese
from fixtures import colored_squares, iou, two_disks


def test_gray_default():
    img, gt = two_disks(64, 64, noise=6.0)
    mask = chan_vese(img, init_level_set="circle")
    assert iou(mask, gt) >= 0.99


def test_unit_range_normalized():
    img, gt = two_disks(64, 64, noise=6.0)
    mask = chan_vese(img / 255.0, init_level_set="circle")
    assert iou(mask, gt) >= 0.99


def test_rgb_with_lambdas():
    img, gt = colored_squares(64, 64, noise=4.0)
    mask = chan_vese(img, lambda1=(1.0, 1.2, 0.8),
                     init_level_set="circle")
    assert iou(mask, gt) >= 0.97


def test_extended_output():
    img, gt = two_disks(48, 48, noise=5.0)
    mask, phi, res = chan_vese(img, init_level_set="circle",
                               extended_output=True)
    assert phi.shape == mask.shape == img.shape
    assert int(res.iters) > 0
