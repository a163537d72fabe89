"""Pyramid / blur / Scharr parity against OpenCV itself.

The reference's pyramid semantics are defined BY OpenCV calls
(CPhotoconsistencyOdometryAnalytic.h:115-189), so cv2 is the exact oracle.
"""

import cv2
import numpy as np
import pytest

from phovo_tpu.ops import pyramid as pyr

rng = np.random.default_rng(0)
IMG = rng.random((120, 160), dtype=np.float32)


@pytest.mark.parametrize("level", [1, 2, 3])
def test_resize_matches_cv2(level):
    f = 1.0 / 2**level
    expected = cv2.resize(IMG, (0, 0), fx=f, fy=f, interpolation=cv2.INTER_LINEAR)
    ours = np.asarray(pyr.resize_bilinear(IMG, pyr.level_shape(IMG.shape, level)))
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=1e-5)


@pytest.mark.parametrize("ksize", [3, 5, 7])
def test_gaussian_blur_matches_cv2(ksize):
    expected = cv2.GaussianBlur(IMG, (ksize, ksize), 3)
    ours = np.asarray(pyr.gaussian_blur(IMG, ksize, 3.0))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


@pytest.mark.parametrize("ksize", [2, 3, 5])
def test_box_blur_matches_cv2(ksize):
    # cv::blur default anchor/border; the reference's alternate smoothing
    # compile path (ENABLE_BOX_FILTER_BLUR, …Analytic.h:38,149-155). ksize=2
    # exercises the even-kernel anchor = ksize//2 (one right of center).
    expected = cv2.blur(IMG, (ksize, ksize))
    ours = np.asarray(pyr.box_blur(IMG, ksize))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_build_pyramid_box_blur_type():
    # double cv::blur per level, reference semantics (…Analytic.h:151-152)
    p = pyr.build_pyramid(IMG, 3, (0, 3, 5), blur_type="box")
    lvl1 = cv2.resize(IMG, (0, 0), fx=0.5, fy=0.5)
    lvl1 = cv2.blur(cv2.blur(lvl1, (3, 3)), (3, 3))
    np.testing.assert_allclose(np.asarray(p[1]), lvl1, atol=1e-5)
    lvl2 = cv2.resize(IMG, (0, 0), fx=0.25, fy=0.25)
    lvl2 = cv2.blur(cv2.blur(lvl2, (5, 5)), (5, 5))
    np.testing.assert_allclose(np.asarray(p[2]), lvl2, atol=1e-5)


@pytest.mark.parametrize("axis,dx,dy", [("x", 1, 0), ("y", 0, 1)])
def test_scharr_matches_cv2(axis, dx, dy):
    scale = 0.0625
    expected = cv2.Scharr(IMG, cv2.CV_32F, dx, dy, scale=scale)
    ours = np.asarray(pyr.scharr(IMG, axis, scale))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_double_blur_matches_reference_semantics():
    # reference applies GaussianBlur twice (…Analytic.h:146-147)
    expected = cv2.GaussianBlur(cv2.GaussianBlur(IMG, (5, 5), 3), (5, 5), 3)
    ours = np.asarray(pyr.gaussian_blur(pyr.gaussian_blur(IMG, 5, 3.0), 5, 3.0))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_build_pyramid_shapes_and_levels():
    p = pyr.build_pyramid(IMG, 4, (0, 0, 3, 3))
    assert [x.shape for x in p] == [(120, 160), (60, 80), (30, 40), (15, 20)]
    # level built from ORIGINAL image, not previous level
    lvl2_direct = cv2.resize(IMG, (0, 0), fx=0.25, fy=0.25)
    lvl2_direct = cv2.GaussianBlur(cv2.GaussianBlur(lvl2_direct, (3, 3), 3), (3, 3), 3)
    np.testing.assert_allclose(np.asarray(p[2]), lvl2_direct, atol=1e-5)


def test_gradient_pyramid():
    p = pyr.build_pyramid(IMG, 3, None)
    gx, gy = pyr.build_gradient_pyramid(p, (0.0625, 0.5, 1.0))
    for lvl, s in enumerate((0.0625, 0.5, 1.0)):
        exp_x = cv2.Scharr(np.asarray(p[lvl]), cv2.CV_32F, 1, 0, scale=s)
        np.testing.assert_allclose(np.asarray(gx[lvl]), exp_x, atol=1e-4)
        exp_y = cv2.Scharr(np.asarray(p[lvl]), cv2.CV_32F, 0, 1, scale=s)
        np.testing.assert_allclose(np.asarray(gy[lvl]), exp_y, atol=1e-4)
