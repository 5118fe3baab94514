"""Classification augmentation policy ops: shape/dtype/sanity checks."""

import numpy as np

from yolosharp_tpu.data import classify_augment as CA


def _img():
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (64, 64, 3), np.uint8)


def test_primitive_ops_preserve_shape_dtype():
    img = _img()
    rng = np.random.default_rng(1)
    for name, (fn, (lo, hi), signed) in CA._OPS.items():
        out = fn(img, CA._magnitude(name, 5, rng))
        assert out.shape == img.shape, name
        assert out.dtype == np.uint8, name


def test_policies_run():
    img = _img()
    rng = np.random.default_rng(2)
    for fn in (CA.auto_augment, CA.rand_augment, CA.augmix):
        out = fn(img, rng)
        assert out.shape == img.shape and out.dtype == np.uint8


def test_random_erasing():
    img = _img()
    rng = np.random.default_rng(3)
    out = CA.random_erasing(img, rng, p=1.0)
    assert (out != img).any()
    same = CA.random_erasing(img, rng, p=0.0)
    np.testing.assert_array_equal(same, img)


def test_solarize_invert_posterize_semantics():
    img = _img()
    np.testing.assert_array_equal(CA.invert(CA.invert(img)), img)
    np.testing.assert_array_equal(CA.posterize(img, 8), img)
    s = CA.solarize(img, 256)  # threshold above max: no-op
    np.testing.assert_array_equal(s, img)
