"""RandAugment ops vs the live PIL oracle (the reference implementation's
exact library calls, augmentations/components/randaugment.py:15-141)."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
import PIL.Image, PIL.ImageEnhance, PIL.ImageOps  # noqa: E402

from erc_tpu import augment_image as A  # noqa: E402


def _img(seed=0, hw=(24, 20)):
    r = np.random.default_rng(seed)
    return r.integers(0, 256, size=(*hw, 3), dtype=np.uint8)


def _pil(arr):
    return PIL.Image.fromarray(arr)


def _exact(ours, theirs):
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(theirs))


def _mostly(ours, theirs, frac=0.97):
    """Geometry ops: Pillow's affine loop accumulates coordinates by
    forward differencing in C doubles, so pixels on exact boundary rays
    can resolve to the neighbouring source pixel; require near-total
    agreement rather than chasing its accumulation order."""
    a, b = np.asarray(ours), np.asarray(theirs)
    agree = (a == b).all(-1).mean()
    assert agree >= frac, f"pixel agreement {agree:.3f} < {frac}"


def test_brightness_color_contrast_sharpness():
    img = _img(1)
    for v in (0.05, 0.5, 0.95):
        _exact(A.brightness(img, v), PIL.ImageEnhance.Brightness(_pil(img)).enhance(v))
        _mostly(A.color(img, v), PIL.ImageEnhance.Color(_pil(img)).enhance(v), 0.99)
        _mostly(A.contrast(img, v), PIL.ImageEnhance.Contrast(_pil(img)).enhance(v), 0.99)
        _mostly(A.sharpness(img, v), PIL.ImageEnhance.Sharpness(_pil(img)).enhance(v), 0.95)


def test_autocontrast_equalize_invert():
    img = _img(2)
    _mostly(A.autocontrast(img), PIL.ImageOps.autocontrast(_pil(img)), 0.99)
    _mostly(A.equalize(img), PIL.ImageOps.equalize(_pil(img)), 0.99)
    _exact(A.invert(img), PIL.ImageOps.invert(_pil(img)))


def test_posterize_solarize():
    img = _img(3)
    for bits in (4, 6, 8):
        _exact(A.posterize(img, bits), PIL.ImageOps.posterize(_pil(img), bits))
    for th in (0, 77, 128, 256):
        _exact(A.solarize(img, th), PIL.ImageOps.solarize(_pil(img), th))


def test_affine_ops_match_pil():
    img = _img(4)
    p = _pil(img)
    _mostly(A.shear_x(img, 0.2), p.transform(p.size, PIL.Image.AFFINE, (1, 0.2, 0, 0, 1, 0)), 0.85)
    _mostly(A.shear_y(img, -0.25), p.transform(p.size, PIL.Image.AFFINE, (1, 0, 0, -0.25, 1, 0)))
    _mostly(A.translate_x(img, 0.3),
            p.transform(p.size, PIL.Image.AFFINE, (1, 0, 0.3 * p.size[0], 0, 1, 0)))
    _mostly(A.translate_y(img, -0.15),
            p.transform(p.size, PIL.Image.AFFINE, (1, 0, 0, 0, 1, -0.15 * p.size[1])))
    _mostly(A.rotate(img, 27.0), p.rotate(27.0), 0.93)
    _mostly(A.rotate(img, -12.5), p.rotate(-12.5), 0.93)


def test_randaugment_pipeline_runs_and_changes_image():
    import jax

    img = _img(5)
    out = A.randaugment(jax.random.PRNGKey(0), img, n=2)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.asarray(out).std() > 0
    # cutout box present or image transformed — must differ from input
    assert not np.array_equal(np.asarray(out), img)
    # vmap over a batch
    batch = np.stack([_img(i) for i in range(4)])
    outs = jax.vmap(A.randaugment, in_axes=(0, 0))(
        jax.random.split(jax.random.PRNGKey(1), 4), batch
    )
    assert outs.shape == batch.shape
