"""RandAugment, TPU-native (reference: augmentations/components/
randaugment.py — the FixMatch variant: uniformly-random magnitudes, a
14-op pool, and a trailing Cutout).

The reference operates on PIL images on the host; this is the same op
pool as pure jax array math on uint8 [H, W, 3] images — jit-able,
vmap-able over a batch, and key-driven (no hidden RNG state).  PIL
semantics are matched per op (blend formulas, histogram LUTs, the
(x+0.5, y+0.5)-floor nearest-neighbour affine convention, black fill);
tests compare against a live PIL oracle (tests/test_randaugment.py).

Serves the legacy CIFAR/image tracks (augmentations/image_strategies.py);
the ERC feature pipelines do not use image augmentation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

def _to_f(img):
    return jnp.asarray(img).astype(jnp.float32)


def _to_u8(img_f):
    """Pillow's float→uint8 in blend/filter paths TRUNCATES (C cast)."""
    return jnp.clip(jnp.floor(img_f), 0, 255).astype(jnp.uint8)


def _gray_u8(img):
    """PIL convert('L'): fixed-point (R·19595 + G·38470 + B·7471 + 2¹⁵) ≫ 16
    (Pillow's L24 macro — rounds, unlike the docstring'd /1000 formula)."""
    i = jnp.asarray(img).astype(jnp.int32)
    return (
        (i[..., 0] * 19595 + i[..., 1] * 38470 + i[..., 2] * 7471 + 32768) >> 16
    ).astype(jnp.float32)


def _blend(degenerate_f, img, v):
    """PIL ImageEnhance: Image.blend(degenerate, image, v)."""
    return _to_u8(degenerate_f + v * (_to_f(img) - degenerate_f))


def autocontrast(img, _v=None):
    """PIL ImageOps.autocontrast(cutoff=0): per-channel min-max stretch."""

    def one(ch):
        lo = ch.min().astype(jnp.float32)
        hi = ch.max().astype(jnp.float32)
        scale = 255.0 / jnp.maximum(hi - lo, 1.0)
        out = jnp.floor((ch.astype(jnp.float32) - lo) * scale + 1e-6)
        return jnp.where(hi > lo, out, ch.astype(jnp.float32))

    return _to_u8(jnp.stack([one(img[..., c]) for c in range(3)], -1))


def brightness(img, v):
    return _blend(0.0, img, v)


def color(img, v):
    return _blend(_gray_u8(img)[..., None], img, v)


def contrast(img, v):
    """Degenerate = solid gray at int(mean(L) + 0.5)."""
    mean = jnp.floor(_gray_u8(img).mean() + 0.5)
    return _blend(mean, img, v)


def sharpness(img, v):
    """Degenerate = PIL SMOOTH filter ([[1,1,1],[1,5,1],[1,1,1]]/13),
    borders kept from the source image."""
    f = _to_f(img)
    k = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    sm = jax.lax.conv_general_dilated(
        f.transpose(2, 0, 1)[:, None],  # [C, 1, H, W]
        k[None, None], (1, 1), "VALID",
    )[:, 0].transpose(1, 2, 0)  # [H-2, W-2, C]
    # PIL rounds the filtered values; border rows/cols stay unfiltered
    deg = f.at[1:-1, 1:-1].set(jnp.round(sm))
    return _blend(deg, img, v)


def equalize(img, _v=None):
    """PIL ImageOps.equalize: per-channel histogram-derived LUT."""

    def one(ch):
        h = jnp.bincount(ch.reshape(-1).astype(jnp.int32), length=256)
        nz = h > 0
        n_levels = nz.sum()
        last_nz_val = h[255 - jnp.argmax(nz[::-1])]
        step = (h.sum() - last_nz_val) // 255
        csum = jnp.concatenate([jnp.zeros(1, h.dtype), jnp.cumsum(h)[:-1]])
        lut = (step // 2 + csum) // jnp.maximum(step, 1)
        ident = jnp.arange(256, dtype=lut.dtype)
        lut = jnp.where((n_levels <= 1) | (step == 0), ident, lut)
        return jnp.clip(lut, 0, 255)[ch.astype(jnp.int32)]

    return jnp.stack(
        [one(img[..., c]) for c in range(3)], -1
    ).astype(jnp.uint8)


def invert(img, _v=None):
    return (255 - img.astype(jnp.int32)).astype(jnp.uint8)


def identity(img, _v=None):
    return img


def posterize(img, v):
    """Keep the top ``v`` bits (v is dynamic; PIL masks the LUT)."""
    bits = jnp.clip(v.astype(jnp.int32) if hasattr(v, "astype") else jnp.int32(v), 1, 8)
    shift = 8 - bits
    return ((img.astype(jnp.int32) >> shift) << shift).astype(jnp.uint8)


def solarize(img, v):
    """Invert pixels ≥ threshold (PIL lut: i if i < v else 255 − i)."""
    i = img.astype(jnp.int32)
    return jnp.where(i < v, i, 255 - i).astype(jnp.uint8)


def _affine_nearest(img, a, b, c, d, e, f):
    """PIL Image.transform(AFFINE, (a,b,c,d,e,f)), resample=NEAREST,
    black fill: out(x, y) = in(a·x' + b·y' + c, d·x' + e·y' + f) with
    x' = x + 0.5, y' = y + 0.5 and floor to source pixel."""
    H, W = img.shape[:2]
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    xg, yg = jnp.meshgrid(xs, ys)  # [H, W]
    xi = jnp.floor(a * xg + b * yg + c).astype(jnp.int32)
    yi = jnp.floor(d * xg + e * yg + f).astype(jnp.int32)
    ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    xi = jnp.clip(xi, 0, W - 1)
    yi = jnp.clip(yi, 0, H - 1)
    out = img[yi, xi]
    return jnp.where(ok[..., None], out, 0).astype(jnp.uint8)


def shear_x(img, v):
    return _affine_nearest(img, 1.0, v, 0.0, 0.0, 1.0, 0.0)


def shear_y(img, v):
    return _affine_nearest(img, 1.0, 0.0, 0.0, v, 1.0, 0.0)


def translate_x(img, v):
    return _affine_nearest(img, 1.0, 0.0, v * img.shape[1], 0.0, 1.0, 0.0)


def translate_y(img, v):
    return _affine_nearest(img, 1.0, 0.0, 0.0, 0.0, 1.0, v * img.shape[0])


def rotate(img, v):
    """PIL img.rotate(v): CCW degrees about the image center, NEAREST."""
    H, W = img.shape[:2]
    th = -v * jnp.pi / 180.0  # inverse map rotates CW
    cx, cy = W / 2.0, H / 2.0
    cos, sin = jnp.cos(th), jnp.sin(th)
    # inverse affine about the center
    c = cx - cx * cos - cy * sin
    f = cy + cx * sin - cy * cos
    return _affine_nearest(img, cos, sin, c, -sin, cos, f)


def cutout(key, img, v):
    """Reference Cutout: v∈[0,0.5] fraction of width; gray(125,123,114)
    box at a uniform center, clipped to the image."""
    H, W = img.shape[:2]
    size = v * W
    kx, ky = jax.random.split(key)
    x0 = jax.random.uniform(kx) * W
    y0 = jax.random.uniform(ky) * H
    x0 = jnp.floor(jnp.maximum(0.0, x0 - size / 2.0))
    y0 = jnp.floor(jnp.maximum(0.0, y0 - size / 2.0))
    x1 = jnp.minimum(W, x0 + size)
    y1 = jnp.minimum(H, y0 + size)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    # PIL rectangle fills x0..x1 and y0..y1 INCLUSIVE of the end pixel
    box = (xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1) & (v > 0)
    fill = jnp.array([125, 123, 114], jnp.uint8)
    return jnp.where(box[..., None], fill, img)


# (op, min_v, max_v) — exactly augment_list() (randaugment.py:143-160)
AUGMENT_LIST = [
    (autocontrast, 0.0, 1.0),
    (brightness, 0.05, 0.95),
    (color, 0.05, 0.95),
    (contrast, 0.05, 0.95),
    (equalize, 0.0, 1.0),
    (identity, 0.0, 1.0),
    (posterize, 4.0, 8.0),
    (rotate, -30.0, 30.0),
    (sharpness, 0.05, 0.95),
    (shear_x, -0.3, 0.3),
    (shear_y, -0.3, 0.3),
    (solarize, 0.0, 256.0),
    (translate_x, -0.3, 0.3),
    (translate_y, -0.3, 0.3),
]


@functools.partial(jax.jit, static_argnames=("n",))
def randaugment(key, img, n: int = 2):
    """FixMatch RandAugment (randaugment.py:163-176): ``n`` ops chosen
    uniformly WITH replacement, magnitude ~ U[min, max] per draw, then a
    Cutout with v ~ U[0, 0.5).  uint8 [H, W, 3] in/out; jit + vmap safe
    (op choice via lax.switch)."""
    img = jnp.asarray(img, jnp.uint8)
    branches = [
        (lambda im, v, op=op, lo=lo, hi=hi: op(im, lo + (hi - lo) * v))
        for op, lo, hi in AUGMENT_LIST
    ]

    def apply_one(carry, k):
        ki, kv = jax.random.split(k)
        idx = jax.random.randint(ki, (), 0, len(branches))
        u = jax.random.uniform(kv)
        return jax.lax.switch(idx, branches, carry, u), None

    key, kc = jax.random.split(key)
    img, _ = jax.lax.scan(apply_one, img, jax.random.split(key, n))
    kv, kbox = jax.random.split(kc)
    return cutout(kbox, img, jax.random.uniform(kv) * 0.5)
