"""Training-technique extras (reference: lumo/contrib + contrib/tensor.py).

- EMA parameter averaging (lumo/contrib/module/ema.py:20; trainer-level
  integration lives in models/mmin_base.py's jit step)
- mixup / label sharpening / label guessing (contrib/tensor.py — the
  semi-supervised toolkit used by the legacy image tracks)
- loss zoo (lumo/contrib/nest/trainer/losses.py:12-184): CE, MSE, min-ENT,
  KL, SimCLR-style contrastive
All pure jax functions: explicit keys, no hidden state.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, alpha: float = 0.999):
    """shadow ← α·shadow + (1-α)·params (ema.py:20-…)."""
    return jax.tree_util.tree_map(lambda e, p: alpha * e + (1 - alpha) * p, ema_params, params)


# -- semi-supervised tensor ops (contrib/tensor.py) -------------------------


def onehot(labels, n_classes: int):
    return jax.nn.one_hot(labels, n_classes)


def sharpen(probs, T: float = 0.5):
    """Temperature sharpening of a prob distribution."""
    p = probs ** (1.0 / T)
    return p / p.sum(-1, keepdims=True)


def mixup(key, x1, y1, x2=None, y2=None, beta: float = 0.75):
    """Beta-interpolated pairs; single-batch mixup when x2 is None."""
    if x2 is None:
        perm = jax.random.permutation(key, x1.shape[0])
        x2, y2 = x1[perm], y1[perm]
    lam = jax.random.beta(key, beta, beta)
    lam = jnp.maximum(lam, 1 - lam)
    xm = lam * x1 + (1 - lam) * x2
    ym = lam * y1 + (1 - lam) * y2
    return xm, ym, lam


def label_guess(*prob_list):
    """Average predictions across augmentations (label guessing)."""
    return sum(prob_list) / len(prob_list)


def cutmix(key, x, y, beta: float = 1.0):
    """CutMix for [B, H, W, C] images (reference: augmentations cutmix for
    the legacy image tracks): swap a random box with a permuted batch, mix
    labels by the exact box-area fraction.  Static shapes: the box is
    realized as a coordinate mask, so jit sees one program."""
    kperm, klam, kx, ky = jax.random.split(key, 4)
    B, H, W = x.shape[0], x.shape[1], x.shape[2]
    perm = jax.random.permutation(kperm, B)
    lam = jax.random.beta(klam, beta, beta)
    rh = jnp.sqrt(1.0 - lam) * H
    rw = jnp.sqrt(1.0 - lam) * W
    cy = jax.random.uniform(ky, (), minval=0.0, maxval=H)
    cx = jax.random.uniform(kx, (), minval=0.0, maxval=W)
    y0, y1 = jnp.clip(cy - rh / 2, 0, H), jnp.clip(cy + rh / 2, 0, H)
    x0, x1 = jnp.clip(cx - rw / 2, 0, W), jnp.clip(cx + rw / 2, 0, W)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    box = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))[None, :, :, None]
    xm = jnp.where(box, x[perm], x)
    # label fraction from the REALIZED (pixel-quantized) box, so labels
    # match the mixed pixels exactly
    area = box.mean()
    ym = (1.0 - area) * y + area * y[perm]
    return xm, ym, 1.0 - area


# -- loss zoo (nest/trainer/losses.py) --------------------------------------


def ce_loss(logits, labels, mask=None):
    logp = jax.nn.log_softmax(logits, -1)
    if labels.ndim == logits.ndim:  # soft targets
        nll = -(labels * logp).sum(-1)
    else:
        nll = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
    if mask is None:
        return nll.mean()
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def mse_loss(a, b, mask=None):
    per = ((a - b) ** 2).mean(-1)
    if mask is None:
        return per.mean()
    return (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def minent_loss(logits, mask=None):
    """Entropy minimization of predictions."""
    p = jax.nn.softmax(logits, -1)
    ent = -(p * jax.nn.log_softmax(logits, -1)).sum(-1)
    if mask is None:
        return ent.mean()
    return (ent * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def kl_loss(logits_p, logits_q, mask=None):
    """KL(p ‖ q) between two predicted distributions."""
    p = jax.nn.softmax(logits_p, -1)
    kl = (p * (jax.nn.log_softmax(logits_p, -1) - jax.nn.log_softmax(logits_q, -1))).sum(-1)
    if mask is None:
        return kl.mean()
    return (kl * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def contrastive_loss(za, zb, temperature: float = 0.1):
    """SimCLR NT-Xent over two views [N, D] (losses.py contrastive mixin)."""
    za = za / jnp.linalg.norm(za, axis=-1, keepdims=True)
    zb = zb / jnp.linalg.norm(zb, axis=-1, keepdims=True)
    n = za.shape[0]
    z = jnp.concatenate([za, zb], 0)
    sim = z @ z.T / temperature
    sim = sim - 1e9 * jnp.eye(2 * n)
    targets = jnp.concatenate([jnp.arange(n) + n, jnp.arange(n)])
    return ce_loss(sim, targets)


class MemoryBank:
    """Fixed-size FIFO feature bank (models/module_utils.py MemoryBank),
    functional: (bank, ptr) threaded explicitly."""

    @staticmethod
    def init(size: int, dim: int):
        return jnp.zeros((size, dim)), jnp.zeros((), jnp.int32)

    @staticmethod
    def push(bank, ptr, feats):
        n = feats.shape[0]
        size = bank.shape[0]
        idx = (ptr + jnp.arange(n)) % size
        return bank.at[idx].set(feats), (ptr + n) % size


# --------------------------------------------------------------------------
# legacy raw-audio augmentation helpers (reference:
# augmentations/audio_strategies.py:24-66 — the deprecated raw-audio track).
# Host-side pipeline ops (they run in the data loader on variable-length
# clips, before padding/batching — not under jit), but with EXPLICIT rng:
# a np.random.Generator is threaded instead of the reference's global
# random/np.random state, matching the framework's no-hidden-state rule.

import numpy as np  # noqa: E402  (host-side section)


def audio_random_crop(max_size: int):
    """Crop a random window of ``max_size`` samples (audio_strategies.py:24)."""

    def inner(x: np.ndarray, rng: np.random.Generator):
        size = len(x)
        if size <= max_size:
            return x
        left = int(rng.integers(0, size - max_size))
        return x[left : left + max_size]

    return inner


def audio_center_crop(max_size: int):
    """Crop the centered window of ``max_size`` samples (audio_strategies.py:45)."""

    def inner(x: np.ndarray, rng: np.random.Generator = None):
        size = len(x)
        if size <= max_size:
            return x
        left = (size - max_size) // 2
        return x[left : left + max_size]

    return inner


def audio_gauss_noise(ratio: float = 20.0, p: float = 0.5):
    """Add zero-mean gaussian noise with std = |x|max·ratio/100, with
    probability ``p`` (audio_strategies.py:35).  The reference scales by
    the signed ``max(x)``, which hands a negative std to the sampler on
    an all-negative clip (latent crash there too); the amplitude-derived
    |x|max keeps its semantics on real audio and stays valid everywhere."""

    def inner(x: np.ndarray, rng: np.random.Generator):
        if rng.random() < p:
            std = float(np.abs(x).max()) * ratio / 100.0
            x = x + rng.normal(0.0, std, x.shape)
        return x

    return inner


class AudioCompose:
    """Sequential host-side audio pipeline (audio_strategies.py:55-66);
    falsy entries are skipped.  Each op takes (x, rng)."""

    def __init__(self, *ops):
        self.ops = list(ops)

    def append(self, op):
        self.ops.append(op)

    def __call__(self, x: np.ndarray, rng: np.random.Generator = None):
        rng = rng if rng is not None else np.random.default_rng(0)
        for op in self.ops:
            if op:
                x = op(x, rng)
        return x


def dataset_mean_std(images):
    """Per-channel mean/std of a dataset of HWC uint8-range images, /255
    scaled (reference: lumo/sketch/preprocess_mean_std.py:9-46 — two-pass:
    mean = average of per-image channel means, std = sqrt of the pixel-
    weighted squared deviation from that mean).  ``images`` is a re-
    iterable sequence of arrays (or (img, label) pairs); channel order is
    whatever the arrays carry (the reference hardcodes cv2's BGR)."""

    def _img(x):
        return np.asarray(x[0] if isinstance(x, (tuple, list)) else x, dtype=np.float64)

    n_imgs = 0
    mean = None
    for item in images:
        img = _img(item)
        n_imgs += 1
        m = img.reshape(-1, img.shape[-1]).mean(axis=0)
        mean = m if mean is None else mean + m
    if not n_imgs:
        raise ValueError("empty dataset")
    mean = mean / n_imgs

    sq = np.zeros_like(mean)
    n_pix = 0
    for item in images:
        img = _img(item)
        flat = img.reshape(-1, img.shape[-1])
        sq += ((flat - mean) ** 2).sum(axis=0)
        n_pix += flat.shape[0]
    std = np.sqrt(sq / n_pix)
    return tuple(mean / 255.0), tuple(std / 255.0)


# -- dataset split helpers (lumo/contrib/data/splits.py) ---------------------
#
# Host-side index arithmetic for the legacy semi-supervised tracks.  The
# reference mutates the process-global numpy RNG; here ``rng`` is explicit
# (pass ``np.random`` itself to share the reference's global stream — the
# differential test does exactly that to get bit-identical splits).


def sequence_split(lengths):
    """Contiguous index ranges of the given lengths (splits.py:8-19 — the
    in-order counterpart of torch's random_split)."""
    out, offset = [], 0
    for n in lengths:
        out.append(list(range(offset, offset + n)))
        offset += n
    return out


def ratio2length(total_len: int, *ratios):
    """Ratios → integer lengths, truncating (splits.py:74-85); the sum is
    not required to be 1."""
    return [int(total_len * r) for r in ratios]


def semi_split(labels, n_percls: int, val_size: int = 10000,
               include_sup: bool = True, repeat_sup: bool = True,
               shuffle: bool = True, rng=None):
    """Class-balanced semi-supervised split (splits.py:22-53).

    Per class: the first ``n_percls`` shuffled indices become the labeled
    set; the first (or, with ``include_sup=False``, the next)
    ``(N - val_size) // n_cls`` become the unlabeled set; the remainder is
    validation.  ``repeat_sup`` tiles the labeled set to the unlabeled
    length (the reference's epoch-locking trick for DataLoaderSide zip).
    Returns (labeled_idx, unlabeled_idx, val_idx) as numpy int arrays.
    """
    rng = np.random if rng is None else rng
    labels = np.asarray(labels)
    n_cls = len({int(i) for i in labels})
    n_per_un = (len(labels) - val_size) // n_cls

    sup, unsup, val = [], [], []
    for c in range(n_cls):
        idx = np.where(labels == c)[0]
        rng.shuffle(idx)
        sup.extend(idx[:n_percls])
        unsup.extend(idx[0 if include_sup else n_percls:n_per_un])
        val.extend(idx[n_per_un:])

    sup = np.asarray(sup)
    if repeat_sup and len(sup):
        reps = len(unsup) // len(sup) + 1
        sup = np.hstack([sup] * reps)[: len(unsup)]
    unsup, val = np.asarray(unsup), np.asarray(val)
    if shuffle:
        rng.shuffle(sup)
        rng.shuffle(unsup)
    return sup, unsup, val


def train_val_split(target, val_size: int = 10000, train_size=None, rng=None):
    """Shuffled (train_idx, val_idx) split (splits.py:56-71): the first
    ``val_size`` shuffled indices are validation, the rest (optionally
    capped at ``train_size``) are training."""
    rng = np.random if rng is None else rng
    idx = np.arange(len(target))
    rng.shuffle(idx)
    if train_size is not None:
        if len(idx) <= val_size + train_size:
            raise ValueError(
                f"need > {val_size + train_size} samples, have {len(idx)}"
            )
        return idx[val_size : val_size + train_size], idx[:val_size]
    return idx[val_size:], idx[:val_size]


def create_imbalanced_data(labels, imb_type: str = "exp",
                           imb_factor: float = 0.02, rng=None):
    """Long-tailed subsample indices (splits.py:88-121, BBN recipe):
    per-class keep counts decay exponentially ('exp'), step to
    ``img_max·imb_factor`` for the back half ('step'), or stay flat."""
    rng = np.random if rng is None else rng
    labels = np.asarray(labels)
    n_cls = len(set(labels.tolist()))
    img_max = len(labels) // n_cls
    if imb_type == "exp":
        keep = [int(img_max * imb_factor ** (c / (n_cls - 1.0))) for c in range(n_cls)]
    elif imb_type == "step":
        half = n_cls // 2
        keep = [img_max] * half + [int(img_max * imb_factor)] * (n_cls - half)
    else:
        keep = [img_max] * n_cls

    out = []
    for c, num in enumerate(keep):
        idx = np.where(labels == c)[0]
        rng.shuffle(idx)
        out.extend(idx[:num])
    return out
