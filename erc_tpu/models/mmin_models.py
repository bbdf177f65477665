"""MMIN building blocks (reference: track_mm/mmin_models.py).

TextCNN word-window conv encoder, LSTM sequence encoder with maxpool/last/
attention readouts, FC classifier, and the ResidualAE imagination
autoencoder — all as flax modules with torch-equivalent math.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from erc_tpu.ops.rnn import BiRNN


class TextCNN(nn.Module):
    """(mmin_models.py:8-40): 3 conv widths over word embeddings + maxpool."""

    embd_size: int = 128
    out_channels: int = 128
    kernel_heights: Sequence[int] = (3, 4, 5)
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: [B, W, D] word embeddings
        outs = []
        for k in self.kernel_heights:
            # conv with kernel (k, D) over [B, W, D, 1] ≡ 1D conv width k
            h = nn.Conv(self.out_channels, kernel_size=(k,), padding="VALID", name=f"conv{k}")(x)
            h = nn.relu(h)  # [B, W-k+1, C]
            outs.append(h.max(axis=1))  # maxpool over time
        h = jnp.concatenate(outs, -1)
        if not deterministic and self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=False)
        h = nn.relu(nn.Dense(self.embd_size, name="embd")(h))
        return h


class LSTMEncoder(nn.Module):
    """(mmin_models.py:43-95): 1-layer LSTM + maxpool/last readout.

    The reference runs the LSTM over the zero-padded tail without packing;
    we reproduce that (mask of ones), so readouts match bit-for-bit.
    """

    hidden_size: int
    embd_method: str = "maxpool"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        mask = jnp.ones(x.shape[:2], x.dtype)
        out = BiRNN(
            hidden_size=self.hidden_size, num_layers=1, cell="lstm",
            bidirectional=False, name="rnn",
        )(x, mask, deterministic=deterministic)
        if self.embd_method == "maxpool":
            return out.max(axis=1)
        if self.embd_method == "last":
            return out[:, -1]
        if self.embd_method == "attention":
            u = self.param("attention_vector_weight", nn.initializers.normal(1.0), (self.hidden_size, 1))
            h = jnp.tanh(nn.Dense(self.hidden_size, name="attention_layer")(out))
            w = jax.nn.softmax(h @ u, axis=-1)
            return (out * w).sum(1)
        raise ValueError(self.embd_method)


class Classifier(nn.Module):
    """(mmin_models.py:98-130): FC stack returning (logits, penultimate)."""

    layers: Sequence[int]
    output_dim: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i, width in enumerate(self.layers):
            x = nn.relu(nn.Dense(width, name=f"fc{i}")(x))
            if self.dropout > 0 and not deterministic:
                x = nn.Dropout(self.dropout)(x, deterministic=False)
        logits = nn.Dense(self.output_dim, name="fc_out")(x)
        return logits, x


class ResidualAE(nn.Module):
    """(mmin_models.py:133-199): n_blocks of encoder/decoder residual pairs.

    Block i input x_in += x_out(prev); latents concatenated across blocks;
    final transition MLP on (x_in + x_out).
    """

    layers: Sequence[int]
    n_blocks: int
    input_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        def drop(t):
            if self.dropout > 0 and not deterministic:
                return nn.Dropout(self.dropout)(t, deterministic=False)
            return t

        x_in = x
        x_out = jnp.zeros_like(x)
        latents = []
        for b in range(self.n_blocks):
            x_in = x_in + x_out
            h = x_in
            # encoder: Linear+LeakyReLU(+drop) per layer, last layer bare Linear
            for i, width in enumerate(self.layers):
                h = nn.Dense(width, name=f"enc{b}_{i}")(h)
                if i < len(self.layers) - 1:
                    h = drop(nn.leaky_relu(h, 0.01))
            latent = h
            # decoder: reversed widths + input_dim, ReLU+drop between
            widths = list(self.layers)[::-1][1:] + [self.input_dim]
            for i, width in enumerate(widths):
                h = nn.Dense(width, name=f"dec{b}_{i}")(h)
                if i < len(widths) - 1:
                    h = drop(nn.relu(h))
            x_out = h
            latents.append(latent)
        latents = jnp.concatenate(latents, -1)
        t = x_in + x_out
        t = nn.Dense(self.input_dim, name="trans0")(t)
        t = nn.relu(t)
        t = nn.Dense(self.input_dim, name="trans1")(t)
        return t, latents


class MMINBaseModule(nn.Module):
    """(mmin_models.py:202-240): tri-encoder + classifier."""

    n_classes: int = 4

    def setup(self):
        self.netL = TextCNN(128)
        self.netA = LSTMEncoder(128, "maxpool")
        self.netV = LSTMEncoder(128, "maxpool")
        self.netC = Classifier((128, 128), self.n_classes, dropout=0.3)

    def encode(self, batch, deterministic: bool = True):
        return jnp.concatenate(
            [
                self.netA(batch["audio_feature"], deterministic),
                self.netV(batch["visual_feature"], deterministic),
                self.netL(batch["text_feature"], deterministic),
            ],
            -1,
        )

    def __call__(self, batch, deterministic: bool = True):
        features = self.encode(batch, deterministic)
        logits, fusion = self.netC(features, deterministic)
        return logits, fusion


class MMINMissModule(nn.Module):
    """(mmin_miss.py:66-110): imagination AE over the fused encoding."""

    n_classes: int = 4
    ae_layers: Sequence[int] = (256, 128, 64)
    n_blocks: int = 5

    def setup(self):
        self.netL = TextCNN(128)
        self.netA = LSTMEncoder(128, "maxpool")
        self.netV = LSTMEncoder(128, "maxpool")
        self.netAE = ResidualAE(self.ae_layers, self.n_blocks, 384, dropout=0.0)
        self.netAE_cycle = ResidualAE(self.ae_layers, self.n_blocks, 384, dropout=0.0)
        self.netC = Classifier((128, 128), self.n_classes, dropout=0.3)

    def __call__(self, batch, deterministic: bool = True):
        features = jnp.concatenate(
            [
                self.netA(batch["audio_feature"], deterministic),
                self.netV(batch["visual_feature"], deterministic),
                self.netL(batch["text_feature"], deterministic),
            ],
            -1,
        )
        fusion, latent = self.netAE(features, deterministic)
        fusion_cycle, _ = self.netAE_cycle(features, deterministic)
        logits, _ = self.netC(latent, deterministic)
        return logits, fusion, fusion_cycle, features


class MMINMiss2Module(nn.Module):
    """Twin jointly-trained base nets (track_mm/mmin_miss2.py:131-226).

    Unlike mmin_miss there is no imagination AE and no frozen encoder:
    ``net`` classifies the Missing-masked inputs while ``netB`` classifies
    the complementary (reverse) features, BOTH train under one optimizer,
    and an MSE pulls net's penultimate classifier feature toward netB's
    with no stop-gradient anywhere (mmin_miss2.py:194-208:
    Lall = Lce + 4*Lmse(reverse_features, fusion_feature) + Lrce).
    Eval/test classify with ``net`` alone (to_logits, mmin_miss2.py:165).
    """

    n_classes: int = 4

    def setup(self):
        self.net = MMINBaseModule(self.n_classes)
        self.netB = MMINBaseModule(self.n_classes)

    def __call__(self, batch, deterministic: bool = True, with_reverse: bool = False):
        logits, fusion = self.net(batch, deterministic)
        # init must touch netB too (flax creates params on first call); the
        # init batch comes from a has_miss batcher, so reverse keys exist
        if not (with_reverse or self.is_initializing()):
            return logits, fusion
        rev = {
            "audio_feature": batch["audio_feature_reverse"],
            "visual_feature": batch["visual_feature_reverse"],
            "text_feature": batch["text_feature_reverse"],
        }
        rlogits, rfeat = self.netB(rev, deterministic)
        return logits, fusion, rlogits, rfeat
