"""DialogueGCN v2 ("dgcnv2"): selectable base encoder (LSTM / GRU /
DialogueRNN / None) → windowed graph with MaskedEdgeAttention weights →
GraphNetwork (RGCN + GraphConv) → nodal-attention classifier.

TPU re-design of reference track_mm/dgcnv2.py + dgcnv2_models.py:
- DialogueRNN's per-timestep python loop over global/party/emotion GRU
  cells (dgcnv2_models.py:235-347) → one ``lax.scan`` with a g-history
  buffer and prefix-masked matching attention
- MaskedEdgeAttention 'attn1' (dgcnv2_models.py:517-596): the [110]-wide
  scalar projection becomes logits[u, v] = W[u]·x_v with a windowed
  masked softmax (global-softmax-then-renormalize ≡ windowed softmax)
- GraphNetwork (dgcnv2_models.py:753-773) over dense adjacency
- nodal attention = MatchingAttention('general2') over all valid nodes
  (dgcnv2_models.py:693-750)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

from erc_tpu.models.base import MMBaseParams
from erc_tpu.models.dgcn import IEMOCAP6_LOSS_WEIGHTS
from erc_tpu.ops import graphs
from erc_tpu.ops.attention import masked_softmax
from erc_tpu.ops.gnn import DenseGraphConv, DenseRGCN
from erc_tpu.ops.rnn import BiRNN, _uniform_init, gru_cell
from erc_tpu.train import optim as optim_factory
from erc_tpu.train.trainer import Trainer, main as _main


class DGCNV2Params(MMBaseParams):
    def __init__(self):
        super().__init__()
        self.train.batch_size = 32
        self.val.batch_size = 32
        self.test.batch_size = 32
        self.base_model = self.choice("LSTM", "DialogRNN", "GRU", "None")
        self.dataset = "iemocap-cogmen-6"
        self.epoch = 55
        self.optim = optim_factory.create_optim("Adam", lr=0.0003, weight_decay=0)
        self.loss_weights = True
        self.speaker_onehot = True
        self.batch_first = False
        self.wp = 10
        self.wf = 10
        self.hidden_size = 100
        # LSTM/GRU base encoders only: the reference runs the biRNN on the
        # raw padded batch with NO packing (``self.lstm(U)``,
        # dgcnv2_models.py:160-163 and the Daily model :913-916), so its
        # backward direction consumes padding zeros before the real tokens.
        # 'packed' (default) masks the recurrence like torch packed
        # sequences; 'unpacked' reproduces the reference's executed graph
        # exactly (same knob and rationale as mmgcn.lstm_mode).
        self.lstm_mode = self.choice("packed", "unpacked")


ParamsType = DGCNV2Params


class _GRUCellParams:
    """Torch-layout GRUCell params owned by a parent linen module."""

    def __init__(self, mod: nn.Module, name: str, in_dim: int, hidden: int):
        scale = 1.0 / jnp.sqrt(hidden)
        self.w_ih = mod.param(f"{name}_w_ih", _uniform_init(scale), (3 * hidden, in_dim))
        self.w_hh = mod.param(f"{name}_w_hh", _uniform_init(scale), (3 * hidden, hidden))
        self.b_ih = mod.param(f"{name}_b_ih", _uniform_init(scale), (3 * hidden,))
        self.b_hh = mod.param(f"{name}_b_hh", _uniform_init(scale), (3 * hidden,))

    def __call__(self, x, h):
        return gru_cell(x @ self.w_ih.T + self.b_ih, h, self.w_hh, self.b_hh)


class DialogueRNNScan(nn.Module):
    """DialogueRNN (dgcnv2_models.py:235-347) as a single scan.

    Per step t: global GRU over [U_t, q_speaker], matching attention
    ('general') of U_t over the g-history prefix, party GRU update gated by
    the speaker one-hot, emotion GRU over the speaker's party state.
    """

    D_m: int
    D_g: int
    D_p: int
    D_e: int
    D_a: int = 100
    dropout: float = 0.5
    n_parties: int = 2

    @nn.compact
    def __call__(self, U, qmask, mask, deterministic: bool = True):
        """U: [B, L, D_m]; qmask: [B, L, P] one-hot; mask: [B, L]."""
        B, L, _ = U.shape
        P = self.n_parties
        g_cell = _GRUCellParams(self, "g_cell", self.D_m + self.D_p, self.D_g)
        p_cell = _GRUCellParams(self, "p_cell", self.D_m + self.D_g, self.D_p)
        e_cell = _GRUCellParams(self, "e_cell", self.D_p, self.D_e)
        # MatchingAttention 'general' (mmgcn-style): transform(x) @ M
        att_w = self.param(
            "att_transform", _uniform_init(1.0 / jnp.sqrt(self.D_m)), (self.D_g, self.D_m)
        )

        if not deterministic and self.dropout > 0:
            drop_rng = self.make_rng("dropout")
        else:
            drop_rng = None
        keep = 1.0 - self.dropout

        def drop(t, key, tag):
            if drop_rng is None:
                return t
            k = jax.random.fold_in(jax.random.fold_in(drop_rng, tag), key)
            m = jax.random.bernoulli(k, keep, t.shape)
            return jnp.where(m, t / keep, 0.0)

        Us = jnp.swapaxes(U, 0, 1)  # [L, B, D_m]
        qs_seq = jnp.swapaxes(qmask, 0, 1)  # [L, B, P]

        def step(carry, inp):
            g_hist, g_prev, q0, e_prev, t = carry
            u_t, qm_t = inp
            qm_idx = qm_t.argmax(-1)  # [B]
            q0_sel = jnp.take_along_axis(q0, qm_idx[:, None, None], 1)[:, 0]  # [B, D_p]
            g_ = g_cell(jnp.concatenate([u_t, q0_sel], -1), g_prev)
            g_ = drop(g_, t, 0)
            # attention over history (strictly previous steps)
            xq = u_t @ att_w.T  # [B, D_g]
            logits = jnp.einsum("bd,bld->bl", xq, g_hist)
            prefix = (jnp.arange(L)[None, :] < t).astype(U.dtype)
            alpha = masked_softmax(logits, prefix, mode="where")
            c_ = jnp.einsum("bl,bld->bd", alpha, g_hist)
            c_ = jnp.where(t == 0, 0.0, c_)
            # party update: same input for every party, gated by qmask
            uc = jnp.concatenate([u_t, c_], -1)  # [B, D_m + D_g]
            uc_p = jnp.repeat(uc[:, None, :], P, 1).reshape(B * P, -1)
            qs_ = p_cell(uc_p, q0.reshape(B * P, -1)).reshape(B, P, -1)
            qs_ = drop(qs_, t, 1)
            q_ = q0 * (1 - qm_t[..., None]) + qs_ * qm_t[..., None]
            q_sel = jnp.take_along_axis(q_, qm_idx[:, None, None], 1)[:, 0]
            e_ = e_cell(q_sel, e_prev)
            e_ = drop(e_, t, 2)
            g_hist = g_hist.at[:, t].set(g_)
            return (g_hist, g_, q_, e_, t + 1), e_

        init = (
            jnp.zeros((B, L, self.D_g), U.dtype),
            jnp.zeros((B, self.D_g), U.dtype),
            jnp.zeros((B, P, self.D_p), U.dtype),
            jnp.zeros((B, self.D_e), U.dtype),
            jnp.zeros((), jnp.int32),
        )
        _, es = jax.lax.scan(step, init, (Us, qs_seq))
        return jnp.swapaxes(es, 0, 1)  # [B, L, D_e]


def reverse_padded(x, mask):
    """Per-sequence reverse of the valid prefix (dgcnv2.py:119-133)."""
    L = x.shape[1]
    lengths = mask.sum(-1).astype(jnp.int32)  # [B]
    idx = jnp.arange(L)[None, :]
    rev = lengths[:, None] - 1 - idx
    rev = jnp.clip(rev, 0, L - 1)
    out = jnp.take_along_axis(x, rev[..., None].astype(jnp.int32), 1)
    return out * mask[..., None]


class MaskedEdgeAttentionDense(nn.Module):
    """'attn1' edge weights (dgcnv2_models.py:541-562) in dense form."""

    input_dim: int
    max_seq_len: int
    wp: int
    wf: int

    @nn.compact
    def __call__(self, x, lengths):
        L = x.shape[1]
        W = self.param(
            "scalar", _uniform_init(1.0 / jnp.sqrt(self.input_dim)),
            (self.max_seq_len, self.input_dim),
        )
        logits = jnp.einsum("ud,bvd->buv", W[:L], x)
        win = graphs.window_adjacency(lengths, L, self.wp, self.wf)
        return masked_softmax(logits, win, axis=-1, mode="where")


class CNNFeatureExtractor(nn.Module):
    """Token-level TextCNN utterance encoder (DailyDialog track, reference
    dgcnv2_models.py:776-816): Embed → Conv1d per kernel size → relu →
    max-over-time → concat → dropout → Dense → relu, masked.

    Input token ids [B, L, W]; returns [B, L, output_size].  The torch
    Conv1d over the word axis is a VALID-padded nn.Conv on [BL, W, E].
    """

    vocab_size: int
    embedding_dim: int = 300
    output_size: int = 100
    filters: int = 50
    kernel_sizes: tuple = (3, 4, 5)
    dropout: float = 0.5

    @nn.compact
    def __call__(self, token_ids, mask, deterministic: bool = True):
        B, L, W = token_ids.shape
        emb = nn.Embed(
            self.vocab_size, self.embedding_dim,
            embedding_init=nn.initializers.normal(1.0), name="embedding",
        )(token_ids.astype(jnp.int32)).reshape(B * L, W, self.embedding_dim)
        pooled = []
        for K in self.kernel_sizes:
            c = nn.Conv(
                self.filters, (K,), padding="VALID", name=f"conv_{K}"
            )(emb)  # [BL, W-K+1, F]
            pooled.append(nn.relu(c).max(axis=1))
        h = jnp.concatenate(pooled, -1)
        if not deterministic and self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=False)
        h = nn.relu(nn.Dense(self.output_size, name="fc")(h))
        return h.reshape(B, L, self.output_size) * mask[..., None]


class DGCNV2Module(nn.Module):
    base_model: str
    input_size: int
    hidden_size: int = 100
    n_speakers: int = 2
    wp: int = 10
    wf: int = 10
    n_classes: int = 7
    dropout_rec: float = 0.5
    drop_rate: float = 0.4
    max_seq_len: int = 110
    graph_hidden_size: int = 100
    d_g: int = 150  # DialogueRNN global/party dims (dgcnv2.py:71-77)
    d_p: int = 150
    # DailyDialog variant (reference DialogueGCN_DailyModel,
    # dgcnv2_models.py:818-927): tokens → CNNFeatureExtractor → same
    # encoder/graph/classifier pipeline
    vocab_size: int = 0
    embedding_dim: int = 300
    cnn_output_size: int = 100
    cnn_filters: int = 50
    cnn_kernel_sizes: tuple = (3, 4, 5)
    cnn_dropout: float = 0.5
    lstm_mode: str = "packed"  # 'unpacked' = reference-exact padded biRNN

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        if self.vocab_size:
            # NOT remat'd, deliberately: wrapping this in nn.remat was
            # measured SLOWER (2 452 vs 2 816 dia/s, B=32) — unlike the
            # DAG-ERC/MMGCN scan bodies, the recompute here re-pays the
            # [B·L·W] embedding gather, which the xplane trace shows is
            # the expensive part (f32[vocab,E] table traffic)
            x = CNNFeatureExtractor(
                self.vocab_size, self.embedding_dim, self.cnn_output_size,
                self.cnn_filters, self.cnn_kernel_sizes, self.cnn_dropout,
                name="cnn_feat_extractor",
            )(batch["token_ids"], batch["attention_mask"], deterministic)
        else:
            x = batch["input_tensor"]
        mask = batch["attention_mask"]
        spk_ids = batch["speaker_ids"]
        lengths = batch["text_length"]
        L = x.shape[1]
        D_g, D_p = self.d_g, self.d_p
        qmask = jax.nn.one_hot(spk_ids, self.n_speakers, dtype=x.dtype) * mask[..., None]

        if self.base_model == "DialogRNN":
            f = DialogueRNNScan(
                self.input_size, D_g, D_p, self.hidden_size,
                dropout=self.dropout_rec, n_parties=self.n_speakers, name="dialog_rnn_f",
            )(x, qmask, mask, deterministic)
            xr = reverse_padded(x, mask)
            qr = reverse_padded(qmask, mask)
            b = DialogueRNNScan(
                self.input_size, D_g, D_p, self.hidden_size,
                dropout=self.dropout_rec, n_parties=self.n_speakers, name="dialog_rnn_r",
            )(xr, qr, mask, deterministic)
            b = reverse_padded(b, mask)
            emotions = jnp.concatenate([f, b], -1)
        elif self.base_model in ("LSTM", "GRU"):
            # 'unpacked': all-ones mask runs the recurrence over every
            # padded step, reproducing the reference's pack-free biRNN
            # (dgcnv2_models.py:160-163) — see DGCNV2Params.lstm_mode
            rnn_mask = mask if self.lstm_mode == "packed" else jnp.ones_like(mask)
            emotions = BiRNN(
                hidden_size=self.hidden_size, num_layers=2,
                cell=self.base_model.lower(), bidirectional=True,
                dropout=self.drop_rate, name="rnn",
            )(x, rnn_mask, deterministic=deterministic)
        else:  # 'None'
            emotions = nn.Dense(2 * self.hidden_size, name="base_linear")(x)

        edge_norm = MaskedEdgeAttentionDense(
            2 * self.hidden_size, self.max_seq_len, self.wp, self.wf, name="att_model"
        )(emotions, lengths)
        adj = graphs.window_adjacency(lengths, L, self.wp, self.wf)
        rel = graphs.relation_ids(spk_ids, self.n_speakers)

        g = DenseRGCN(
            self.graph_hidden_size, 2 * self.n_speakers**2, num_bases=30,
            aggr="add", name="conv1",
        )(emotions, adj, rel, edge_norm=edge_norm)
        g = DenseGraphConv(self.graph_hidden_size, name="conv2")(g, adj)
        em = jnp.concatenate([emotions, g], -1)  # [B, L, 300]

        # nodal attention: MatchingAttention 'general2' over all valid nodes
        D = em.shape[-1]
        mt_w = self.param("matchatt_w", _uniform_init(1.0 / jnp.sqrt(D)), (D, D))
        mt_b = self.param("matchatt_b", _uniform_init(1.0 / jnp.sqrt(D)), (D,))
        xq = em @ mt_w.T + mt_b
        scores = jnp.tanh(jnp.einsum("bqd,bkd->bqk", xq, em * mask[:, :, None]) * mask[:, None, :])
        alpha = jax.nn.softmax(scores, -1) * mask[:, None, :]
        alpha = alpha / jnp.maximum(alpha.sum(-1, keepdims=True), 1e-10)
        att_em = jnp.einsum("bqk,bkd->bqd", alpha, em)

        h = nn.relu(nn.Dense(self.graph_hidden_size, name="linear")(att_em))
        if not deterministic and self.drop_rate > 0:
            h = nn.Dropout(0.5)(h, deterministic=False)
        return nn.Dense(self.n_classes, name="smax_fc")(h)


class DailyBatcher:
    """Token-dialogue batcher for the DailyDialog track: pads to
    [B, L, n_words] int token ids + the standard mask/speaker/label keys."""

    def __init__(self, n_words: int = 50, max_len: int = 110, pad_batch_to=None):
        self.n_words = n_words
        self.max_len = max_len
        self.pad_batch_to = pad_batch_to

    def __call__(self, samples):
        import numpy as np

        B = len(samples)
        Bp = self.pad_batch_to or B
        lens = np.array([min(len(s["label"]), self.max_len) for s in samples], np.int32)
        L = self.max_len  # static shape: one compiled program per run
        W = self.n_words
        tok = np.zeros((Bp, L, W), np.int32)
        spk = np.zeros((Bp, L), np.int32)
        label = np.full((Bp, L), -1, np.int32)
        mask = np.zeros((Bp, L), np.float32)
        for i, s in enumerate(samples):
            ln = lens[i]
            for j in range(ln):
                row = np.asarray(s["tokens"][j], np.int32)[:W]
                tok[i, j, : len(row)] = row
            spk[i, :ln] = np.asarray(s["speakers"], np.int32)[:ln]
            label[i, :ln] = np.asarray(s["label"], np.int32)[:ln]
            mask[i, :ln] = 1.0
        lens_p = np.zeros(Bp, np.int32)
        lens_p[: len(lens)] = lens
        return {
            "token_ids": tok,
            "attention_mask": mask,
            "speaker_ids": spk,
            "speaker_tensor": spk,
            "text_length": lens_p,
            "label": label,
            "input_tensor": None,
        }


from erc_tpu.data.synthetic import synthetic_daily  # noqa: E402 (re-export)


class DGCNV2Trainer(Trainer):
    def imodels(self, params: ParamsType):
        self.model = DGCNV2Module(
            base_model=params.base_model,
            input_size=params.hidden_all,
            hidden_size=params.hidden_size,
            n_speakers=params.n_speakers,
            wp=params.wp,
            wf=params.wf,
            n_classes=params.n_classes,
            max_seq_len=int(params.max_seq_len),
            d_g=int(params.get("d_g", 150)),
            d_p=int(params.get("d_p", 150)),
            lstm_mode=params.get("lstm_mode", "packed"),
        )
        self.tx = optim_factory.build_optim(params.optim)
        if params.get("loss_weights", True) and params.n_classes == 6:
            self.class_weights = jnp.asarray(IEMOCAP6_LOSS_WEIGHTS, jnp.float32)


main = partial(_main, DGCNV2Trainer, DGCNV2Params)


class DGCNV2DailyParams(DGCNV2Params):
    def __init__(self):
        super().__init__()
        # real corpus: dailydialog-token-7 (data/dailydialog.py reader);
        # synthetic-daily-token-7 generates token dialogues in-memory
        self.dataset = "dailydialog-token-7"
        self.vocab_size = 20000
        self.n_words = 50
        self.embedding_dim = 300


class DGCNV2DailyTrainer(Trainer):
    """DailyDialog track: CNNFeatureExtractor over token ids feeding the
    dgcnv2 graph pipeline (reference DialogueGCN_DailyModel)."""

    def imodels(self, params):
        self.model = DGCNV2Module(
            base_model=params.base_model,
            input_size=100,  # = cnn_output_size (dgcnv2_models.py:833)
            hidden_size=params.hidden_size,
            n_speakers=params.n_speakers,
            wp=params.wp,
            wf=params.wf,
            n_classes=params.n_classes,
            max_seq_len=int(params.max_seq_len),
            vocab_size=int(params.vocab_size),
            embedding_dim=int(params.embedding_dim),
            d_g=int(params.get("d_g", 150)),
            d_p=int(params.get("d_p", 150)),
            lstm_mode=params.get("lstm_mode", "packed"),
        )
        self.tx = optim_factory.build_optim(params.optim)

    def _daily_batcher(self, batch_size):
        data_axis = self.mesh.devices.shape[0]
        pad_to = -(-int(batch_size) // data_axis) * data_axis
        return DailyBatcher(
            n_words=int(self.params.n_words),
            max_len=int(self.params.get("max_seq_len", 110)),
            pad_batch_to=pad_to,
        )

    def make_loader(self, split):
        from erc_tpu.data.loader import DialogueLoader
        from erc_tpu.data.registry import get_root, pick_datas

        p = self.params
        # resolve through the registry like every other trainer: real
        # dumps raise a helpful error when absent; only synthetic-* names
        # generate in-memory data (advisor r2 finding)
        root = p.get("data_root") or get_root(p.dataset)
        kw = {"vocab_size": int(p.vocab_size)}
        if p.dataset.startswith("synthetic-"):
            # synthetic corpus size is tunable (tests/benchmarks); real
            # readers reject unknown kwargs loudly, so only pass it here
            kw["n_train"] = int(p.get("synthetic_n_train", 24))
        samples = pick_datas(root, p.dataset, split=split, **kw)
        bs = int(p.train.batch_size if split == "train" else p.test.batch_size)
        return DialogueLoader(
            samples, self._daily_batcher(bs), batch_size=bs,
            shuffle=(split == "train"), seed=p.seed,
        )

    def example_batch(self, L: int = 12, B: int = 2):
        samples = synthetic_daily(
            self.params.n_classes, "train", n_train=B, min_len=L, max_len=L,
            vocab=int(self.params.vocab_size),
        )
        return self._daily_batcher(B)(samples)


daily_main = partial(_main, DGCNV2DailyTrainer, DGCNV2DailyParams)
