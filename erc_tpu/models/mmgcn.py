"""MMGCN: Multimodal Fusion via Deep Graph Convolution Network.

TPU re-design of reference track_mm/mmgcn.py + mmgcn_models.py:
per-modality encoders (linear / linear+biLSTM) → speaker embedding on text
→ 3L×3L angular-similarity "big adjacency" (intra-modal blocks dense,
cross-modal diagonal) → 64-layer GCNII (variant, initial-residual α=0.1,
identity-map λ=0.5) → per-modality concat → linear head.

The reference flattens all dialogues into one big graph and runs
torch.spmm per layer (mmgcn_models.py:29); here the block-diagonal graph
stays in padded batch form [B, 3L, 3L] and the 64 layers run as one
``lax.scan`` of batched MXU matmuls (ops.gnn.GCNIIStack).

Note: MMGatedAttention / MaskedEdgeAttention are constructed but unused in
the reference forward path (mmgcn.py:92,76 vs :96-122); the compute path
here matches the executed reference graph.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
from flax import linen as nn

from erc_tpu.models.base import MMBaseParams
from erc_tpu.ops import graphs
from erc_tpu.ops.gnn import GCNIIStack
from erc_tpu.ops.rnn import BiRNN
from erc_tpu.train import optim as optim_factory
from erc_tpu.train.trainer import Trainer, main as _main


class MMGCNParams(MMBaseParams):
    def __init__(self):
        super().__init__()
        self.epoch = 60
        self.train.batch_size = 16
        self.test.batch_size = 16
        self.dataset = "iemocap-cogmen-6"
        self.optim = optim_factory.create_optim("Adam", lr=0.0003, weight_decay=3e-5)
        self.speaker_onehot = True
        self.batch_first = False
        self.graph_hidden_size = 200
        self.gcn_layers = 64
        self.drop_rate = 0.4
        # dense default since round 4: after the GCNII restructure (split
        # support matmul + rbg dropout + full remat) the [B,3L,3L] one-big-
        # matmul aggregation beats the block-structured form on the MXU
        # (B=32 L=96 on-chip: dense 1 830 train / 8 593 eval vs structured
        # 1 411 / 5 816 dia/s) — the 3× aggregation-FLOP saving no longer
        # pays once the step is dispatch/layout-bound, not FLOP-bound
        self.adj_impl = self.choice("dense", "structured")
        # 'full' chunked remat became the WINNER in round 4 (1 856 vs
        # 1 684 dia/s f32 at B=32): once dropout moved to the rbg PRNG and
        # the support matmul split landed, the forward recompute is cheaper
        # than streaming the per-layer residuals the no-remat form saves
        self.gcn_remat = self.choice("full", "off", "dots")
        # layers per scan trip (remat granularity = one trip; chunking
        # itself is always on).  Measured f32 B=32 on v5e: 8 is the winner
        # (see BENCH_MATRIX MMGCN section); exposed for sweeps because the
        # fwd-recompute vs trip-overhead balance moves with compute_dtype
        # and batch
        self.gcn_chunk = 8
        # 'packed' (default) masks the text biLSTM like torch packed
        # sequences; 'unpacked' reproduces the reference's executed graph
        # exactly — its lstm_l runs on the padded batch (mmgcn.py:69,115) so
        # the backward direction consumes padding (see PARITY.md for the
        # measured delta)
        self.lstm_mode = self.choice("packed", "unpacked")

    def iparams(self):
        super().iparams()
        if self.reimplement:
            if "iemocap" in self.dataset:
                self.optim.lr = 0.0003
                self.optim.weight_decay = 3e-5
            elif "meld" in self.dataset:
                self.optim.lr = 0.0001
                self.optim.weight_decay = 0


ParamsType = MMGCNParams


class MMGCNModule(nn.Module):
    hidden_text: int = 100
    hidden_audio: int = 100
    hidden_visual: int = 512
    n_speakers: int = 2
    n_classes: int = 7
    modals: str = "atv"
    n_dim: int = 200  # 2 * D_e
    graph_hidden_size: int = 200
    gcn_layers: int = 64
    drop_rate: float = 0.4
    use_speaker: bool = True
    adj_impl: str = "dense"
    gcn_remat: object = 'full'  # 'off'/False | 'full' | 'dots'
    gcn_chunk: int = 8  # layers per scan trip (= remat granularity)
    lstm_mode: str = "packed"  # 'unpacked' = reference-exact padded biLSTM

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        mask = batch["attention_mask"]
        spk_ids = batch["speaker_ids"]
        B, L = mask.shape

        def drop(t):
            if not deterministic and self.drop_rate > 0:
                return nn.Dropout(self.drop_rate)(t, deterministic=False)
            return t

        feats = {}
        if "a" in self.modals:
            feats["a"] = nn.Dense(self.n_dim, name="linear_a")(batch["audio_feature"])
        if "v" in self.modals:
            feats["v"] = nn.Dense(self.n_dim, name="linear_v")(batch["visual_feature"])
        if "t" in self.modals:
            t = nn.Dense(self.n_dim, name="linear_l")(batch["text_feature"])
            # 'unpacked': run the recurrence over every padded step (all-ones
            # mask) — the reference's lstm_l consumes padding in its backward
            # direction (mmgcn.py:69,115); 'packed' masks like torch packed
            # sequences (valid positions then independent of batch padding)
            rnn_mask = mask if self.lstm_mode == "packed" else jnp.ones_like(mask)
            t = BiRNN(
                hidden_size=100, num_layers=2, cell="lstm", bidirectional=True,
                dropout=self.drop_rate, name="lstm_l",
            )(t, rnn_mask, deterministic=deterministic)
            # speaker embedding added to text nodes (mmgcn_models.py:540-545)
            if self.use_speaker:
                spk_emb = nn.Embed(
                    self.n_speakers, self.n_dim,
                    embedding_init=nn.initializers.normal(1.0), name="speaker_embeddings",
                )(spk_ids)
                t = t + spk_emb * mask[..., None]
            feats["t"] = t

        order = [m for m in "avt" if m in self.modals]  # [a, v, l] order (ref)
        flist = [feats[m] for m in order]

        # adjacency: arccos near ±1 is precision-sensitive, so build it in
        # f32; aggregate in the compute dtype — a mixed f32-adj × bf16-h
        # einsum silently runs all 64 aggregation matmuls at the MXU's
        # f32-emulation rate (xplane-measured: the bf16 step's top spend)
        flist32 = [f.astype(jnp.float32) for f in flist]
        cdtype = flist[0].dtype

        if self.adj_impl == "structured":
            # block-sparse big adjacency: M dense blocks + diagonal cross
            # blocks (3× fewer aggregation FLOPs; numerically identical)
            intra, cross = graphs.mmgcn_structured_adjacency(flist32, mask)
            intra, cross = intra.astype(cdtype), cross.astype(cdtype)
            x = jnp.stack(flist, axis=1)  # [B, M, L, n_dim]
            x = drop(x)
            h = nn.relu(nn.Dense(self.graph_hidden_size, name="fc0")(x))
            from erc_tpu.ops.gnn import GCNIIStackStructured

            h = GCNIIStackStructured(
                nlayers=self.gcn_layers, nhidden=self.graph_hidden_size,
                lamda=0.5, alpha=0.1,
                dropout=self.drop_rate if not deterministic else 0.0,
                remat=self.gcn_remat, chunk=self.gcn_chunk, name="gcnii",
            )(h, intra, cross, deterministic=deterministic)
            h = drop(h)
            h = jnp.concatenate([x, h], -1)  # [B, M, L, n_dim + hidden]
            B, M, L, C = h.shape
            feat = jnp.moveaxis(h, 1, 2).reshape(B, L, M * C)
        else:
            adj = graphs.mmgcn_big_adjacency(flist32, mask).astype(cdtype)
            x = jnp.concatenate(flist, axis=1)  # [B, M*L, n_dim]

            # GCNII_lyc (mmgcn_models.py:373-394): drop → fc0+relu → convs → drop
            x = drop(x)
            h = nn.relu(nn.Dense(self.graph_hidden_size, name="fc0")(x))
            h = GCNIIStack(
                nlayers=self.gcn_layers, nhidden=self.graph_hidden_size,
                lamda=0.5, alpha=0.1,
                dropout=self.drop_rate if not deterministic else 0.0,
                remat=self.gcn_remat, chunk=self.gcn_chunk, name="gcnii",
            )(h, adj, deterministic=deterministic)
            h = drop(h)
            h = jnp.concatenate([x, h], -1)  # use_residue → [B, M*L, n_dim + hidden]

            # regroup modal chunks per utterance (mmgcn_models.py:571-576)
            chunks = jnp.split(h, len(order), axis=1)
            feat = jnp.concatenate(chunks, axis=-1)  # [B, L, M*(n_dim+hidden)]

        feat = drop(feat)
        feat = nn.relu(feat)
        return nn.Dense(self.n_classes, name="smax_fc")(feat)


class MMGCNTrainer(Trainer):
    def imodels(self, params: ParamsType):
        self.model = MMGCNModule(
            hidden_text=params.hidden_text,
            hidden_audio=params.hidden_audio,
            hidden_visual=params.hidden_visual,
            n_speakers=params.n_speakers,
            n_classes=params.n_classes,
            modals=params.modality,
            graph_hidden_size=params.graph_hidden_size,
            gcn_layers=params.gcn_layers,
            drop_rate=params.drop_rate,
            adj_impl=params.adj_impl,
            gcn_remat=params.get("gcn_remat", "full"),
            gcn_chunk=int(params.get("gcn_chunk", 8)),
            lstm_mode=params.get("lstm_mode", "packed"),
        )
        self.tx = optim_factory.build_optim(params.optim)


main = partial(_main, MMGCNTrainer, MMGCNParams)
