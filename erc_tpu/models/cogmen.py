"""COGMEN: COntextualized GNN based Multimodal Emotion recognitioN.

TPU re-design of reference track_mm/cogmen.py:
  transformer context encoder → windowed speaker-relation graph →
  RGCN + graph-transformer conv → MLP head.

Graph construction is the dense masked formulation (ops.graphs) instead of
batch_graphify's per-dialogue python loops (cogmen_utils.py:109-144); the
RGCN/TransformerConv run as batched [B, L, L] message passing (ops.gnn).

Reference parity notes:
- head search: first h in [6, num_heads) dividing input_size (cogmen.py:87-92)
- encoder_mode: the reference's encoder loop (cogmen.py:146-147) applies
  each module of self.rnn to the *original* input, so the transformer
  output is discarded and node features are Linear(input).  The measured
  parity numbers (wF1 0.8113/0.6112, cogmen.py:6-14) were produced with
  that behavior, so ``encoder_mode='reference'`` (the default) reproduces
  it exactly; ``encoder_mode='chained'`` runs the transformer → linear
  pipeline the paper/upstream intended.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
from flax import linen as nn

from erc_tpu.models.base import MMBaseParams
from erc_tpu.ops import graphs
from erc_tpu.ops.attention import TransformerEncoder
from erc_tpu.ops.gnn import DenseRGCN, DenseTransformerConv
from erc_tpu.ops.gnn_banded import BandedRGCN, BandedTransformerConv
from erc_tpu.ops.norm import MaskedBatchNorm
from erc_tpu.train import optim as optim_factory
from erc_tpu.train.trainer import Trainer, main as _main


class COGMENParams(MMBaseParams):
    def __init__(self):
        super().__init__()
        self.train.batch_size = 32
        self.val.batch_size = 32
        self.test.batch_size = 32

        self.num_heads = 17
        self.dataset = "iemocap-cogmen-6"
        self.epoch = 55
        self.optim = optim_factory.create_optim("Adam", lr=0.0001, weight_decay=1e-8)
        self.wp = 5
        self.wf = 5
        self.hidden_size = 100
        self.drop_rate = 0.5
        self.graph_impl = self.choice("auto", "dense", "banded")
        self.encoder_mode = self.choice("reference", "chained")


ParamsType = COGMENParams


def pick_num_heads(input_size: int, num_heads: int) -> int:
    """First h in [6, num_heads) dividing input_size (cogmen.py:87-92)."""
    for h in range(6, num_heads):
        if input_size % h == 0:
            return h
    raise AssertionError(f"no valid head count for input_size={input_size}")


class GNN(nn.Module):
    """RGCNConv → TransformerConv → BN → LeakyReLU (cogmen.py:61-74).

    graph_impl='banded' runs the window-exact Pallas band kernels
    (ops.gnn_banded, numerically identical — see test_gnn_banded);
    'dense' is the [B, L, L] masked formulation.
    """

    h1_dim: int
    h2_dim: int
    n_speakers: int = 2
    wp: int = 5
    wf: int = 5
    graph_impl: str = "banded"

    @nn.compact
    def __call__(self, x, speakers, lengths, mask, train: bool = False):
        num_relations = 2 * self.n_speakers**2
        # 'auto': dense — COGMEN train throughput for dense vs the banded
        # Pallas path flips run to run inside the ±10-15% tunnel noise
        # (matrix r2/r3 banded 4857/5007 vs dense 4532/4669; full-length
        # bench dense 5961 vs banded 5451), while banded is consistently
        # the better EVAL path (7366-10451 vs 3751-8196 dia/s).  Dense
        # stays the training default; pass --graph_impl=banded for
        # eval/serving-heavy workloads or L≫256.
        impl = self.graph_impl
        if impl == "auto":
            impl = "banded" if x.shape[1] > 256 else "dense"
        if impl == "banded":
            x = BandedRGCN(
                self.h1_dim, num_relations, self.n_speakers, self.wp, self.wf,
                aggr="mean", name="conv1",
            )(x, speakers, mask)
            x = BandedTransformerConv(self.h2_dim, self.wp, self.wf, name="conv2")(x, mask)
        else:
            L = x.shape[1]
            adj = graphs.window_adjacency(lengths, L, self.wp, self.wf)
            rel = graphs.relation_ids(speakers, self.n_speakers)
            x = DenseRGCN(self.h1_dim, num_relations, aggr="mean", name="conv1")(x, adj, rel)
            x = DenseTransformerConv(self.h2_dim, name="conv2")(x, adj)
        x = MaskedBatchNorm(self.h2_dim, name="bn")(x, mask, use_running_average=not train)
        return nn.leaky_relu(x, negative_slope=0.01)


class COGMENModule(nn.Module):
    input_size: int
    hidden_size: int
    num_head: int
    n_speakers: int
    n_classes: int
    wp: int = 5
    wf: int = 5
    drop_rate: float = 0.5
    graph_impl: str = "banded"
    encoder_mode: str = "reference"

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        x = batch["input_tensor"]
        mask = batch["attention_mask"]
        speakers = batch["speaker_ids"]
        lengths = batch["text_length"]
        L = x.shape[1]

        if self.encoder_mode == "chained":
            nhead = pick_num_heads(self.input_size, self.num_head)
            h = TransformerEncoder(
                self.input_size, nhead, num_layers=2, dropout=self.drop_rate, name="encoder"
            )(x, key_padding_mask=mask, deterministic=deterministic)
        else:
            # reference: `for mod in self.rnn: node_features = mod(input_tensor)`
            # (cogmen.py:146-147) — each applied to the ORIGINAL input, so
            # only the final Linear survives
            h = x
        h = nn.Dense(self.hidden_size, name="transformer_out")(h)

        g = GNN(
            self.hidden_size, self.hidden_size, self.n_speakers,
            wp=self.wp, wf=self.wf, graph_impl=self.graph_impl, name="gcn",
        )(h, speakers, lengths, mask, train=not deterministic)

        out = nn.Dense(100, name="cls_0")(g)
        out = nn.relu(out)
        if not deterministic and self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate)(out, deterministic=False)
        logits = nn.Dense(self.n_classes, name="cls_1")(out)
        return logits


class COGMENTrainer(Trainer):
    def imodels(self, params: ParamsType):
        self.model = COGMENModule(
            input_size=params.hidden_all,
            hidden_size=params.hidden_size,
            num_head=params.num_heads,
            n_speakers=params.n_speakers,
            n_classes=params.n_classes,
            wp=params.wp,
            wf=params.wf,
            drop_rate=params.drop_rate,
            graph_impl=params.graph_impl,
            encoder_mode=params.get("encoder_mode", "reference"),
        )
        self.tx = optim_factory.build_optim(params.optim)


main = partial(_main, COGMENTrainer, COGMENParams)
