"""Benchmark harness: training throughput of the flagship model (COGMEN)
on IEMOCAP-shaped dialogues, single chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference publishes no throughput numbers (BASELINE.md), so
the bar is the reference implementation's measured torch-CPU training
throughput on identical synthetic data (see ``--measure-baseline``, which
runs a faithful torch reimplementation of the COGMEN step).  The recorded
constant below was measured in this container.
"""

import argparse
import json
import sys
import time

# torch-CPU reference baseline, dialogues/sec, measured with
# `python bench.py --measure-baseline` in this container (bs=32, L~48,
# iemocap-cogmen-6 dims, COGMEN architecture).
TORCH_CPU_BASELINE_DPS = 14.0


def make_batches(batch_size, n_batches, max_len, seed=0):
    from erc_tpu.data.collate import ERCBatcher
    from erc_tpu.data.synthetic import synthetic_erc

    samples = synthetic_erc(
        "iemocap-cogmen", 6, "train", n_train=batch_size * n_batches,
        min_len=max(8, max_len - 32), max_len=max_len, seed=seed,
    )
    batcher = ERCBatcher("atv", 6, 2, max_len=max_len, pad_batch_to=batch_size)
    return [
        batcher(samples[i * batch_size : (i + 1) * batch_size])
        for i in range(n_batches)
    ]


MODEL_REGISTRY = {
    "cogmen": ("erc_tpu.models.cogmen", "COGMENParams", "COGMENTrainer"),
    "dgcn": ("erc_tpu.models.dgcn", "DGCNParams", "DGCNTrainer"),
    "mmgcn": ("erc_tpu.models.mmgcn", "MMGCNParams", "MMGCNTrainer"),
    "dagerc": ("erc_tpu.models.dagerc", "DAGERCParams", "DAGERCTrainer"),
    "cim": ("erc_tpu.models.cim", "CIMParams", "CIMTrainer"),
}


def bench_tpu(batch_size=32, max_len=96, steps=32, steps_per_call=8, graph_impl="dense",
              model="cogmen"):
    import importlib

    import jax

    from erc_tpu.parallel import mesh as meshlib

    mod_name, pcls, tcls = MODEL_REGISTRY[model]
    mod = importlib.import_module(mod_name)
    p = getattr(mod, pcls)()
    trainer_cls = getattr(mod, tcls)
    p.dataset = "synthetic-cogmen-6"
    p.train.batch_size = batch_size
    p.max_seq_len = max_len
    p.graph_impl = graph_impl
    p.steps_per_call = steps_per_call
    p.iparams()
    tr = trainer_cls(p)
    tr.initialize()
    tr._build_step_fns()

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from erc_tpu.train.trainer import _stack_batches

    K = max(steps_per_call, 1)
    batches = make_batches(batch_size, K, max_len)
    if K == 1:
        sharded = meshlib.shard_batch(batches[0], tr.mesh)
        fn = lambda st, i: tr._train_step_fn(st, sharded, tr.rng.key("d", i))
        per_call = 1
    else:
        sh = NamedSharding(tr.mesh, PartitionSpec(None, "data"))
        stacked = {
            k: (jax.device_put(v, sh) if v is not None else None)
            for k, v in _stack_batches(batches).items()
        }
        keys = jnp.stack([tr.rng.key("d", i) for i in range(K)])
        fn = lambda st, i: tr._multi_step_fn(st, stacked, keys)
        per_call = K

    # warmup / compile
    state = tr.state
    for i in range(2):
        state, mets = fn(state, i)
    jax.block_until_ready(state.params)

    n_calls = max(steps // per_call, 1)
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, mets = fn(state, 100 + i)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    return batch_size * n_calls * per_call / dt


def bench_torch_baseline(batch_size=32, max_len=96, steps=10):
    """Reference-equivalent COGMEN train step in torch on CPU.

    Mirrors track_mm/cogmen.py:94-195: 2-layer transformer encoder →
    linear → edge-list RGCN/graph-attention (dense emulation at equal
    FLOPs) → MLP; Adam step on cross-entropy.
    """
    import numpy as np
    import torch
    from torch import nn

    torch.set_num_threads(max(torch.get_num_threads(), 8))
    B, L, D, H, C, S = batch_size, max_len, 712, 100, 6, 2
    R = 2 * S * S

    enc_layer = nn.TransformerEncoderLayer(D, 8, dropout=0.5, batch_first=True)
    model = nn.ModuleDict(
        dict(
            encoder=nn.TransformerEncoder(enc_layer, 2),
            proj=nn.Linear(D, H),
            rgcn_root=nn.Linear(H, H),
            tconv=nn.ModuleDict(
                dict(q=nn.Linear(H, H), k=nn.Linear(H, H), v=nn.Linear(H, H), s=nn.Linear(H, H))
            ),
            bn=nn.BatchNorm1d(H),
            cls=nn.Sequential(nn.Linear(H, H), nn.ReLU(), nn.Dropout(0.5), nn.Linear(H, C)),
        )
    )
    rgcn_w = nn.Parameter(torch.randn(R, H, H) * 0.05)
    opt = torch.optim.Adam(list(model.parameters()) + [rgcn_w], lr=1e-4, weight_decay=1e-8)

    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.normal(size=(B, L, D)).astype("float32"))
    y = torch.from_numpy(rng.integers(0, C, (B, L)))
    spk = torch.from_numpy(rng.integers(0, S, (B, L)))
    idx = torch.arange(L)
    win = ((idx[None, :] - idx[:, None]).abs() <= 5).float()[None].repeat(B, 1, 1)
    rel = (2 * (spk[:, :, None] * S + spk[:, None, :]) + (idx[:, None] >= idx[None, :]).long()[None])

    def step():
        h = model["encoder"](x)
        h = model["proj"](h)
        agg = torch.zeros_like(h)
        for r in range(R):
            a_r = win * (rel == r)
            cnt = a_r.sum(1).clamp(min=1.0)
            agg = agg + torch.einsum("buv,bud->bvd", a_r / cnt[:, None, :], h @ rgcn_w[r])
        g = agg + model["rgcn_root"](h)
        q, k, v = model["tconv"]["q"](g), model["tconv"]["k"](g), model["tconv"]["v"](g)
        sc = torch.einsum("bvd,bud->buv", q, k) / (H**0.5)
        sc = sc.masked_fill(win == 0, -1e30)
        al = torch.softmax(sc, 1)
        g = torch.einsum("buv,bud->bvd", al, v) + model["tconv"]["s"](g)
        g = torch.nn.functional.leaky_relu(model["bn"](g.reshape(-1, H)).reshape(B, L, H))
        logits = model["cls"](g)
        loss = torch.nn.functional.cross_entropy(logits.reshape(-1, C), y.reshape(-1))
        opt.zero_grad()
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure-baseline", action="store_true")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--max-len", type=int, default=96)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--graph-impl", default="dense", choices=["banded", "dense"])
    ap.add_argument("--steps-per-call", type=int, default=8)
    ap.add_argument("--model", default="cogmen", choices=list(MODEL_REGISTRY))
    args = ap.parse_args()

    if args.measure_baseline:
        dps = bench_torch_baseline(args.batch_size, args.max_len)
        print(json.dumps({"metric": "cogmen_train_torch_cpu", "value": round(dps, 2),
                          "unit": "dialogues/s"}))
        return

    dps = bench_tpu(args.batch_size, args.max_len, args.steps, args.steps_per_call, args.graph_impl, args.model)
    print(
        json.dumps(
            {
                "metric": f"{args.model}_train_throughput",
                "value": round(dps, 2),
                "unit": "dialogues/s/chip",
                "vs_baseline": round(dps / TORCH_CPU_BASELINE_DPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
