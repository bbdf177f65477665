"""Round-2 fixes: prefetch error propagation, bucketed shuffle (no length
curriculum), multi-host strided batch slices, ReduceLROnPlateau wiring,
steps_per_call × length_bucket shape groups, AutoResume counters."""

import os

import numpy as np
import pytest


def _mk_samples(n, lens=None, dim=4):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        ln = int(lens[i]) if lens is not None else int(rng.integers(3, 12))
        out.append(
            {
                "id": i,
                "text": rng.normal(size=(ln, dim)).astype(np.float32),
                "audio": rng.normal(size=(ln, dim)).astype(np.float32),
                "visual": rng.normal(size=(ln, dim)).astype(np.float32),
                "label": list(rng.integers(0, 4, size=ln)),
                "speakers": list(rng.integers(0, 2, size=ln)),
            }
        )
    return out


def test_prefetch_propagates_exception():
    from erc_tpu.data.loader import PrefetchLoader

    class Boom:
        def __len__(self):
            return 3

        def __iter__(self):
            yield {"x": 1}
            raise RuntimeError("collate failed")

    it = iter(PrefetchLoader(Boom()))
    assert next(it) == {"x": 1}
    with pytest.raises(RuntimeError, match="collate failed"):
        next(it)


def test_loader_bucketed_shuffle_no_global_curriculum():
    from erc_tpu.data.loader import DialogueLoader

    lens = np.arange(4, 132)  # strictly increasing lengths, 128 samples
    samples = _mk_samples(len(lens), lens=lens)
    def mean_spread(batches):
        return np.mean(
            [np.ptp([len(samples[i]["label"]) for i in b]) for b in batches]
        )

    loader = DialogueLoader(
        samples, batcher=lambda s: s, batch_size=8, shuffle=True,
        sort_by_length=True, sort_chunk=8, seed=3,
        process_index=0, process_count=1,
    )
    plain = DialogueLoader(
        samples, batcher=lambda s: s, batch_size=8, shuffle=True,
        sort_by_length=False, seed=3, process_index=0, process_count=1,
    )
    for batches in (loader._batch_indices(), loader._batch_indices()):
        # full cover, no dup
        flat = np.concatenate(batches)
        assert sorted(flat.tolist()) == list(range(len(samples)))
        # batch-level max lengths must NOT be globally ascending (the old
        # stable-sort produced a strict short→long curriculum)
        maxes = [max(len(samples[i]["label"]) for i in b) for b in batches]
        assert maxes != sorted(maxes)
        # but within-batch length spread stays well under random batching
        assert mean_spread(batches) < 0.5 * mean_spread(plain._batch_indices())


def test_loader_multihost_strided_slices():
    from erc_tpu.data.loader import DialogueLoader

    samples = _mk_samples(32)

    def make(pidx):
        return DialogueLoader(
            samples, batcher=lambda s: [x["id"] for x in s], batch_size=8,
            shuffle=True, seed=7, process_index=pidx, process_count=2,
        )

    a, b = make(0), make(1)
    for ba, bb in zip(a, b):
        assert len(ba) == len(bb) == 4  # each host takes half the global batch
        assert not set(ba) & set(bb)  # disjoint
    # across both hosts each epoch covers every sample exactly once
    a2, b2 = make(0), make(1)
    seen = [i for ba, bb in zip(a2, b2) for i in list(ba) + list(bb)]
    assert sorted(seen) == list(range(32))


def test_plateau_reduces_lr_dagerc(tmp_path):
    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    from erc_tpu.models.dagerc import DAGERCParams, DAGERCTrainer
    from erc_tpu.train.optim import get_learning_rate

    p = DAGERCParams()
    p.dataset = "synthetic-cogmen-6"
    p.hidden_dim = 16
    p.gnn_layers = 1
    p.max_seq_len = 8
    p.train.batch_size = 4
    p.test.batch_size = 4
    p.iparams()
    tr = DAGERCTrainer(p)
    tr.initialize()
    lr0 = get_learning_rate(tr.state.opt_state)
    assert lr0 == pytest.approx(float(p.optim.lr))
    tr._plateau_step(1.0)  # best
    for _ in range(11):  # patience=10 torch-default → drop on the 12th
        tr._plateau_step(1.0)
    lr1 = get_learning_rate(tr.state.opt_state)
    assert lr1 == pytest.approx(lr0 * 0.1)


def test_steps_per_call_with_length_buckets(tmp_path):
    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    from erc_tpu.models.cogmen import COGMENParams, COGMENTrainer

    p = COGMENParams()
    p.dataset = "synthetic-cogmen-6"
    p.epoch = 1
    p.max_seq_len = 16
    p.length_bucket = 8  # mixed-shape batches
    p.steps_per_call = 2
    p.train.batch_size = 4
    p.test.batch_size = 4
    p.eval_per_epoch = 0
    p.iparams()
    tr = COGMENTrainer(p)
    tr.train()  # old code: np.stack raised on mixed-L groups
    assert tr.global_steps > 0


def test_bf16_compute_dtype_step(tmp_path):
    """--compute_dtype=bfloat16: fwd/bwd run in bf16, master params and
    optimizer state stay float32, loss is finite and close to the f32 run."""
    import jax
    import jax.numpy as jnp

    os.environ["ERC_TPU_EXPROOT"] = str(tmp_path)
    from erc_tpu.models.cogmen import COGMENParams, COGMENTrainer
    from erc_tpu.parallel import mesh as meshlib

    losses = {}
    for dt in ("float32", "bfloat16"):
        p = COGMENParams()
        p.dataset = "synthetic-cogmen-6"
        p.max_seq_len = 16
        p.train.batch_size = 8
        p.compute_dtype = dt
        p.iparams()
        tr = COGMENTrainer(p)
        tr.initialize()
        tr._build_step_fns()
        batch = tr.example_batch(L=16, B=8)
        sharded = meshlib.shard_batch(batch, tr.mesh)
        state, mets = tr._train_step_fn(tr.state, sharded, tr.rng.key("d", 0))
        losses[dt] = float(np.asarray(mets["Lall"]))
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32  # master weights stay f32
    assert np.isfinite(losses["bfloat16"])
    assert losses["bfloat16"] == pytest.approx(losses["float32"], rel=0.05)


def test_grouped_loader_grouping_and_flush():
    from erc_tpu.data.loader import GroupedLoader, stack_batches

    def mk(L, tag):
        return {"attention_mask": np.full((2, L), tag, np.float32), "none_key": None}

    class Fake:
        def __iter__(self):
            # 3 same-shape, shape change, 2 same-shape, tail single
            yield from [mk(4, 0), mk(4, 1), mk(4, 2), mk(6, 3), mk(6, 4), mk(4, 5)]

        def __len__(self):
            return 6

    items = list(GroupedLoader(Fake(), k=2))
    kinds = [k for _, k in items]
    # [g(0,1)], then 2 alone? no: 2 waits for a partner, 3 changes shape →
    # flush 2 as single; (3,4) group; 5 tail single
    assert kinds == [2, 1, 2, 1]
    g0, _ = items[0]
    assert g0["attention_mask"].shape == (2, 2, 4)
    np.testing.assert_array_equal(g0["attention_mask"][0], 0)
    np.testing.assert_array_equal(g0["attention_mask"][1], 1)
    assert g0["none_key"] is None
    assert items[1][0]["attention_mask"][0, 0] == 2  # flushed single
    assert items[3][0]["attention_mask"][0, 0] == 5  # tail single

    # stack_batches shared implementation
    s = stack_batches([mk(4, 7), mk(4, 8)])
    assert s["attention_mask"].shape == (2, 2, 4) and s["none_key"] is None


def test_prefetch_place_fn_applied():
    from erc_tpu.data.loader import PrefetchLoader

    class Fake:
        def __len__(self):
            return 2

        def __iter__(self):
            yield {"x": 1}
            yield {"x": 2}

    out = list(PrefetchLoader(Fake(), place_fn=lambda b: {"x": b["x"] * 10}))
    assert [b["x"] for b in out] == [10, 20]


def test_loader_batch_count_override():
    """reference LumoDataLoader batch_count: truncate or cycle the epoch."""
    from erc_tpu.data.loader import DialogueLoader

    samples = _mk_samples(16)
    kw = dict(batcher=lambda s: [x["id"] for x in s], batch_size=4,
              shuffle=False, process_index=0, process_count=1)
    short = DialogueLoader(samples, batch_count=2, **kw)
    assert len(short) == 2 and len(list(short)) == 2
    long = DialogueLoader(samples, batch_count=7, **kw)
    out = list(long)
    assert len(out) == 7
    assert out[4] == out[0]  # cycles deterministically (4 natural batches)


def test_prefetch_loader_early_stop_reaps_producer():
    """Breaking out of a PrefetchLoader mid-epoch must not leave the
    producer thread blocked forever on the bounded queue (ADVICE r2)."""
    import threading
    import time

    from erc_tpu.data.loader import PrefetchLoader

    class Slowless:
        def __iter__(self):
            for i in range(100):
                yield {"x": i}

        def __len__(self):
            return 100

    before = threading.active_count()
    it = iter(PrefetchLoader(Slowless(), depth=1))
    next(it)
    it.close()  # GeneratorExit path — finally must stop + join the producer
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= before
