"""The train loop: single-jit functional step over a device mesh.

Re-design of the reference's Trainer (lumo/trainer/trainer.py:37-676) and
MMBaseTrainer (track_mm/mmbase.py:132-341).  The reference's reflective
callback wrapping (base.py:110-155) is replaced by explicit hook points;
DDP/accelerate by NamedSharding over the ``data`` mesh axis; the mutable
train step by a pure ``(state, batch, step) -> (state, metrics)`` function
compiled once per length bucket.

Subclass contract (mirrors the reference's per-model trainers):
    imodels(params)       — build self.model (flax module), self.tx (optax)
    loss_and_metrics(...) — per-model loss; default is masked CE + Acc
    to_logits(vars,batch) — eval-time logits [B, L, C]
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from erc_tpu.core.experiment import Experiment
from erc_tpu.core.logger import Logger
from erc_tpu.core.meter import Meter, Record
from erc_tpu.core.metrics_db import BestMetrics, MetricBoard, PredictionStore
from erc_tpu.core.seed import RngPool
from erc_tpu.data.collate import ERCBatcher
from erc_tpu.data.loader import DialogueLoader
from erc_tpu.data.registry import get_root, pick_datas
from erc_tpu.parallel import mesh as meshlib
from erc_tpu.train import metrics as metrics_mod
from erc_tpu.train.checkpoint import Saver


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    model_state: Any  # batch_stats etc.
    step: jnp.ndarray
    ema_params: Any = None  # EMA shadow (mmin: lumo.contrib EMA α=0.999)


# one stacking implementation for the codebase (loader owns it; bench and
# tests import it from here for historical reasons)
from erc_tpu.data.loader import stack_batches as _stack_batches  # noqa: E402




def cast_floats(tree, dtype):
    """Cast float arrays of a pytree (params / batch) to a compute dtype.

    Also UPcasts: a batch shipped over the host link in bfloat16
    (``--transfer_dtype=bfloat16``) is restored to the compute dtype at
    step entry, so transfer precision and compute precision are
    independent knobs.  Same-dtype leaves pass through untouched."""
    dtype = jnp.dtype(dtype or "float32")

    def c(x):
        if (
            hasattr(x, "dtype")
            and jnp.issubdtype(x.dtype, jnp.floating)
            and x.dtype != dtype
        ):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(c, tree)


def masked_cross_entropy(logits, labels, mask, class_weights=None):
    """Mean CE over valid positions == F.cross_entropy on mask-selected nodes.

    With class weights, torch divides by the summed weight of the targets
    (reference: dgcn.py:124 semantics of F.cross_entropy(weight=...)).
    Always reduces in float32 (bf16 compute_dtype casts back here).
    """
    logits = logits.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    safe_labels = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, -1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], -1)[..., 0]
    if class_weights is not None:
        w = class_weights[safe_labels] * mask
        return (nll * w).sum() / jnp.maximum(w.sum(), 1e-8)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def masked_accuracy(logits, labels, mask):
    pred = logits.argmax(-1)
    hit = (pred == labels) * mask.astype(jnp.float32)
    return hit.sum() / jnp.maximum(mask.sum(), 1.0)


class Trainer:
    """Generic ERC trainer; one subclass per model family."""

    def __init__(self, params, exp_name: Optional[str] = None):
        from erc_tpu.parallel.cache import enable_persistent_cache

        enable_persistent_cache()
        # MXU-native bf16 matmul passes: ~2-3× over float32's multi-pass
        # emulation at ERC model scales; set --matmul_precision=highest for
        # bit-strict parity runs
        prec = params.get("matmul_precision", "bfloat16")
        if prec:
            jax.config.update("jax_default_matmul_precision", prec)
        if params.get("debug_nans"):
            # compiler-level NaN checking (SURVEY §5.2 sanitizer story);
            # heavier than the NaNGuard callback but pinpoints the op
            jax.config.update("jax_debug_nans", True)
        self.params = params
        self.logger = Logger()
        self.rng = RngPool(params.seed)
        # multi-process runs must share one test dir: derive the name on
        # process 0 and broadcast (replaces the reference's ppid flag-file
        # handshake, exp/experiment.py:72-88)
        test_name = None
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            payload = np.zeros(64, np.uint8)
            if meshlib.is_main_process():
                b = Experiment.make_test_name().encode()
                # a silent truncation would desynchronize run dirs across hosts
                assert len(b) <= len(payload), f"test_name too long for broadcast: {b!r}"
                payload[: len(b)] = np.frombuffer(b, np.uint8)
            payload = np.asarray(multihost_utils.broadcast_one_to_all(payload))
            test_name = bytes(payload).rstrip(b"\x00").decode()
        self.exp = Experiment(exp_name or f"erc_tpu.{type(self).__name__}", test_name=test_name)
        self.exp.record_start()
        self.logger.add_log_dir(self.exp.test_dir)
        # only process 0 writes run artifacts: multi-process runs share one
        # test dir (broadcast above), so concurrent writers would corrupt
        # checkpoints and duplicate board rows.  Decisions that read these
        # stores stay identical everywhere — eval state is allgathered first.
        writer = meshlib.is_main_process()
        self.database = BestMetrics(self.exp.test_file("metrics.json"), write=writer)
        self.metric_board = MetricBoard(self.exp.test_file("board.jsonl"), write=writer)
        self.pred_info = PredictionStore(self.exp.blob_file("predictions.jsonl"), write=writer)
        self.saver = Saver(self.exp.blob_file("", "saver") or self.exp.blob_dir + "/saver",
                           write=writer)
        self.mesh = meshlib.make_mesh()
        self.callbacks: List[Any] = []

        self.model = None
        self.tx = None
        self.state: Optional[TrainState] = None
        self.eidx = 0
        self.global_steps = 0
        self._train_step_fn = None
        self._eval_fn = None
        self.class_weights = None
        self.stopped = False

        params.to_yaml(self.exp.test_file("params.yaml"))

    # ------------------------------------------------------------------ setup
    def imodels(self, params):
        raise NotImplementedError

    def example_batch(self, L: int = 32, B: int = 2) -> Dict[str, np.ndarray]:
        """Shape-only batch for init (dims from the dataset grammar)."""
        from erc_tpu.data.synthetic import synthetic_erc

        p = self.params
        dims = p.modality_dims()
        samples = synthetic_erc(
            "custom", p.n_classes, "train", n_train=B, min_len=L, max_len=L,
            text_dim=p.hidden_text, audio_dim=p.hidden_audio, visual_dim=p.hidden_visual,
        )
        for s in samples:
            s["speakers"] = [
                np.eye(max(p.n_speakers, 1), dtype=int)[i % max(p.n_speakers, 1)].tolist()
                for i in range(len(s["label"]))
            ]
        return self.batcher()(samples)

    def batcher(self, batch_size: Optional[int] = None) -> ERCBatcher:
        p = self.params
        pad_to = None
        if batch_size is not None:
            # pad the batch dim to a multiple of the data axis so every
            # batch (incl. the last partial one) shards evenly; padded
            # dialogues have attention_mask == 0 and drop out of loss/metrics.
            # Multi-host: the loader yields per-process strided slices, so
            # each process pads to its 1/process_count share of the global pad
            data_axis = self.mesh.devices.shape[0]
            pad_to = -(-int(batch_size) // data_axis) * data_axis
            pad_to //= max(jax.process_count(), 1)
        return ERCBatcher(
            modality=p.modality,
            n_classes=p.n_classes,
            n_speakers=p.n_speakers,
            speaker_onehot=bool(p.get("speaker_onehot", False)),
            bucket=p.get("length_bucket", 0),
            max_len=p.get("max_seq_len", 128),
            pad_batch_to=pad_to,
        )

    def initialize(self):
        if self.state is not None:
            return
        self.imodels(self.params)
        batch = self.example_batch()
        # jit the init: one compiled program instead of hundreds of tiny
        # dispatches (50s → ~5s on the TPU remote-compile path)
        init_fn = jax.jit(partial(self.model.init, deterministic=True))
        variables = init_fn(
            {"params": self.rng.key("init"), "dropout": self.rng.key("init_drop")}, batch
        )
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        opt_state = self.tx.init(params)
        self.state = TrainState(
            params=params, opt_state=opt_state, model_state=model_state,
            step=jnp.zeros((), jnp.int32),
        )
        # params (and their opt-state moments) may shard over 'model';
        # everything else replicates — pure DP when model axis is 1
        self.state = meshlib.replicate(self.state, self.mesh)
        if dict(zip(self.mesh.axis_names, self.mesh.devices.shape)).get("model", 1) > 1:
            sharded = meshlib.shard_params(self.state.params, self.mesh)
            # re-init optimizer on the sharded params so moments co-shard
            self.state = self.state.replace(params=sharded, opt_state=self.tx.init(sharded))
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        self.logger.info(
            f"model {type(self.model).__name__}: {n_params/1e6:.3f}M params, "
            f"mesh {dict(zip(self.mesh.axis_names, self.mesh.devices.shape))}"
        )

    # ------------------------------------------------------------- loss logic
    def loss_and_metrics(self, variables, batch, rng, train: bool):
        """Default: masked CE + accuracy (cogmen.py:179-195 semantics)."""
        mutable = ["batch_stats"] if train else []
        out = self.model.apply(
            variables, batch, deterministic=not train,
            rngs={"dropout": rng}, mutable=mutable,
        )
        if train:
            logits, new_model_state = out
        else:
            logits, new_model_state = out, {}
        if isinstance(logits, tuple):
            logits = logits[0]
        mask = batch["attention_mask"]
        loss = masked_cross_entropy(logits, batch["label"], mask, self.class_weights)
        mets = {"Lall": loss, "Acc": masked_accuracy(logits, batch["label"], mask)}
        return loss, (mets, new_model_state)

    def to_logits(self, variables, batch):
        out = self.model.apply(variables, batch, deterministic=True)
        if isinstance(out, tuple):
            out = out[0]
        return out

    # --------------------------------------------------------------- jit fns
    def _make_raw_train_step(self):
        tx = self.tx
        # bf16 compute: params/batch cast to bf16 for fwd+bwd (activations
        # at half the HBM traffic), master params + grads + optimizer stay
        # f32, losses reduce in f32 (see masked_cross_entropy)
        cdtype = self.params.get("compute_dtype", "float32")

        def train_step(state: TrainState, batch, key):
            batch_c = cast_floats(batch, cdtype)

            def lf(p):
                variables = {"params": cast_floats(p, cdtype), **state.model_state}
                return self.loss_and_metrics(variables, batch_c, key, train=True)

            (loss, (mets, new_model_state)), grads = jax.value_and_grad(
                lf, has_aux=True
            )(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=new_params,
                opt_state=new_opt,
                model_state=new_model_state if new_model_state else state.model_state,
                step=state.step + 1,
            )
            mets = dict(mets)
            mets["gnorm"] = optax.global_norm(grads)
            return new_state, mets

        return train_step

    def _install_eval_step(self, eval_step):
        """Jit both eval entry points from ONE single-batch step function:
        `_eval_fn` (one dispatch per batch) and `_multi_eval_fn` (K batches
        scanned per dispatch — eval compute is tiny while a tunnel-attached
        host pays ~8 ms dispatch per call, so steps_per_call amortizes eval
        exactly like train; logits come back stacked [K, ...] and are
        fetched in one round-trip).  Subclasses that replace the eval step
        (e.g. mmin's EMA logit pair) MUST install through here so the
        scanned path scans the same step."""
        inner = eval_step

        def eval_step(state, batch):  # noqa: F811 — upcast-wrapped
            # eval always computes in f32 (master params); restore a
            # bf16-transferred batch at entry (no-op for f32 batches)
            return inner(state, cast_floats(batch, "float32"))

        self._eval_fn = jax.jit(eval_step)

        def multi_eval(state: TrainState, stacked_batches):
            def body(carry, batch_k):
                return carry, eval_step(state, batch_k)

            # state is a scan constant; no donation — eval must not
            # consume the live TrainState
            return jax.lax.scan(body, None, stacked_batches)[1]

        self._multi_eval_fn = jax.jit(multi_eval)

    def _build_step_fns(self):
        def eval_step(state: TrainState, batch):
            variables = {"params": state.params, **state.model_state}
            return self.to_logits(variables, batch)

        raw = self._make_raw_train_step()
        self._train_step_fn = jax.jit(raw, donate_argnums=0)
        self._install_eval_step(eval_step)

        # multi-step: scan K steps inside one dispatch.  At ERC model sizes
        # a step is ~1 ms of compute, so per-dispatch host latency dominates
        # (measured: 8-step scan = 9.3× single-step throughput on v5e).
        def multi_step(state: TrainState, stacked_batches, keys):
            def body(s, xk):
                batch_k, key = xk
                s2, mets = raw(s, batch_k, key)
                return s2, mets

            return jax.lax.scan(body, state, (stacked_batches, keys))

        self._multi_step_fn = jax.jit(multi_step, donate_argnums=0)

    # ------------------------------------------------------------------ data
    def make_loader(self, split: str) -> DialogueLoader:
        """Raw batch loader for a split; subclasses override freely — the
        grouping/prefetch/placement pipeline is applied by train()/test()
        via _pipeline_* so every trainer gets it."""
        p = self.params
        root = p.get("data_root") or get_root(p.dataset)
        samples = pick_datas(root, p.dataset, split=split)
        bs = p.train.batch_size if split == "train" else p.test.batch_size
        bc = p.get("batch_count")
        return DialogueLoader(
            samples,
            self.batcher(int(bs)),
            batch_size=int(bs),
            shuffle=(split == "train"),
            seed=p.seed,
            sort_by_length=bool(p.get("sort_by_length", True)),
            sort_chunk=int(p.get("sort_chunk", 8)),
            batch_count=(int(bc) if bc and split == "train" else None),
        )

    def _transfer_cast(self, loader):
        """--transfer_dtype=bfloat16: quantize f32 batch arrays before
        grouping/placement so the host link ships half the bytes; the
        jitted steps upcast to compute precision at entry (cast_floats)."""
        from erc_tpu.data.loader import MappedLoader, transfer_cast_fn

        cast = transfer_cast_fn(self.params.get("transfer_dtype", "float32"))
        return MappedLoader(loader, cast) if cast else loader

    def _pipeline(self, loader, spc: int):
        """Shared loader pipeline: transfer-dtype cast → K-step grouping →
        producer-thread stacking + device placement (host→HBM transfer
        overlaps the previous dispatch's compute)."""
        p = self.params
        loader = self._transfer_cast(loader)
        spc = max(int(spc), 1)
        if spc > 1:
            from erc_tpu.data.loader import GroupedLoader

            loader = GroupedLoader(loader, spc)
        if p.get("prefetch", True):
            from erc_tpu.data.loader import PrefetchLoader

            if spc > 1:
                place = lambda item: (
                    meshlib.shard_batch(item[0], self.mesh, scan_dim=item[1] > 1),
                    item[1],
                )
            else:
                place = lambda b: meshlib.shard_batch(b, self.mesh)
            loader = PrefetchLoader(loader, place_fn=place)
        return loader

    def _pipeline_train(self, loader):
        return self._pipeline(loader, self.params.get("steps_per_call", 1))

    def _pipeline_eval(self, loader):
        """Forward-only stages group independently: --eval_steps_per_call
        overrides steps_per_call (0 = inherit) to feed the multi-eval scan
        (K batches per dispatch)."""
        p = self.params
        return self._pipeline(
            loader, p.get("eval_steps_per_call", 0) or p.get("steps_per_call", 1)
        )

    # ----------------------------------------------------------------- hooks
    def icallbacks(self, params):
        """Install default callbacks (reference: icallbacks mmbase.py:134-142).

        Config-driven extras:
          --checkpoint_per_epoch=N  rotating epoch checkpoints
          --resume                  auto-resume from latest checkpoint
          --nan_guard               abort+checkpoint on non-finite loss
          --tensorboard / --wandb   metric exporters
          --remote_url=http://...   HTTP metric POST
        """
        from erc_tpu.train import callbacks as cbs

        cbs.StopByCode().hook(self)
        cbs.KeyErrorSave().hook(self)
        cbs.FinalReport().hook(self)
        if params.get("eval_first"):
            cbs.EvalFirst().hook(self)
        # lumo gates the generic auto-load on BOTH knobs with `pretrain`
        # defaulting False (callbacks.py:588-602) — the mmin trainers set
        # only pretrain_path and give it their own warm-start semantics
        # (frozen encoder / netB), which must NOT also whole-state load
        if params.get("pretrain", False) and params.get("pretrain_path"):
            cbs.AutoLoadModel().hook(self)
        if params.get("checkpoint_per_epoch"):
            cbs.EpochCheckpoint(int(params.get("checkpoint_per_epoch"))).hook(self)
        if params.get("checkpoint_per_step"):
            cbs.GlobalStepCheckpoint(int(params.get("checkpoint_per_step"))).hook(self)
        if params.get("keypoint_per_epoch"):
            cbs.KeypointCheckpoint(int(params.get("keypoint_per_epoch"))).hook(self)
        if params.get("resume"):
            cbs.AutoResume().hook(self)
        if params.get("nan_guard"):
            cbs.NaNGuard().hook(self)
        if params.get("tensorboard"):
            cbs.TensorBoardCallback().hook(self)
        if params.get("wandb"):
            cbs.WandbCallback().hook(self)
        if params.get("remote_url"):
            cbs.RemoteCallback(params.get("remote_url")).hook(self)

    def _fire(self, hook: str, *a, **kw):
        for cb in self.callbacks:
            fn = getattr(cb, hook, None)
            if fn is not None:
                fn(self, *a, **kw)
        own = getattr(self, "on_" + hook, None)
        if own is not None:
            own(*a, **kw)

    # ------------------------------------------------------------------ loop
    def train(self):
        p = self.params
        self.initialize()
        self._build_step_fns()
        self.icallbacks(p)
        if p.get("select_on", "test") == "val" and not self.dataset_has_val():
            # --select_on=val on a dataset without a real val split would
            # silently disable best-model saving entirely (test() stops
            # saving 'best', evaluate() never runs) — fall back loudly
            self.logger.info(
                f"--select_on=val but dataset {p.dataset!r} has no real val "
                "split (val aliases test); falling back to select_on=test"
            )
            p.select_on = "test"
        heartbeat = None
        if p.get("heartbeat", True):
            heartbeat = self.exp.start_heartbeat()
        train_loader = self._pipeline_train(self.make_loader("train"))
        # --profile_steps=N: capture a device trace of the first N steps of
        # the first trained epoch into <blob>/profile (TensorBoard-loadable)
        profile_left = int(p.get("profile_steps", 0) or 0)
        profiling = False
        if profile_left > 0:
            import jax.profiler as _prof

            profile_dir = self.exp.blob_file("", "profile") or (
                self.exp.blob_dir + "/profile"
            )
            _prof.start_trace(profile_dir)
            profiling = True
            self.logger.info(f"profiling first {profile_left} steps → {profile_dir}")
        self._fire("train_begin")
        try:
            # start at self.eidx so AutoResume continues instead of
            # re-training every epoch on top of the loaded weights
            for eidx in range(self.eidx, int(p.epoch)):
                self.eidx = eidx
                train_loader.set_epoch(eidx)
                record = Record("train")
                self._fire("train_epoch_begin", eidx)
                t0 = time.time()
                n_dialogues = 0
                log_every = max(int(p.get("log_every", 10)), 1)

                def global_rows(batch_, axis) -> int:
                    """Global dialogue count of a batch dim: placed jax
                    arrays already carry the global shape; host arrays are
                    per-process local slices."""
                    arr = batch_.get("attention_mask")
                    if arr is None:
                        arr = batch_["sample_mask"]  # utterance-level (mmin)
                    b = int(arr.shape[axis])
                    if not isinstance(arr, jax.Array):
                        b *= jax.process_count()
                    return b

                for bidx, item in enumerate(train_loader):
                    # GroupedLoader yields (stacked_or_batch, k); plain
                    # loaders yield bare batches (k = 1)
                    batch, k = item if isinstance(item, tuple) else (item, 1)
                    keys = [
                        self.rng.key("dropout", self.global_steps + i)
                        for i in range(k)
                    ]
                    if k == 1:
                        sharded = meshlib.shard_batch(batch, self.mesh)
                        self.state, mets = self._train_step_fn(
                            self.state, sharded, keys[0]
                        )
                        n_dialogues += global_rows(batch, 0)
                    else:
                        sharded = meshlib.shard_batch(batch, self.mesh, scan_dim=True)
                        self.state, mets = self._multi_step_fn(
                            self.state, sharded, jnp.stack(keys)
                        )
                        mets = {mk: v.mean() for mk, v in mets.items()}
                        n_dialogues += k * global_rows(batch, 1)
                    self.global_steps += k
                    if profiling:
                        profile_left -= k
                        if profile_left <= 0:
                            jax.block_until_ready(self.state.params)
                            import jax.profiler as _prof

                            _prof.stop_trace()
                            profiling = False
                            self.logger.info("profile trace written")
                    m = Meter()
                    m.update(mets)
                    record.record(m)
                    self._fire("train_step_end", bidx, mets)
                    if self.stopped:
                        break
                    if bidx % log_every == 0:  # forces a metric sync: keep sparse
                        self.logger.inline(f"e{eidx} b{bidx} {record}")
                dt = time.time() - t0
                self.logger.newline()
                agg = record.agg()
                agg["dps"] = n_dialogues / max(dt, 1e-9)
                self.logger.info(f"epoch {eidx}: {record} | {agg['dps']:.1f} dia/s")
                self.metric_board.append(agg, step=eidx, stage="train")
                self._fire("train_epoch_end", eidx, record)
                if self.stopped:
                    break
                if p.get("eval_per_epoch", 1) and (eidx + 1) % int(p.get("eval_per_epoch", 1)) == 0:
                    if p.get("eval_val", True) and self.dataset_has_val():
                        self.evaluate()
                    self.test()
        except BaseException as e:
            self.exp.record_end(ok=False, error=repr(e))
            self._fire("exception", e)
            raise
        finally:
            if heartbeat is not None:
                heartbeat.stop()
            if profiling:  # epoch shorter than profile_steps, or a crash
                try:
                    import jax.profiler as _prof

                    _prof.stop_trace()
                except Exception:
                    pass
        self._fire("train_end")
        self.metric_board.flush()
        self.database.flush()
        self.exp.record_end(ok=True)

    # ------------------------------------------------------------------ eval
    plateau_source = "test"  # which stage's loss drives lr_sche (mmin: "val")

    def _collect_nll(self, logits, labels, sel) -> None:
        """Accumulate masked CE (host-side, stable log-softmax) so test()
        can report Lall and drive ReduceLROnPlateau (dagerc.py:212)."""
        lg = np.asarray(logits, np.float32)[sel]
        if lg.size == 0:
            return
        lab = np.asarray(labels)[sel]
        m = lg.max(-1, keepdims=True)
        lse = m[:, 0] + np.log(np.exp(lg - m).sum(-1))
        nll = lse - lg[np.arange(len(lab)), lab]
        self._nll_sum += float(nll.sum())
        self._nll_n += int(len(lab))

    def test_step_collect(self, batch, logits) -> None:
        """Gather masked predictions on host (mmbase.py:186-194).

        One fetch for (mask, labels, logits): placed eval batches are
        device-resident and separate np.asarray calls would each pay a
        blocking round-trip.  Multi-process: fetches only this process's
        addressable rows (global device_get would raise);
        _sync_eval_state() merges across processes afterwards."""
        mask, labels, lg = meshlib.fetch_local(
            [batch["attention_mask"], batch["label"], logits]
        )
        mask = np.asarray(mask) > 0
        labels = np.asarray(labels)
        logits = np.asarray(lg)
        pred = logits.argmax(-1)
        sel = mask & (labels >= 0)
        self._true.extend(labels[sel].tolist())
        self._pred.extend(pred[sel].tolist())
        self._collect_nll(logits, labels, sel)

    def _sync_eval_state(self) -> None:
        """Merge per-process eval collections into identical global state on
        every process, so metrics, ReduceLROnPlateau and best-model
        decisions are computed from the SAME inputs everywhere (no replica
        desync).  No-op single-process."""
        if jax.process_count() <= 1:
            return
        true = meshlib.allgather_rows(np.asarray(self._true, np.int64))
        pred = meshlib.allgather_rows(np.asarray(self._pred, np.int64))
        self._true, self._pred = true.tolist(), pred.tolist()
        self._nll_sum, self._nll_n = meshlib.allsum(self._nll_sum, self._nll_n)
        self._nll_n = int(self._nll_n)

    def _plateau_step(self, loss: float) -> None:
        """Step an optional ReduceLROnPlateau (subclasses set self.lr_sche)
        and inject the new LR into the live opt_state."""
        sche = getattr(self, "lr_sche", None)
        if sche is None or loss is None or not self.params.get("lr_plateau", True):
            return
        declared = self.params.optim.get("sche") if self.params.get("optim") else None
        if declared and declared.get("name"):
            # a declared interp schedule (--optim.sche.name=...) owns the
            # injected LR and re-evaluates it every step — a plateau
            # injection would be clobbered next step; defer to the schedule
            if not getattr(self, "_warned_sche_plateau", False):
                self._warned_sche_plateau = True
                self.logger.info(
                    "lr schedule declared (--optim.sche): plateau controller disabled"
                )
            return
        from erc_tpu.train.optim import get_learning_rate, set_learning_rate

        cur = get_learning_rate(self.state.opt_state)
        if cur is None:
            return
        new = sche.step(float(loss), cur)
        if new != cur:
            self.logger.info(f"ReduceLROnPlateau: lr {cur} -> {new}")
            self.state = self.state.replace(
                opt_state=set_learning_rate(self.state.opt_state, new)
            )

    def dataset_has_val(self) -> bool:
        """Registry property (data/registry.py): True only for datasets whose
        readers expose a real validation split (MOSEI valid_id, MMIN folds,
        DailyDialog validation/).  IEMOCAP/MELD alias val→test, so
        validating there would select on the test set."""
        from erc_tpu.data.registry import dataset_has_val

        return dataset_has_val(str(self.params.dataset))

    def evaluate(self) -> Dict[str, Any]:
        """Validation stage over split='val' (reference Trainer.evaluate,
        lumo/trainer/trainer.py:559-582): NLL + classification summary on
        the val split, logged under board stage 'val'.  Drives
        ReduceLROnPlateau when ``plateau_source == 'val'`` and saves a
        ``best_val`` model when ``--select_on=val``."""
        p = self.params
        self.initialize()
        if self._eval_fn is None:
            self._build_step_fns()
        loader = getattr(self, "_val_loader", None)
        if loader is None:
            loader = self._val_loader = self._pipeline_eval(self.make_loader("val"))
        self._true, self._pred = [], []
        self._nll_sum, self._nll_n = 0.0, 0
        self._fire("eval_begin")
        self._eval_loop(loader)
        self._sync_eval_state()
        val_loss = self._nll_sum / max(self._nll_n, 1)
        res: Dict[str, Any] = {"Lall": val_loss}
        if len(self._true):
            summ = metrics_mod.classification_summary(
                self._true, self._pred, p.n_classes
            )
            res.update({k: summ[k] for k in ("acc", "f1", "wa") if k in summ})
        self.metric_board.append(res, step=self.eidx, stage="val")
        self.metric_board.flush()
        self.logger.info(
            f"val: Lall={val_loss:.5f}"
            + (f" f1={res['f1']:.5f}" if "f1" in res else "")
        )
        if p.get("select_on", "test") == "val" and "f1" in res:
            with self.database as db:
                db.update_metrics({"val_f1": res["f1"]}, compare="max")
            if res["f1"] >= float(self.database.todict().get("val_f1", 0.0)):
                self.save_model("best_val", is_best=True)
        if self.plateau_source == "val":
            self._plateau_step(val_loss if self._nll_n else None)
        self._fire("eval_end", res)
        return res

    def _eval_loop(self, loader) -> None:
        """Dispatch eval steps with a one-group lag before collecting: the
        host-side fetch of group k overlaps group k+1's device compute
        (the fetch is the only blocking call in the loop).  Items may be
        (stacked_or_batch, k) from GroupedLoader (steps_per_call > 1; one
        scanned dispatch per K batches) or bare batches; collection is
        shape-agnostic over the leading scan axis (masked boolean
        selection flattens [K, B, ...] and [B, ...] alike)."""
        prev = None
        for item in loader:
            batch, k = item if isinstance(item, tuple) else (item, 1)
            if not isinstance(
                jax.tree_util.tree_leaves(batch)[0], jax.Array
            ):  # prefetch off: place here
                batch = meshlib.shard_batch(batch, self.mesh, scan_dim=k > 1)
            fn = self._multi_eval_fn if k > 1 else self._eval_fn
            logits = fn(self.state, batch)
            if prev is not None:
                self.test_step_collect(*prev)
            prev = (batch, logits)
        if prev is not None:
            self.test_step_collect(*prev)

    def test(self) -> Dict[str, Any]:
        p = self.params
        self.initialize()
        if self._eval_fn is None:
            self._build_step_fns()
        loader = getattr(self, "_test_loader", None)
        if loader is None:
            loader = self._test_loader = self._pipeline_eval(self.make_loader("test"))
        self._true, self._pred = [], []
        self._nll_sum, self._nll_n = 0.0, 0
        self._fire("test_begin")
        self._eval_loop(loader)
        self._sync_eval_state()
        test_loss = self._nll_sum / max(self._nll_n, 1)
        res = {}
        if len(self._true):
            res = metrics_mod.classification_summary(self._true, self._pred, p.n_classes)
            cm = res.pop("cm")
            # the flag controls ONLY the printed matrix (reference
            # mmin_base.py confuse_matrix semantics) — metric persistence
            # and best-model selection always run
            if p.get("confusion_matrix", True):
                self.logger.raw(cm)
            m = Meter()
            with self.database as db:
                m.update(db.update_metric_pair("pre", res["pre"], "cls_pre", res["cls_pre"]))
                m.update(db.update_metric_pair("rec", res["rec"], "cls_rec", res["cls_rec"]))
                m.update(db.update_metric_pair("f1", res["f1"], "cls_f1", res["cls_f1"]))
                m.update(
                    db.update_metrics(
                        {k: res[k] for k in ("acc", "wa", "mif1", "maf1")}, compare="max"
                    )
                )
            self.metric_board.append(
                {**res, "Lall": test_loss, "cm": cm}, step=self.eidx, stage="test"
            )
            # flush per test: a mid-run crash must not drop board rows
            self.metric_board.flush()
            self.logger.info("Best Results", m)
            self.pred_info.append([self._true, self._pred])
            self.pred_info.flush()
            if res["f1"] >= float(self.database.todict().get("f1", 0.0)) and (
                p.get("select_on", "test") == "test"
            ):
                # --select_on=val hands the best.model.ckpt copy to the val
                # stage (evaluate) — two selectors must not clobber it
                self.save_model("best", is_best=True)
        res["Lall"] = test_loss
        if self.plateau_source == "test":
            self._plateau_step(test_loss if self._nll_n else None)
        self._fire("test_end", res)
        return res

    # ----------------------------------------------------------- checkpoints
    def _state_tree(self):
        return self.state

    def save_model(self, tag: str = "last", is_best: bool = False) -> str:
        return self.saver.save_model(
            tag, self._state_tree(),
            meta={"eidx": self.eidx, "global_steps": self.global_steps,
                  "params_hash": self.params.hash()},
            is_best=is_best,
        )

    def save_checkpoint(self, is_best: bool = False, epoch_end: bool = False) -> str:
        """Rotating checkpoint; meta records both counters so AutoResume can
        restore them (epoch_end=True → resume at eidx+1)."""
        return self.saver.save_checkpoint(
            self.global_steps, self._state_tree(),
            meta={"eidx": self.eidx, "global_steps": self.global_steps,
                  "epoch_end": bool(epoch_end),
                  # lets a relaunched --resume job find compatible sibling
                  # checkpoints (AutoResume._latest_sibling_checkpoint);
                  # volatile run-control knobs (epoch, cadences) excluded
                  "params_hash": self.params.resume_hash()},
            is_best=is_best,
        )

    def load_checkpoint(self, path: Optional[str] = None):
        self.initialize()
        path = path or self.saver.latest_checkpoint()
        assert path, "no checkpoint found"
        # restore each leaf to the PLACEMENT the live state already has —
        # initialize() may have sharded large kernels over the model axis
        # (and their optimizer moments with them); a blanket replicate()
        # here used to undo that on resume (full copies on every device,
        # different placement than a fresh run)
        target = self.state
        loaded = self.saver.load_into(path, target)

        def place(new, cur):
            if hasattr(cur, "sharding") and hasattr(new, "shape"):
                return jax.device_put(new, cur.sharding)
            return new

        self.state = jax.tree_util.tree_map(place, loaded, target)
        return path


def main(trainer_cls, params_cls, argv: Optional[list] = None):
    """CLI driver (reference: mmbase.py:483-499).

    Multi-process launches set --coordinator=host:port (+
    --num_processes/--process_id, or the ERC_TPU_* env equivalents); the
    distributed client MUST come up before the Trainer touches the jax
    backend (mesh construction)."""
    params = params_cls()
    params.finalize(argv)
    meshlib.initialize_distributed(
        coordinator=params.get("coordinator"),
        num_processes=params.get("num_processes"),
        process_id=params.get("process_id"),
    )
    trainer = trainer_cls(params)
    trainer.train()  # --eval_first runs test() at train_begin (EvalFirst cb)
    trainer.save_model()
    return trainer
