"""Worker for the real multi-process test (tests/test_multiprocess.py).

Launched N times with distinct --process_id against a localhost
coordinator on the CPU backend (gloo collectives); replaces the
reference's DDP launch surface (lumo trainer.py:62-68).  Each worker:

  1. initializes the distributed client BEFORE touching the backend,
  2. builds a DAG-ERC trainer on synthetic data (dropout 0 → the loss is
     invariant to the strided row permutation of the global batch),
  3. records its first train batch's per-process label rows,
  4. runs K fixed-key train steps and a test() pass,

and writes a JSON report for the parent test to cross-check:
shared test_name, per-process loader slices reassembling the global
batch, loss trajectory equal to the single-process run, and identical
test-stage metrics on every process.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=3)
    # mode=steps: raw fixed-key train steps (loss-equality vs 1-process).
    # mode=full: the REAL tr.train() loop with epoch checkpoints — phase A
    #   of the federated preemption story.
    # mode=resume: relaunch with --resume into the SAME exproot (fresh test
    #   dir, longer --epoch): AutoResume must restore the phase-A sibling
    #   checkpoint on EVERY process or the collectives desync.
    ap.add_argument("--mode", default="steps", choices=["steps", "full", "resume"])
    ap.add_argument("--epoch", type=int, default=2)
    ap.add_argument("--exproot", default="")
    args = ap.parse_args()
    if args.exproot:
        os.environ["ERC_TPU_EXPROOT"] = args.exproot

    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    os.environ.setdefault("ERC_TPU_GIT_SNAPSHOT", "0")
    # each federated worker must own exactly ONE local device; strip an
    # inherited virtual-device-count flag (e.g. from a parent test env)
    # that would multiply the global device count
    if "XLA_FLAGS" in os.environ:
        os.environ["XLA_FLAGS"] = " ".join(
            f for f in os.environ["XLA_FLAGS"].split()
            if not f.startswith("--xla_force_host_platform_device_count")
        )
    import jax

    # the axon plugin overrides JAX_PLATFORMS; force CPU through jax.config
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from erc_tpu.parallel import mesh as meshlib

    if args.num_processes > 1:
        meshlib.initialize_distributed(
            args.coordinator, args.num_processes, args.process_id
        )

    import jax.numpy as jnp
    import numpy as np

    from erc_tpu.models.dagerc import DAGERCParams, DAGERCTrainer

    p = DAGERCParams()
    p.dataset = "synthetic-cogmen-6"
    p.epoch = 1
    p.train.batch_size = 8
    p.test.batch_size = 8
    p.max_seq_len = 32
    p.hidden_dim = 16
    p.gnn_layers = 2
    p.dropout = 0.0
    p.prefetch = False
    p.heartbeat = False
    p.eval_per_epoch = 0
    if args.mode in ("full", "resume"):
        p.epoch = args.epoch
        p.checkpoint_per_epoch = 1
        if args.mode == "resume":
            p.resume = True
    p.iparams()
    tr = DAGERCTrainer(p)

    if args.mode in ("full", "resume"):
        from erc_tpu.train import callbacks as cbs

        class Recorder(cbs.Callback):
            # after AutoResume (100): eidx_at_begin captures what it restored
            priority = 150

            def __init__(self):
                self.losses = []
                self.eidx_at_begin = None

            def train_begin(self, rec_tr):
                self.eidx_at_begin = rec_tr.eidx

            def train_step_end(self, rec_tr, bidx, mets):
                import jax as _jax

                self.losses.append(float(_jax.device_get(mets["Lall"])))

        rec = Recorder().hook(tr)
        tr.train()
        json.dump(
            {
                "process_id": args.process_id,
                "device_count": jax.device_count(),
                "test_name": tr.exp.test_name,
                "eidx_at_begin": rec.eidx_at_begin,
                "final_eidx": tr.eidx,
                "global_steps": tr.global_steps,
                "losses": rec.losses,
                "checkpoints": sorted(
                    os.path.basename(c) for c in tr.saver.list_checkpoints()
                ),
            },
            open(args.out, "w"),
        )
        return

    tr.initialize()
    tr._build_step_fns()

    loader = tr.make_loader("train")
    batches = list(loader)
    first = batches[0]
    # per-process slice of the first global batch (strided rows)
    local_labels = np.asarray(first["label"])
    valid = np.asarray(first["attention_mask"]) > 0

    losses = []
    state = tr.state
    for k, b in enumerate(batches[: args.steps]):
        sharded = meshlib.shard_batch(b, tr.mesh)
        state, mets = tr._train_step_fn(state, sharded, tr.rng.key("d", k))
        losses.append(float(jax.device_get(mets["Lall"])))
    tr.state = state

    res = tr.test()

    json.dump(
        {
            "process_id": args.process_id,
            "device_count": jax.device_count(),
            "local_device_count": jax.local_device_count(),
            "test_name": tr.exp.test_name,
            "first_batch_labels": local_labels[valid].tolist(),
            "losses": losses,
            "test_f1": res.get("f1"),
            "test_Lall": res.get("Lall"),
            "n_test_rows": len(tr._true),
        },
        open(args.out, "w"),
    )


if __name__ == "__main__":
    main()
