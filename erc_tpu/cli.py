"""Management CLI (reference: lumo/cli/cli.py — `lumo sum/init/extract/clone/...`).

    python -m erc_tpu.cli list                 # experiments
    python -m erc_tpu.cli tests <exp>          # tests of an experiment
    python -m erc_tpu.cli sum <exp> <test>     # full summary of one test
    python -m erc_tpu.cli board                # best-metric table across runs
    python -m erc_tpu.cli stop <exp> <test>    # graceful stop (.stop file)
    python -m erc_tpu.cli init [path]          # git init + .erc_tpurc.json skeleton
    python -m erc_tpu.cli extract <exp> <test> [out.zip]   # archive one run
    python -m erc_tpu.cli clone <url> [alias]  # git clone + init
    python -m erc_tpu.cli archive <commit> <out.zip>       # export a run snapshot
    python -m erc_tpu.cli warm <module> [dataset] [bs] [L] # precompile steps
    python -m erc_tpu.cli checkdata [dataset ...]          # validate a feature-dump mount
    python -m erc_tpu.cli mem                              # device-memory snapshot
    python -m erc_tpu.cli summary <module> [dataset]       # per-module param table
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from erc_tpu import analyse
from erc_tpu.core.experiment import exproot


def _init_repo(path: str) -> str:
    """`lumo init` equivalent (reference cli/cli.py:57-59): git init + a
    machine-config skeleton."""
    os.makedirs(path, exist_ok=True)
    subprocess.run(["git", "init", "-q", path], check=False)
    rc = os.path.join(path, ".erc_tpurc.json")
    if not os.path.exists(rc):
        with open(rc, "w") as f:
            json.dump(
                {"exproot": None, "data_root": None, "git_snapshot": True}, f, indent=2
            )
    return os.path.abspath(path)


# the canonical real-data parity datasets (README "Real datasets"): one
# row per distinct on-disk dump format the readers consume
_CHECKDATA_DEFAULTS = (
    "iemocap-cogmen-4",
    "iemocap-cogmen-6",
    "meld-mmgcn-7",
    "mosei-sent-sbert-2",
    "mosei-cim-2",
    "iemocap-mmin-4",
)


def _checkdata(names) -> int:
    """Validate an ERC_TPU_DATA_ROOT mount by loading each dataset through
    the REAL reader stack (no duplicated layout knowledge): resolve the
    root, read every split the registry says exists, and report sample
    counts + feature dims, or the precise missing path / parse error.
    Returns the number of failures."""
    from erc_tpu.data.registry import dataset_has_val, get_root, pick_datas

    failures = 0
    for name in names:
        try:
            root = get_root(name)
        except KeyError:
            print(f"{name:36s} NO ROOT — unknown corpus "
                  f"{name.split('-')[0]!r} (set ERC_TPU_DATA_ROOT or "
                  ".erc_tpurc.json data_root)")
            failures += 1
            continue
        splits = ["train", "test"] + (["val"] if dataset_has_val(name) else [])
        parts = []
        for split in splits:
            try:
                samples = pick_datas(root, name, split=split)
            except FileNotFoundError as e:
                msg = e.filename or str(e).splitlines()[0]
                parts.append(f"{split}: MISSING {msg}")
                failures += 1
                continue
            except Exception as e:  # corrupt/mislaid dump: show the parse error
                msg = str(e).splitlines()[0][:160]
                parts.append(f"{split}: ERROR {type(e).__name__}: {msg}")
                failures += 1
                continue
            dims = ""
            if samples:
                s0 = samples[0]
                shapes = {
                    k: "x".join(map(str, v.shape))
                    for k, v in sorted(s0.items())
                    if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0
                }
                dims = " " + ",".join(f"{k}={v}" for k, v in shapes.items())
            parts.append(f"{split}: {len(samples)}{dims}")
        print(f"{name:36s} " + " | ".join(parts))
    print("OK" if failures == 0 else f"{failures} FAILURE(S)")
    return failures


def _extract_test(exp: str, test: str, output=None) -> str:
    """`lumo extract` equivalent: zip one run's metadata + blobs."""
    import zipfile

    root = exproot()
    output = output or f"{exp}.{test}.zip"
    n = 0
    with zipfile.ZipFile(output, "w", zipfile.ZIP_DEFLATED) as z:
        for kind in ("experiment", "blob"):
            base = os.path.join(root, kind, exp, test)
            for dirpath, _, files in os.walk(base):
                for name in files:
                    full = os.path.join(dirpath, name)
                    z.write(full, os.path.join(kind, os.path.relpath(full, base)))
                    n += 1
    if n == 0:  # typo'd exp/test must not produce a silent empty archive
        os.remove(output)
        raise SystemExit(f"no files found for {exp}/{test} under {root}")
    return output


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cmd = argv[0] if argv else "board"
    if cmd == "init":
        print(_init_repo(argv[1] if len(argv) > 1 else "."))
    elif cmd == "extract":
        out = _extract_test(argv[1], argv[2], argv[3] if len(argv) > 3 else None)
        print(f"wrote {out}")
    elif cmd == "clone":
        url = argv[1]
        alias = argv[2] if len(argv) > 2 else os.path.basename(url).removesuffix(".git")
        subprocess.run(["git", "clone", url, alias], check=True)
        print(_init_repo(alias))
    elif cmd == "archive":
        from erc_tpu.core.machine import archive_snapshot

        ok = archive_snapshot(argv[1], argv[2])
        print(f"{'wrote' if ok else 'FAILED to write'} {argv[2]}")
        if not ok:
            sys.exit(1)
    elif cmd == "warm":
        # populate the persistent compile cache so the first real run does
        # not pay the minutes-long cold compile (train + multi-step + eval)
        import importlib

        module = argv[1]
        dataset = argv[2] if len(argv) > 2 else "synthetic-cogmen-6"
        bs = int(argv[3]) if len(argv) > 3 else None
        L = int(argv[4]) if len(argv) > 4 else None
        mod = importlib.import_module(f"erc_tpu.models.{module}")
        p = getattr(mod, "ParamsType")()
        p.dataset = dataset
        if bs:
            p.train.batch_size = bs
            p.test.batch_size = bs
        if L:
            p.max_seq_len = L
        p.iparams()
        trainer_cls = [
            v for k, v in vars(mod).items()
            if k.endswith("Trainer") and isinstance(v, type)
        ][-1]
        tr = trainer_cls(p)
        tr.initialize()
        tr._build_step_fns()
        from erc_tpu.parallel import mesh as meshlib

        batch = tr.example_batch(
            L=int(p.get("max_seq_len", 32)), B=int(p.train.batch_size)
        )
        sharded = meshlib.shard_batch(batch, tr.mesh)
        tr.state, _ = tr._train_step_fn(tr.state, sharded, tr.rng.key("warm", 0))
        logits = tr._eval_fn(tr.state, sharded)
        import jax

        jax.block_until_ready(logits)
        print(f"warmed {module} on {dataset}: train + eval steps compiled")
    elif cmd == "list":
        for e in analyse.list_experiments():
            print(e)
    elif cmd == "tests":
        for t in analyse.list_tests(argv[1]):
            print(t)
    elif cmd == "sum":
        print(json.dumps(analyse.summarize_test(argv[1], argv[2]), indent=2, default=str))
    elif cmd == "board":
        exp = argv[1] if len(argv) > 1 else None
        print(analyse.format_table(analyse.collect_metrics(exp)))
    elif cmd == "stop":
        path = os.path.join(exproot(), "experiment", argv[1], argv[2], ".stop")
        open(path, "w").close()
        print(f"created {path}")
    elif cmd == "checkdata":
        names = argv[1:] or _CHECKDATA_DEFAULTS
        if _checkdata(names):
            sys.exit(1)
    elif cmd == "mem":
        from erc_tpu.core import memstat

        print(memstat.memory_report())
    elif cmd == "summary":
        # per-module param table for a model family on synthetic shapes
        import importlib

        import jax

        from erc_tpu.core.summary import summarize_model

        mod = importlib.import_module(f"erc_tpu.models.{argv[1]}")
        p = getattr(mod, "ParamsType")()
        p.dataset = argv[2] if len(argv) > 2 else "synthetic-cogmen-6"
        p.iparams()
        trainer_cls = [
            v for k, v in vars(mod).items()
            if k.endswith("Trainer") and isinstance(v, type)
        ][-1]
        tr = trainer_cls(p)
        tr.imodels(p)
        batch = tr.example_batch(L=int(p.get("length_bucket", 32) or 32),
                                 B=int(p.train.batch_size))
        rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        print(summarize_model(tr.model, rngs, batch, deterministic=True))
    else:
        print(__doc__)
        sys.exit(1)


if __name__ == "__main__":
    main()
