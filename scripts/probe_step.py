"""Op-level xplane probe of any zoo model's train step.

Same methodology as the round-4 MMGCN/DAG-ERC rebuilds: trace a few
single-step calls with jax.profiler, parse the device plane with
jax.profiler.ProfileData, and rank op groups by self-time so optimization
aims at the measured spend, not a guessed roofline.

Usage:  python scripts/probe_step.py [--model=cogmen] [--stage=train|eval]
            [--steps=8] [--batch_size=32] [--max_len=96] [--set key=value ...]

The COGMEN run of this probe produced the "COGMEN B=32 ceiling" section
of BENCH_MATRIX.md (device 4.5 ms/step, ~7.1k dia/s ceiling, tunnel
dispatch the rest).
"""
import re
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, ".")


def group_of(name: str) -> str:
    """Bucket an XLA op name into a coarse group for the spend table."""
    n = name.lower()
    for pat, g in [
        (r"rng|threefry|philox", "rng"),
        (r"fusion", "fusion"),
        (r"dot|conv|matmul|gemm", "matmul"),
        (r"dynamic-update-slice", "dus(save)"),
        (r"dynamic-slice|slice-start", "ds/prefetch"),
        (r"copy|transpose|bitcast", "layout"),
        (r"reduce", "reduce"),
        (r"scatter|gather", "scatter/gather"),
        (r"all-reduce|all-gather|collective", "collective"),
        (r"while|condition", "control"),
    ]:
        if re.search(pat, n):
            return g
    return "other"


def main():
    import jax

    kw = {"steps": 8, "batch_size": 32, "max_len": 96, "model": "cogmen",
          "stage": "train"}
    overrides = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--set":
            overrides.append(next(it))
            continue
        k, v = a.lstrip("-").split("=", 1)
        if k == "set":
            overrides.append(v)
        elif k in ("model", "stage"):
            kw[k] = v
        else:
            kw[k] = int(v)

    import importlib

    import bench

    from erc_tpu.parallel import mesh as meshlib

    mod_name, pcls, tcls, dataset, kind = bench.MODEL_REGISTRY[kw["model"]]
    mod = importlib.import_module(mod_name)
    p = getattr(mod, pcls)()
    p.dataset = dataset
    p.train.batch_size = kw["batch_size"]
    p.max_seq_len = kw["max_len"]
    if kw["model"] == "cogmen":
        p.encoder_mode = "chained"  # match the bench's honest config
    p.steps_per_call = 1  # ONE train step per dispatch in the trace
    bench.apply_overrides(p, overrides)  # the bench's parser, verbatim
    p.iparams()
    tr = getattr(mod, tcls)(p)
    tr.initialize()
    tr._build_step_fns()

    batches = bench.make_batches(kw["batch_size"], 4, kw["max_len"],
                                 seed=0, kind=kind, tr=tr)
    groups = [meshlib.shard_batch(b, tr.mesh) for b in batches]
    bench._force(groups)

    state = tr.state
    if kw["stage"] == "eval":
        step = lambda s, i: (s, tr._eval_fn(s, groups[i % 4]))
    else:
        step = lambda s, i: tr._train_step_fn(s, groups[i % 4], tr.rng.key("d", i))
    for i in range(3):  # compile + warm
        state, mets = step(state, i)
    bench._force(mets)

    t0 = time.perf_counter()
    for i in range(kw["steps"]):
        state, mets = step(state, i)
    bench._force(mets)
    wall = (time.perf_counter() - t0) / kw["steps"]
    print(f"wall/step: {wall*1e3:.2f} ms  ({kw['batch_size']/wall:.0f} dia/s)")

    tmp = tempfile.mkdtemp(prefix=f"{kw['model']}_trace_")
    with jax.profiler.trace(tmp):
        for i in range(kw["steps"]):
            state, mets = step(state, i)
        bench._force(mets)

    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(_find_xplane(tmp), "rb").read())
    op_self = defaultdict(float)
    op_count = defaultdict(int)
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:  # durations in ns
                op_self[ev.name] += ev.duration_ns
                op_count[ev.name] += 1

    grp = defaultdict(float)
    for name, ns in op_self.items():
        grp[group_of(name)] += ns
    total = sum(grp.values())
    print(f"\ntraced device time: {total/1e6:.2f} ms over {kw['steps']} steps "
          f"({total/1e6/kw['steps']:.2f} ms/step; includes overlapped async "
          "+ parent rollups — ratios matter, not the sum)")
    print("\n-- spend by group --")
    for g, ns in sorted(grp.items(), key=lambda kv: -kv[1]):
        print(f"{g:>16}: {ns/1e6:8.2f} ms  {100*ns/total:5.1f}%")
    print("\n-- top 30 ops by self time --")
    for name, ns in sorted(op_self.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ns/1e6:8.2f} ms  x{op_count[name]:<5} {name[:110]}")


def _find_xplane(root):
    import os

    for r, _, files in os.walk(root):
        for f in files:
            if f.endswith(".xplane.pb"):
                return os.path.join(r, f)
    raise FileNotFoundError(f"no xplane.pb under {root}")


if __name__ == "__main__":
    main()
