"""Op-level xplane probe of the COGMEN train step (the flagship/headline
config: B=32, L=96, dense graph, chained encoder).

Same methodology as the round-4 MMGCN/DAG-ERC rebuilds: trace a few
single-step calls with jax.profiler, parse the device plane with
jax.profiler.ProfileData, and rank op groups by self-time so optimization
aims at the measured spend, not a guessed roofline.

Usage:  python scripts/probe_cogmen.py [--steps=8] [--batch_size=32]
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
        (r"fusion", "fusion"),
        (r"dot|conv|matmul|gemm", "matmul"),
        (r"rng|threefry|philox|bitcast-convert", "rng"),
        (r"dynamic-update-slice", "dus(save)"),
        (r"dynamic-slice", "ds(read)"),
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

    kw = {"steps": 8, "batch_size": 32, "max_len": 96}
    for a in sys.argv[1:]:
        k, v = a.lstrip("-").split("=")
        kw[k] = int(v)

    import bench

    from erc_tpu.parallel import mesh as meshlib

    # Build exactly the bench parity config but steps_per_call=1 so the
    # trace shows ONE train step per dispatch.
    import importlib

    mod_name, pcls, tcls, dataset, kind = bench.MODEL_REGISTRY["cogmen"]
    mod = importlib.import_module(mod_name)
    p = getattr(mod, pcls)()
    p.dataset = dataset
    p.train.batch_size = kw["batch_size"]
    p.max_seq_len = kw["max_len"]
    p.graph_impl = "dense"
    p.encoder_mode = "chained"
    p.steps_per_call = 1
    p.iparams()
    tr = getattr(mod, tcls)(p)
    tr.initialize()
    tr._build_step_fns()

    batches = bench.make_batches(kw["batch_size"], 4, kw["max_len"],
                                 seed=0, kind=kind, tr=tr)
    groups = [meshlib.shard_batch(b, tr.mesh) for b in batches]
    bench._force(groups)

    state = tr.state
    for i in range(3):  # compile + warm
        state, mets = tr._train_step_fn(state, groups[i % 4], tr.rng.key("d", i))
    bench._force(mets)

    t0 = time.perf_counter()
    for i in range(kw["steps"]):
        state, mets = tr._train_step_fn(state, groups[i % 4], tr.rng.key("d", i))
    bench._force(mets)
    wall = (time.perf_counter() - t0) / kw["steps"]
    print(f"wall/step: {wall*1e3:.2f} ms  ({kw['batch_size']/wall:.0f} dia/s)")

    tmp = tempfile.mkdtemp(prefix="cogmen_trace_")
    with jax.profiler.trace(tmp):
        for i in range(kw["steps"]):
            state, mets = tr._train_step_fn(
                state, groups[i % 4], tr.rng.key("d", i))
        bench._force(mets)

    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(_find_xplane(tmp), "rb").read())
    op_self = defaultdict(float)
    op_count = defaultdict(int)
    plane_names = []
    for plane in pd.planes:
        plane_names.append(plane.name)
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            # XLA op lines carry per-op events; durations in ns
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns
                op_self[name] += dur
                op_count[name] += 1
    print("planes:", plane_names)

    grp = defaultdict(float)
    for name, ns in op_self.items():
        grp[group_of(name)] += ns
    total = sum(grp.values())
    print(f"\ntraced device time: {total/1e6:.2f} ms over {kw['steps']} steps "
          f"({total/1e6/kw['steps']:.2f} ms/step)")
    print("\n-- spend by group --")
    for g, ns in sorted(grp.items(), key=lambda kv: -kv[1]):
        print(f"{g:>16}: {ns/1e6:8.2f} ms  {100*ns/total:5.1f}%")
    print("\n-- top 25 ops by self time --")
    for name, ns in sorted(op_self.items(), key=lambda kv: -kv[1])[:25]:
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
