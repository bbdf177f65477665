"""Baseline sweep generator (reference: scripts/baseline.py — emits bash
running seeds × modality-subsets × datasets; ``python3 scripts/baseline.py | bash``).

The reference round-robins CUDA devices; on TPU a pod is one jit over the
mesh, so the sweep serializes per chip (or shards across hosts by slicing
``--shard=i/n``).

    python scripts/baseline.py --module=cogmen --seeds=3 | bash
"""

import sys

sys.path.insert(0, ".")

from erc_tpu.core.params import BaseParams  # noqa: E402

ALL_MODALITY = ["atv", "av", "at", "tv", "a", "t", "v"]
DEFAULT_DATASETS = [
    "iemocap-cogmen-sbert-4",
    "iemocap-cogmen-sbert-6",
    "meld-mmgcn-sbert-7",
]


def main():
    p = BaseParams()
    p.module = "cogmen"
    p.modality = "1111111"  # bitmask over ALL_MODALITY
    p.seeds = 3
    p.script = "train_mm.py"
    p.datasets = ",".join(DEFAULT_DATASETS)
    p.shard = "0/1"
    p.finalize()

    mask = str(p.modality).ljust(len(ALL_MODALITY), "0")
    modalities = [m for i, m in enumerate(ALL_MODALITY) if mask[i] == "1"]
    datasets = str(p.datasets).split(",")
    shard_i, shard_n = (int(x) for x in str(p.shard).split("/"))

    cmds = []
    for seed in range(int(p.seeds)):
        for modality in modalities:
            for dataset in datasets:
                cmds.append(
                    f"python3 {p.script} --module={p.module} --dataset={dataset} "
                    f"--reimplement --modality={modality} --seed={seed}"
                )
    cmds = [c for i, c in enumerate(cmds) if i % shard_n == shard_i]
    print(f'echo "execute {len(cmds)} runs."')
    for c in cmds:
        print(c)


if __name__ == "__main__":
    main()
