"""Management CLI (reference: lumo/cli/cli.py — `lumo sum/list/...`).

    python -m erc_tpu.cli list                 # experiments
    python -m erc_tpu.cli tests <exp>          # tests of an experiment
    python -m erc_tpu.cli sum <exp> <test>     # full summary of one test
    python -m erc_tpu.cli board                # best-metric table across runs
    python -m erc_tpu.cli stop <exp> <test>    # graceful stop (.stop file)
"""

from __future__ import annotations

import json
import os
import sys

from erc_tpu import analyse
from erc_tpu.core.experiment import exproot


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cmd = argv[0] if argv else "board"
    if cmd == "list":
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
    else:
        print(__doc__)
        sys.exit(1)


if __name__ == "__main__":
    main()
