"""Train entry point — CLI-compatible with the reference
(reference: train_mm.py:14-25):

    python3 train_mm.py --module=cogmen --dataset=iemocap-cogmen-4 \
        --modality=atv --reimplement --device=0

Every module under ``erc_tpu/models`` that exports ``main`` is a runnable
experiment (the reference discovers track_mm modules via pkgutil,
train_mm.py:13).
"""

import importlib
import pkgutil
import sys


def list_modules():
    import erc_tpu.models as pkg

    names = []
    for m in pkgutil.iter_modules(pkg.__path__):
        if m.name in ("base", "__init__"):
            continue
        names.append(m.name)
    return names


def main():
    module = None
    for tok in sys.argv[1:]:
        if tok.startswith("--module="):
            module = tok.split("=", 1)[1]
        elif tok == "--module":
            idx = sys.argv.index(tok)
            module = sys.argv[idx + 1]
    if module is None:
        print("usage: train_mm.py --module=<name> [--dataset=... --modality=atv ...]")
        print("available modules:", ", ".join(list_modules()))
        sys.exit(1)
    try:
        mod = importlib.import_module(f"erc_tpu.models.{module}")
    except ModuleNotFoundError as e:
        if f"erc_tpu.models.{module}" in str(e):
            print(f"unknown module {module!r}; available: {', '.join(list_modules())}")
            sys.exit(1)
        raise
    mod.main()


if __name__ == "__main__":
    main()
