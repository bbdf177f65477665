"""Device-memory probe — the TPU-native answer to the reference's GPU
memory tooling (lumo/sketch/memory_grab.py:18-274 scrapes `nvidia-smi`
per-pid and grabs free memory; lumo/sketch/cudamemory.py).

On TPU there is no smi and no other-process contention to watch: the XLA
runtime owns HBM and exposes allocator counters per device.  The useful
capabilities map to:

- ``device_memory_stats``: allocator counters (in-use / peak / limit) per
  device — replaces the smi parse.
- ``live_array_summary``: which host-visible jax arrays are holding the
  bytes, grouped by (shape, dtype) — replaces the per-pid attribution.
- ``memory_report``: one formatted snapshot of both.
- ``MemoryMonitor`` (train/callbacks.py) logs the per-epoch HBM peak —
  replaces the watchdog loop.

The reference's *grab* feature (allocate-to-hold free GPU memory) is
deliberately not reproduced: XLA preallocates its HBM arena, so holding
memory against other processes is meaningless on TPU.
"""

from __future__ import annotations

from typing import Dict, List, Optional

# allocator counter names vary by backend; normalize the useful subset
_KEYS = (
    ("bytes_in_use", "bytes_in_use"),
    ("peak_bytes_in_use", "peak_bytes_in_use"),
    ("bytes_limit", "bytes_limit"),
    ("largest_alloc_size", "largest_alloc_size"),
    ("num_allocs", "num_allocs"),
)


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """Normalized allocator counters for one device, or None when the
    backend exposes none (CPU devices usually don't)."""
    import jax

    device = device or jax.local_devices()[0]
    try:
        raw = device.memory_stats()
    except Exception:
        raw = None
    if not raw:
        return None
    out = {norm: int(raw[k]) for k, norm in _KEYS if k in raw}
    if "bytes_in_use" in out and "bytes_limit" in out:
        out["bytes_free"] = out["bytes_limit"] - out["bytes_in_use"]
    return out or None


def live_array_summary(top_k: int = 20) -> List[Dict]:
    """Live jax.Array census grouped by (shape, dtype, device kind),
    largest first — answers "what is holding HBM" without a trace."""
    import jax

    groups: Dict[tuple, Dict] = {}
    for arr in jax.live_arrays():
        try:
            shape, dtype = tuple(arr.shape), str(arr.dtype)
            nbytes = int(arr.nbytes)
            kind = arr.devices().pop().platform if arr.devices() else "?"
        except Exception:  # deleted/donated buffers can race the census
            continue
        key = (shape, dtype, kind)
        g = groups.setdefault(
            key, {"shape": shape, "dtype": dtype, "platform": kind,
                  "count": 0, "bytes": 0}
        )
        g["count"] += 1
        g["bytes"] += nbytes
    rows = sorted(groups.values(), key=lambda g: -g["bytes"])
    return rows[:top_k]


def _fmt_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(n) < 1024 or unit == "TiB":
            return f"{n:.1f}{unit}" if unit != "B" else f"{n}B"
        n /= 1024
    return f"{n:.1f}TiB"


def memory_report(top_k: int = 12) -> str:
    """Formatted snapshot: per-device allocator counters + the largest
    live-array groups."""
    import jax

    lines = []
    for d in jax.local_devices():
        stats = device_memory_stats(d)
        if stats is None:
            lines.append(f"{d}: no allocator stats exposed")
            continue
        parts = [f"in_use={_fmt_bytes(stats['bytes_in_use'])}"]
        if "peak_bytes_in_use" in stats:
            parts.append(f"peak={_fmt_bytes(stats['peak_bytes_in_use'])}")
        if "bytes_limit" in stats:
            parts.append(f"limit={_fmt_bytes(stats['bytes_limit'])}")
        if "bytes_free" in stats:
            parts.append(f"free={_fmt_bytes(stats['bytes_free'])}")
        lines.append(f"{d}: " + " ".join(parts))
    rows = live_array_summary(top_k)
    if rows:
        lines.append(f"live arrays (top {len(rows)} groups):")
        for g in rows:
            shape = "x".join(map(str, g["shape"])) or "scalar"
            lines.append(
                f"  {_fmt_bytes(g['bytes']):>10}  {g['count']:>4}x "
                f"{shape} {g['dtype']} [{g['platform']}]"
            )
    return "\n".join(lines)
