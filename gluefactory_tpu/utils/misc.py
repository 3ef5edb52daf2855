"""View-dict helpers and timing (reference: gluefactory/utils/misc.py:1-57)."""

from __future__ import annotations

import time

import jax


def get_view(data: dict, i: int | str) -> dict:
    """Assemble a single-view data dict from the paired dict: view-i image data
    plus any flat keys suffixed with i."""
    i = str(i)
    out = dict(data.get(f"view{i}", {}))
    for k, v in data.items():
        if k.endswith(i) and not k.startswith("view"):
            out[k[: -len(i)]] = v
    return out


def get_twoview(data: dict, idx: str) -> dict:
    """Extract pair ``idx`` in {'0to1','0to2','1to2'} from a triplet dict
    (reference utils/misc.py)."""
    a, b = idx[0], idx[-1]
    out = {}
    for k, v in data.items():
        if k.endswith(f"_{idx}") or k.endswith(idx):
            out[k.replace(idx, "0to1") if "to" in k else k] = v
        elif k == f"view{a}":
            out["view0"] = v
        elif k == f"view{b}":
            out["view1"] = v
        elif k.endswith(a) and not k.endswith(f"to{a}"):
            out[k[:-1] + "0"] = v
        elif k.endswith(b) and not k.endswith(f"to{b}"):
            out[k[:-1] + "1"] = v
    return out


def sync_and_time() -> float:
    """Wall-clock after draining pending device work
    (≙ cuda-synced timer, reference utils/misc.py:52-57)."""
    (jax.device_put(0.0) + 0).block_until_ready()
    return time.perf_counter()


def cpu_cache_tag() -> str:
    """Short fingerprint of the host CPU's feature flags. XLA:CPU AOT cache
    entries compiled with vector extensions the current host lacks load with
    SIGILL risk — keying the persistent-cache directory on the flags keeps
    each host population separate."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform

    return hashlib.md5(platform.processor().encode()).hexdigest()[:8]
