"""Host + device memory observability (the reference samples RAM/GPU in
every meter line, ``recognition/.../utils/misc.py:36-59``,
``meters.py:818-822``)."""

from __future__ import annotations

import resource
from typing import Dict, Optional

import jax


def host_memory_gb() -> float:
    """Peak RSS of this process in GiB."""
    rss_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    return rss_kb / (1024.0 ** 2)


def device_memory_gb(device=None) -> Optional[Dict[str, float]]:
    """HBM usage of one device in GiB, when the backend reports it."""
    device = device or jax.local_devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    scale = 1024.0 ** 3
    out = {}
    if "bytes_in_use" in stats:
        out["in_use_gb"] = stats["bytes_in_use"] / scale
    if "peak_bytes_in_use" in stats:
        out["peak_gb"] = stats["peak_bytes_in_use"] / scale
    if "bytes_limit" in stats:
        out["limit_gb"] = stats["bytes_limit"] / scale
    return out or None


def memory_summary() -> str:
    parts = [f"ram {host_memory_gb():.2f}G"]
    dev = device_memory_gb()
    if dev:
        parts.append(
            "hbm " + "/".join(f"{v:.2f}G" for v in dev.values()))
    return " ".join(parts)
