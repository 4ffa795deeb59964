"""Process/system resource metrics for the /system endpoint.

Parity with the reference collector (``stt_server/backend/utils/
system_metrics.py:21-125``): psutil process+system memory/CPU with a
``resource.getrusage`` fallback. The GPU section (pynvml, gated by
``STT_ENABLE_GPU_METRICS``) maps to a TPU section here: device kind/count
and per-device memory stats from JAX, gated by ``STT_ENABLE_TPU_METRICS``
since ``memory_stats()`` can synchronize the device.
"""

from __future__ import annotations

import os
import resource
import sys
from typing import Any, Dict

try:
    import psutil
except ImportError:  # pragma: no cover - baked into the image
    psutil = None

_TPU_METRICS_ENV = "STT_ENABLE_TPU_METRICS"


def _process_metrics() -> Dict[str, Any]:
    if psutil is not None:
        proc = psutil.Process()
        with proc.oneshot():
            mem = proc.memory_info()
            return {
                "rss_bytes": int(mem.rss),
                "vms_bytes": int(mem.vms),
                "cpu_percent": float(proc.cpu_percent(interval=None)),
                "num_threads": int(proc.num_threads()),
            }
    usage = resource.getrusage(resource.RUSAGE_SELF)
    scale = 1024 if sys.platform != "darwin" else 1
    return {
        "rss_bytes": int(usage.ru_maxrss * scale),
        "vms_bytes": None,
        "cpu_percent": None,
        "num_threads": None,
    }


def _system_metrics() -> Dict[str, Any]:
    if psutil is None:
        return {}
    vm = psutil.virtual_memory()
    return {
        "memory_total_bytes": int(vm.total),
        "memory_available_bytes": int(vm.available),
        "memory_percent": float(vm.percent),
        "cpu_percent": float(psutil.cpu_percent(interval=None)),
        "cpu_count": psutil.cpu_count(),
        "load_avg": list(os.getloadavg()) if hasattr(os, "getloadavg") else None,
    }


def _tpu_metrics() -> Dict[str, Any]:
    if os.getenv(_TPU_METRICS_ENV, "").strip().lower() not in {"1", "true", "yes", "on"}:
        return {}
    try:
        import jax

        devices = jax.devices()
        payload: Dict[str, Any] = {
            "device_count": len(devices),
            "platform": devices[0].platform if devices else "none",
            "devices": [],
        }
        for dev in devices:
            entry: Dict[str, Any] = {
                "id": dev.id,
                "kind": getattr(dev, "device_kind", ""),
            }
            try:
                stats = dev.memory_stats() or {}
                entry["bytes_in_use"] = stats.get("bytes_in_use")
                entry["bytes_limit"] = stats.get("bytes_limit")
            except Exception:
                pass
            payload["devices"].append(entry)
        return payload
    except Exception:
        return {}


def collect_system_metrics() -> Dict[str, Any]:
    """Point-in-time resource snapshot for the /system endpoint."""
    payload: Dict[str, Any] = {
        "process": _process_metrics(),
        "system": _system_metrics(),
    }
    tpu = _tpu_metrics()
    if tpu:
        payload["tpu"] = tpu
    return payload


__all__ = ["collect_system_metrics"]
