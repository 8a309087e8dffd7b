"""Device selection utilities — TPU-aware analog of the reference's torch
device picker (src/vector_db/inference/device.py:17-106: auto -> cuda ->
mps -> cpu). Here the accelerator hierarchy is auto -> tpu -> cpu, resolved
through jax.
"""

from __future__ import annotations

from typing import Any, Dict

import jax


def get_device(preference: str = "auto") -> str:
    """Resolve a device string. preference: 'auto' | 'tpu' | 'cpu'
    (case-insensitive, as the reference accepts 'CPU' in config.yaml:3)."""
    pref = (preference or "auto").lower()
    if pref == "cpu":
        return "cpu"
    platforms = {d.platform for d in jax.devices()}
    if pref in ("auto", "tpu"):
        if "tpu" in platforms or any(p not in ("cpu",) for p in platforms):
            # any non-cpu jax platform counts as the accelerator
            non_cpu = [p for p in platforms if p != "cpu"]
            return non_cpu[0] if non_cpu else "cpu"
        return "cpu"
    return pref if pref in platforms else "cpu"


def is_accelerator_available() -> bool:
    """True when jax sees a non-CPU device (reference is_gpu_available,
    device.py:59-72)."""
    return any(d.platform != "cpu" for d in jax.devices())


def get_device_info() -> Dict[str, Any]:
    """Summary of visible devices (reference get_device_info,
    device.py:75-106)."""
    devices = jax.devices()
    return {
        "selected": get_device("auto"),
        "accelerator_available": is_accelerator_available(),
        "device_count": len(devices),
        "platforms": sorted({d.platform for d in devices}),
        "devices": [str(d) for d in devices],
        "backend": jax.default_backend(),
    }
