"""Device memory statistics (the reference's WRITE_VRAM_STATS analog,
fastergs_garden.yaml:53, and the expandable-segments allocator probe the TPU
build does not need — utils.py:13-26: capacity-padded state never
reallocates, so there is no fragmentation to mitigate)."""

from __future__ import annotations

import jax


def device_memory_stats() -> dict:
    """Returns HBM usage stats for device 0 (bytes), empty if unsupported."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
    except Exception:
        return {}
    keys = ('bytes_in_use', 'peak_bytes_in_use', 'bytes_limit',
            'largest_alloc_size')
    return {k: stats[k] for k in keys if k in stats}


def format_memory_stats() -> str:
    stats = device_memory_stats()
    if not stats:
        return 'device memory stats unavailable'
    gib = 1 << 30
    parts = [f'{k}={v / gib:.2f}GiB' for k, v in stats.items()]
    return 'HBM: ' + ', '.join(parts)
