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


def analytic_train_footprint(state, data, instance_cap: int) -> int:
    """Analytic resident-HBM estimate (bytes) for one training step when the
    backend exposes no allocator stats (the tunneled TPU does not).

    Counts the durable state (params + Adam moments + densification info +
    filter), the on-device dataset, and the dominant transient rasterizer
    streams: the 12-column binning sort (in+out), the (16, I) gradient
    stream plus its owner-sorted copy, and the (T, 4, P) forward state
    table. Lesser temporaries ride inside these envelopes.
    """
    import numpy as np

    def tree_bytes(t):
        return sum(int(np.prod(x.shape)) * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(t) if hasattr(x, 'shape'))

    durable = tree_bytes(state) + tree_bytes(data)
    sort_stream = 2 * 12 * 4 * instance_cap          # in + out, 12 i32 cols
    grad_stream = 2 * 16 * 4 * instance_cap          # (16, I) + sorted copy
    fin_table = 0
    if hasattr(data, 'rgb'):
        h, w = data.rgb.shape[-2:]
        n_tiles = -(-w // 16) * -(-h // 16)
        fin_table = n_tiles * 4 * 256 * 4 * 2        # fin + aux table
    return durable + sort_stream + grad_stream + fin_table


def format_memory_stats() -> str:
    stats = device_memory_stats()
    if not stats:
        return 'device memory stats unavailable'
    gib = 1 << 30
    parts = [f'{k}={v / gib:.2f}GiB' for k, v in stats.items()]
    return 'HBM: ' + ', '.join(parts)
