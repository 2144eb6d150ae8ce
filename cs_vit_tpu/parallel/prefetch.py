"""Host->device input prefetching (BASELINE.md: MXU never preprocessing-bound).

Wraps a host batch iterator: batches are collated on the loader thread,
`device_put` with the mesh sharding on a prefetch thread, and handed to the
train loop already resident on device, so decode/transfer overlap compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterable, Iterator

from .mesh import shard_batch


def device_prefetch(
    host_iter: Iterable[Dict[str, Any]],
    mesh,
    depth: int = 2,
    drop_keys: tuple = ("imgs_path", "flip"),
    patches_dtype=None,
) -> Iterator[Dict[str, Any]]:
    """Yield device-resident sharded batches, `depth` transfers ahead.

    ``patches_dtype=jnp.bfloat16``: cast the dominant ``patches`` tensor on
    the host before transfer. When the train/eval step computes in bf16 it
    casts patches in-graph anyway, so pre-casting produces bit-identical
    compute while halving H2D bytes (~97% of the batch is patches) — PCIe
    on a production host, the WAN tunnel on this rig (measured 42 MB/s:
    a 48 MB f32 b64 batch is 1.15 s of link time vs a 150 ms step).
    Leave None for f32 runs.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []

    def worker():
        try:
            import numpy as np

            for host_batch in host_iter:
                batch = {
                    k: v for k, v in host_batch.items() if k not in drop_keys
                }
                if patches_dtype is not None and "patches" in batch:
                    batch["patches"] = np.asarray(batch["patches"]).astype(
                        patches_dtype
                    )
                q.put(shard_batch(batch, mesh))
        except Exception as e:  # pragma: no cover - propagated below
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item
    t.join()
    if err:
        raise err[0]
