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
) -> Iterator[Dict[str, Any]]:
    """Yield device-resident sharded batches, `depth` transfers ahead."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []

    def worker():
        try:
            for host_batch in host_iter:
                batch = {
                    k: v for k, v in host_batch.items() if k not in drop_keys
                }
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
