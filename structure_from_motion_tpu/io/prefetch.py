"""Double-buffered frame ingest: decode + host->device upload off-thread.

The per-frame compute is a single fused device program, but getting the
frame's pixels INTO device memory is host work (file read + BMP decode +
host->device transfer — the transfer alone is ~40 ms through a tunnelled
TPU, ~0.1 ms over PCIe). Feeding the engine from this prefetcher overlaps
frame N+1's decode+upload with frame N's compute, so ingest disappears
from the steady-state frame time whenever compute >= transfer.

The native C++ loader (``io/native_loader.py``) already overlaps DECODE;
this layer adds the device upload and works with any loader callable.
"""

from __future__ import annotations

import queue
import threading


class DevicePrefetcher:
    """Iterate ``(item, device_array)`` over ``paths``, staying ``depth``
    frames ahead on a daemon worker thread.

    ``loader``: path -> numpy array (e.g. ``load_image_grayscale``).
    Worker exceptions are re-raised in the consumer at the failing frame's
    position, so error behaviour matches the sequential loop.
    """

    _DONE = object()

    def __init__(self, paths, loader, depth: int = 2):
        import jax

        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._paths = list(paths)

        def work():
            for p in self._paths:
                try:
                    buf = jax.device_put(loader(p))
                except BaseException as exc:  # re-raised consumer-side
                    self._q.put((p, exc))
                    return
                self._q.put((p, buf))
            self._q.put(self._DONE)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            got = self._q.get()
            if got is self._DONE:
                return
            path, buf = got
            if isinstance(buf, BaseException):
                raise buf
            yield path, buf
