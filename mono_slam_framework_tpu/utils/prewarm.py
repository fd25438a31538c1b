"""Background shape prewarming.

Through a relay-attached TPU a fresh XLA compile costs minutes and even a
persistent-cache load costs ~1.5 s, and the pipeline's pow2 shape buckets
grow as the map grows — so the first keyframe event at each new bucket
stalls. This module compiles upcoming shape buckets in a single background
worker thread using `fn.lower(*abstract_args).compile()` — abstract-shape
lowering, NO device execution — so the compiled executable is in the
persistent cache (and warm server-side) before the first real call needs it.

Best-effort by design: failures are swallowed, the worker is a daemon, and
duplicate requests are deduplicated by (function, shapes) key. Opt-in via
`SlamParameters.prewarmShapes`.
"""

from __future__ import annotations

import queue
import threading

_queue: "queue.Queue" = queue.Queue()
_seen: set = set()
_lock = threading.Lock()
_worker: threading.Thread | None = None
_enabled = True


def set_enabled(flag: bool) -> None:
    """Process-wide prewarm switch (System wires SlamParameters.prewarmShapes
    here so every call site can request prewarms unconditionally)."""
    global _enabled
    _enabled = bool(flag)


def _drain() -> None:
    while True:
        fn, args, kwargs = _queue.get()
        try:
            fn.lower(*args, **kwargs).compile()
        except Exception:
            pass  # best effort: bad spec / unsupported backend / shutdown


def _ensure_worker() -> None:
    global _worker
    if _worker is None or not _worker.is_alive():
        _worker = threading.Thread(
            target=_drain, name="shape-prewarm", daemon=True
        )
        _worker.start()


def _key_of(fn, args, kwargs):
    def leaf_key(x):
        shape = getattr(x, "shape", None)
        dtype = getattr(x, "dtype", None)
        return (shape, str(dtype)) if shape is not None else repr(x)

    import jax

    leaves, _ = jax.tree.flatten((args, kwargs))
    return (id(fn), tuple(leaf_key(x) for x in leaves))


def prewarm(fn, *args, **kwargs) -> bool:
    """Queue a background compile of `fn` for the given (abstract) args.

    Args may be jax.ShapeDtypeStruct pytrees — nothing touches the device.
    Returns False if this exact shape set was already queued (or prewarming
    is disabled via set_enabled).
    """
    if not _enabled:
        return False
    key = _key_of(fn, args, kwargs)
    with _lock:
        if key in _seen:
            return False
        _seen.add(key)
    _ensure_worker()
    _queue.put((fn, args, kwargs))
    return True


def pending() -> int:
    return _queue.qsize()
