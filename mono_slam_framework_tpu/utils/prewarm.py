"""Background shape prewarming.

Through a relay-attached TPU a fresh XLA compile costs minutes and even a
persistent-cache executable LOAD costs ~1.5 s, and the pipeline's pow2 shape
buckets grow as the map grows — so the first keyframe event at each new
bucket stalls. This module warms upcoming shape buckets in a single
background worker thread. Two modes:

  * compile-only (CPU backends): `fn.lower(*abstract_args).compile()` —
    abstract-shape lowering, NO device execution — so the executable lands
    in the persistent cache before the first real call needs it.
  * execute (non-CPU backends, default there): materialize each
    ShapeDtypeStruct as device zeros and CALL `fn` once. This populates
    fn's jit dispatch cache and loads the executable server-side, so the
    first real call at that bucket is a plain cache hit — compile-only
    still leaves it paying the ~1.5 s executable load through the relay
    (the jit dispatch cache does not key off `.lower().compile()` results).
    Results are discarded; zeros inputs are numerically harmless (NaNs in a
    discarded buffer at worst).

Best-effort by design: failures are swallowed, the worker is a daemon, and
duplicate requests are deduplicated by (function, shapes) key. Opt-in via
`SlamParameters.prewarmShapes`.
"""

from __future__ import annotations

import atexit
import queue
import threading

_queue: "queue.Queue" = queue.Queue()
_seen: set = set()
_lock = threading.Lock()
_worker: threading.Thread | None = None
_enabled = True
# None = auto (execute on non-CPU backends, compile-only on CPU — in-process
# CPU execution would burn the host core the pipeline shares); tests may pin.
_execute: bool | None = None


def set_enabled(flag: bool) -> None:
    """Process-wide prewarm switch (System wires SlamParameters.prewarmShapes
    here so every call site can request prewarms unconditionally)."""
    global _enabled
    _enabled = bool(flag)


def set_execute(flag: bool | None) -> None:
    """Pin the execute mode (None = auto by backend)."""
    global _execute
    _execute = flag


def _materialize(x):
    import jax
    import jax.numpy as jnp

    if isinstance(x, jax.ShapeDtypeStruct):
        return jnp.zeros(x.shape, x.dtype)
    return x


_inflight = threading.Event()


def _drain() -> None:
    while True:
        fn, args, kwargs = _queue.get()
        if not _enabled:
            continue  # shutdown drain: discard queued work
        _inflight.set()
        try:
            import jax

            do_exec = (
                _execute
                if _execute is not None
                else jax.default_backend() != "cpu"
            )
            if do_exec:
                c_args, c_kwargs = jax.tree.map(_materialize, (args, kwargs))
                fn(*c_args, **c_kwargs)
            else:
                fn.lower(*args, **kwargs).compile()
        except Exception:
            pass  # best effort: bad spec / unsupported backend / shutdown
        finally:
            _inflight.clear()


@atexit.register
def _shutdown() -> None:
    """Give an in-flight background compile a bounded window to finish.

    Daemon threads are killed abruptly at interpreter exit; dying inside
    native XLA compile code can abort the process ('FATAL: exception not
    rethrown'). Disabling new work and briefly joining the worker closes
    most of that window."""
    global _enabled
    _enabled = False
    w = _worker
    if w is not None and w.is_alive() and _inflight.is_set():
        w.join(timeout=15.0)


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
    """Queue a background warm of `fn` for the given (abstract) args.

    Args may be jax.ShapeDtypeStruct pytrees — compile-only mode never
    touches the device; execute mode materializes them as device zeros.
    Returns False if this exact shape set was already queued (or prewarming
    is disabled via set_enabled).
    """
    if not _enabled:
        return False
    if _execute is None:
        # auto mode: skip entirely on the CPU backend. Its in-process
        # compiler is not safe to run concurrently with a main-thread
        # compile (observed segfault: prewarm worker and pjit both inside
        # backend_compile_and_load), its compiles are cheap (no relay
        # executable load to hide), and speculative executables feed the
        # XLA-CPU mmap accumulation (KNOWN_ISSUES.md). Tests pin
        # set_execute(False/True) to exercise the worker on CPU.
        import jax

        if jax.default_backend() == "cpu":
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
