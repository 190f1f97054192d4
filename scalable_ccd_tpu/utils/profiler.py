"""Hierarchical JSON profiler.

Counterpart of the reference's compile-time-gated profiler
(``src/scalable_ccd/utils/profiler.hpp:15-97``): nested RAII scopes accumulate
``time_ms`` into a JSON tree keyed by scope path, with a cpu/device flag.
Here scopes are context managers; device scopes call
``jax.block_until_ready`` on values registered via :meth:`Profiler.sync` so
the measured wall-clock covers the asynchronous dispatch.  Enabled at runtime
(env ``SCALABLE_CCD_PROFILE=1`` or ``profiler().enable()``) instead of at
compile time; disabled scopes cost one attribute lookup.

The JSON shape mirrors the reference so per-stage numbers are directly
comparable: ``{"Broad Phase": {"time_ms": ..., "device": true, ...nested...}}``.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, List


class Profiler:
    def __init__(self) -> None:
        self._enabled = os.environ.get("SCALABLE_CCD_PROFILE", "0") not in ("0", "")
        self._root: Dict[str, Any] = {}
        self._stack: List[Dict[str, Any]] = [self._root]

    # -- control -------------------------------------------------------
    def enable(self) -> None:
        self._enabled = True

    def disable(self) -> None:
        self._enabled = False

    @property
    def enabled(self) -> bool:
        return self._enabled

    def clear(self) -> None:
        self._root.clear()
        self._stack = [self._root]

    # -- scopes --------------------------------------------------------
    @contextlib.contextmanager
    def scope(self, name: str, device: bool = False, sync: Any = None):
        """Profile a scope. ``sync`` is a pytree blocked on before stopping."""
        if not self._enabled:
            yield
            if sync is not None:
                pass
            return
        node = self._stack[-1].setdefault(name, {"time_ms": 0.0, "device": device})
        self._stack.append(node)
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            node["time_ms"] += (time.perf_counter() - start) * 1e3
            self._stack.pop()

    def block(self, value: Any) -> Any:
        """Block on a device value if profiling (so scopes measure real time)."""
        if self._enabled and value is not None:
            import jax

            jax.block_until_ready(value)
        return value

    # -- output --------------------------------------------------------
    def data(self) -> Dict[str, Any]:
        return self._root

    def print(self) -> None:  # noqa: A003 - mirrors reference API name
        print(json.dumps(self._root, indent=2))

    def dump(self, path: str, metadata: Dict[str, Any] | None = None) -> None:
        out = dict(self._root)
        if metadata:
            out["metadata"] = metadata
        with open(path, "w") as f:
            json.dump(out, f, indent=2)


_profiler: Profiler | None = None


def profiler() -> Profiler:
    """Singleton accessor (reference: ``profiler()``, profiler.hpp:22)."""
    global _profiler
    if _profiler is None:
        _profiler = Profiler()
    return _profiler
