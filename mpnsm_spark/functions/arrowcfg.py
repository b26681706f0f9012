"""Per-python-worker Arrow thread-pool taming.

pyarrow sizes its compute and IO thread pools from ``os.cpu_count()`` — which
IGNORES cgroup/affinity limits. On a pinned or containerized executor every
python worker then spawns cpu_count threads: 16 workers x 32 threads on 16
actual CPUs is a context-switch storm that measured as a 10x+ blowup of the
Gorilla encode stage at high core counts. Every mapInPandas/applyInPandas
kernel in this engine calls :func:`tame_arrow_threads` first; the call is
idempotent and costs nothing after the first invocation in a worker.
"""

from __future__ import annotations

_done = False


def tame_arrow_threads() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import pyarrow as pa

        pa.set_cpu_count(1)
        pa.set_io_thread_count(1)
    except Exception:  # pragma: no cover - pyarrow always present on workers
        pass
