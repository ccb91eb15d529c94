"""Worker-side runtime knobs.

Ray expresses parallelism as task/actor slots (``num_cpus``); pyarrow
meanwhile sizes its internal kernel thread pool to the MACHINE's core
count. Inside a Ray worker that combination oversubscribes (n tasks × 32
arrow threads) and — worse for measurement — lets a low-``num_cpus``
session silently use every core, corrupting scaling-efficiency numbers.
Heavy stage bodies call ``limit_worker_threads()`` once per process so
per-task cost is uniform across parallelism levels.
"""

from __future__ import annotations

_done = False


def limit_worker_threads(n: int = 2) -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import pyarrow as pa
        pa.set_cpu_count(n)
        pa.set_io_thread_count(max(2, n))
    except Exception:
        pass
