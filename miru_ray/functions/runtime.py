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


_bw_memo: float | None = None


def mem_bw_gbps(nthread: int = 8, n: int = 1_000_000, reps: int = 24) -> float:
    """Aggregate numpy-triad GB/s across ``nthread`` threads — a ~100 ms
    probe of co-tenant MEMORY-bus interference, the covariate that moved
    the r3 driver bench 3× on unchanged code (VERDICT r3 §perf). numpy
    ufuncs release the GIL on large arrays, so threads genuinely contend
    for the bus. Memoized per process: the build pipeline probes once and
    sizes its heavy-task CPU reservation from the result.

    Calibration on this host: quiet ≈ 60–110 GB/s aggregate; the r3
    degraded windows measured 3–12 GB/s on the (slower) multiprocessing
    probe. A tiny warm-up round precedes measurement — first-touch page
    faults otherwise dominate (measured 9 vs 100 GB/s). Working set is
    3×8 MB/thread × 8 threads = 192 MB peak (past any L3, small enough
    not to OOM a memory-tight driver — the review-r4 sizing; more reps
    instead of bigger arrays)."""
    global _bw_memo
    if _bw_memo is not None:
        return _bw_memo
    import threading
    import time

    import numpy as np

    def worker(nn, rr, barrier, out, i):
        a = np.ones(nn); b = np.ones(nn); c = np.empty(nn)
        barrier.wait()
        t0 = time.perf_counter()
        for _ in range(rr):
            np.multiply(b, 2.0, out=c)
            np.add(c, a, out=c)
        out[i] = rr * 5 * nn * 8 / (time.perf_counter() - t0)

    def run(nt, nn, rr) -> float:
        out = [0.0] * nt
        barrier = threading.Barrier(nt)
        ts = [threading.Thread(target=worker, args=(nn, rr, barrier, out, i))
              for i in range(nt)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        return sum(out) / 1e9

    run(2, 1_000_000, 1)           # warm-up: numpy import paths + page faults
    _bw_memo = round(run(nthread, n, reps), 1)
    return _bw_memo


# below this aggregate bandwidth the bus is considered contended (co-tenant
# interference). Used for REPORTING only: shedding concurrency under a
# contended bus was measured and rejected — co-tenant pressure doesn't
# abate when we idle cores (build.py group_cpus comment has the numbers).
BUS_DEGRADED_GBPS = 30.0
