"""Does the axon relay permit CONCURRENT outstanding result fetches?

The pipelined serve tick (serve/server.py, VERDICT r4 item 1) overlaps
tick N's packed-result fetch with tick N+1's device work; whether it can
beat ~1/RTT ticks/s depends on the transport: if the relay serialises
host fetches, depth>1 pipelining only hides the (small) device step, and
1/RTT is the honest ceiling.  This probe measures exactly that:

* ``sync_ms``   — median RTT of one synchronous packed fetch;
* ``serial2_ms``  — two fetches issued back-to-back from one thread;
* ``conc2_ms``    — the same two fetches from two threads, wall time;
* ``overlap``     — serial2/conc2 (≈2 = full overlap, ≈1 = serialised).

Prints one JSON line.  Run in a HEALTHY relay window (python_loop_fps
~1400, CLAUDE.md) or the numbers only bound the degraded transport.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from gstreamer_vit_tracker_tpu.utils import compile_cache

    compile_cache.enable()
    f = jax.jit(lambda x, n: (x * n).sum(axis=0, keepdims=True))
    # Two independent source arrays -> two independent result buffers
    # (a shared input would serialise on the device side).
    xs = [jnp.asarray(np.random.default_rng(i).normal(size=(16, 5))
                      .astype(np.float32)) for i in range(4)]
    for x in xs:
        np.asarray(f(x, 1.0))          # warm

    def fetch(dev):
        return np.asarray(dev)

    def med(samples):
        return float(np.median(samples))

    sync = []
    for k in range(15):
        d = f(xs[k % 4], float(k + 2))
        t0 = time.perf_counter()
        fetch(d)
        sync.append((time.perf_counter() - t0) * 1e3)

    serial2 = []
    for k in range(15):
        d1, d2 = f(xs[0], float(k + 2)), f(xs[1], float(k + 3))
        jax.block_until_ready([d1, d2])
        t0 = time.perf_counter()
        fetch(d1)
        fetch(d2)
        serial2.append((time.perf_counter() - t0) * 1e3)

    conc2 = []
    with ThreadPoolExecutor(2) as ex:
        # Warm the pool threads' first-fetch path.
        list(ex.map(fetch, [f(xs[2], 9.0), f(xs[3], 9.0)]))
        for k in range(15):
            d1, d2 = f(xs[0], float(k + 20)), f(xs[1], float(k + 21))
            jax.block_until_ready([d1, d2])
            t0 = time.perf_counter()
            list(ex.map(fetch, [d1, d2]))
            conc2.append((time.perf_counter() - t0) * 1e3)

    out = {
        "metric": "relay_fetch_overlap",
        "sync_ms": round(med(sync), 2),
        "serial2_ms": round(med(serial2), 2),
        "conc2_ms": round(med(conc2), 2),
        "overlap": round(med(serial2) / max(med(conc2), 1e-9), 2),
        "value": round(med(serial2) / max(med(conc2), 1e-9), 2),
        "unit": "x", "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
