"""Anatomy of a single TPU dispatch behind the axon relay (VERDICT r3 #1a).

The r03 evidence was internally inconsistent: a bare 1-op round trip
measured 0.06 ms while a jitted single-frame `process_frame` (S=1)
measured 27.8 ms p50. Everything the serve story claims hangs on which
one is the truth, so this harness measures dispatch cost as a function of
each candidate cost driver separately:

  * buffers:  K-input/K-output programs, K in {1,2,4,8,16,32}
              (is the relay charging per buffer handle?)
  * bytes:    1-in/1-out with payload 4 KB ... 16 MB, with and without a
              host fetch (is it bandwidth?)
  * ops:      chains of M dependent [256,256] matmuls (is it per-op issue
              cost inside one executable?)
  * real:     StreamingRuntime.process_frame at S in {1,16,256}, timed as
              (a) device-in/device-out with block_until_ready, and
              (b) + host fetch of the output (np.asarray), and the serve
              tick's extra `_select_active` program

FINDING (r05): the dominant cost driver is a process-level TRANSPORT
STATE, not size/buffers/ops. Until the first device->host fetch, synced
dispatches cost ~0.03 ms at any size up to >=1 MB (E2b); after ONE
np.asarray of any size, every synced round trip costs ~28 ms, permanently
(so E2's with_fetch rows, and everything after them — E3, E4 — sit at
~28 ms+). Real inference must fetch results, so ~28 ms/sync is the honest
per-tick transport cost in this environment.

Writes bench_dispatch.json at the repo root. Run ON THE CHIP.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timed(fn, n=30, warmup=3):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    a = np.array(ts) * 1e3
    return {"p50_ms": round(float(np.percentile(a, 50)), 3),
            "p90_ms": round(float(np.percentile(a, 90)), 3),
            "min_ms": round(float(a.min()), 3)}


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    out = {"device": str(jax.devices()[0])}
    print(f"device: {out['device']}", flush=True)

    # -- E1: buffer-count sweep (tiny payloads) -----------------------------
    res = {}
    for k in (1, 2, 4, 8, 16, 32):
        xs = [jnp.full((8,), i, jnp.float32) for i in range(k)]

        @jax.jit
        def f(*vs):
            return tuple(v + 1.0 for v in vs)

        r = f(*xs)
        jax.block_until_ready(r)
        res[str(k)] = timed(lambda: jax.block_until_ready(f(*xs)))
        print(f"buffers k={k}: {res[str(k)]}", flush=True)
    out["buffers"] = res

    # -- E2b: transport-state sweep (VERDICT r04 #4) -------------------------
    # The r04 "inline fast path" is NOT a payload-size threshold. Synced
    # device-only dispatches cost ~0.03 ms at ANY size 4 KB..1 MB while the
    # process has never fetched a result to the host; the FIRST
    # device->host fetch (np.asarray, any size — see E2 below, which runs
    # after this and flips the state) degrades every later synced dispatch
    # to ~28 ms, permanently. This sweep runs FIRST so it records the
    # pre-fetch state across sizes; re-run any single E after a fetch to
    # see the ~28 ms state (bench_serve.py records both states directly).
    res = {}
    for nbytes in (4 << 10, 16 << 10, 64 << 10, 128 << 10, 256 << 10,
                   512 << 10, 1 << 20):
        n = nbytes // 4
        x = jnp.zeros((n,), jnp.float32)
        f = jax.jit(lambda v: v + 1.0)
        jax.block_until_ready(f(x))
        res[str(nbytes)] = timed(lambda: jax.block_until_ready(f(x)), n=20)
        print(f"prefetch-state bytes={nbytes}: {res[str(nbytes)]}", flush=True)
    out["fastpath_threshold"] = res

    # -- E2: payload-size sweep, device-resident vs host fetch --------------
    res = {}
    for nbytes in (4 << 10, 1 << 20, 16 << 20):
        n = nbytes // 4
        x = jnp.zeros((n,), jnp.float32)
        f = jax.jit(lambda v: v + 1.0)
        jax.block_until_ready(f(x))
        row = {"device_only": timed(lambda: jax.block_until_ready(f(x)))}
        row["with_fetch"] = timed(lambda: np.asarray(f(x)))
        h = np.zeros((n,), np.float32)
        row["with_h2d"] = timed(lambda: jax.block_until_ready(f(jnp.asarray(h))))
        res[str(nbytes)] = row
        print(f"bytes={nbytes}: {row}", flush=True)
    out["payload"] = res

    # -- E3: op-count sweep (one executable, M dependent matmuls) -----------
    res = {}
    w = jnp.eye(256, dtype=jnp.float32) * 0.999
    x = jnp.ones((8, 256), jnp.float32)
    for m in (1, 10, 100, 400):
        def mk(m):
            @jax.jit
            def f(v):
                for _ in range(m):
                    v = v @ w
                return v
            return f
        f = mk(m)
        jax.block_until_ready(f(x))
        res[str(m)] = timed(lambda: jax.block_until_ready(f(x)))
        print(f"ops m={m}: {res[str(m)]}", flush=True)
    out["ops"] = res

    # -- E4: the real single-frame runtime ----------------------------------
    from deepfilternet_tpu.enhance import init_df
    from deepfilternet_tpu.streaming import StreamingRuntime

    model, df_state, _ = init_df()
    res = {}
    for s in (1, 16, 256):
        rt = StreamingRuntime(model, df_state, fuse_ops=True)
        carry = rt.init(s)
        frame = jnp.zeros((s, df_state.hop_size), jnp.float32)
        pf = jax.jit(rt.process_frame)
        c2, o = pf(carry, frame)
        jax.block_until_ready((c2, o))
        row = {}
        # (a) device-in/device-out, sync on everything
        def dev_only():
            c, o = pf(carry, frame)
            jax.block_until_ready((c, o))
        row["device_only"] = timed(dev_only, n=20)
        # (b) output fetched to host (what the serve tick does)
        def with_fetch():
            c, o = pf(carry, frame)
            np.asarray(o)
        row["with_fetch"] = timed(with_fetch, n=20)
        # (c) + H2D of a fresh numpy frame each call (serve tick reality)
        hf = np.zeros((s, df_state.hop_size), np.float32)
        def full_tick():
            c, o = pf(carry, jnp.asarray(hf))
            np.asarray(o)
        row["with_h2d_and_fetch"] = timed(full_tick, n=20)
        res[f"S{s}"] = row
        print(f"process_frame S={s}: {row}", flush=True)
    out["process_frame"] = res

    with open(os.path.join(REPO, "bench_dispatch.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote bench_dispatch.json", flush=True)


if __name__ == "__main__":
    main()
