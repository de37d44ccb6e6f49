"""Stream-server scale test on the real chip (VERDICT r3 #1, r4 rerun).

Starts a StreamServer in-process (real TPU runtime), then for each N in
the sweep spawns N concurrent clients paced at REALTIME (one 10 ms hop
per 10 ms), runs for --seconds, and reports two separate verdicts:

  * sustainable_e2e — did p99 round trip beat the 10 ms deadline THROUGH
    THIS TRANSPORT? On axon the chip sits behind an HTTP relay that
    charges ~27 ms per host sync/transfer (bench_dispatch.json), so this
    is false by construction here; it is the honest end-to-end number for
    this environment, not a property of the server.
  * sustainable_colocated — is the tick's DEVICE-ONLY cost under 10 ms?
    Measured by `StreamServer.measure_chip_tick()`: n dependent tick
    dispatches with device-resident inputs, ONE host sync at the end, so
    the per-call transport RTT amortizes away. This is what a co-located
    deployment (chip on the host's PCIe/ICI, like the reference's
    laptop-CPU runtime) would pay per 10 ms tick.

Also records the transport's TWO states (the r04 "fast path" was not a
size threshold: synced dispatches cost ~0.03 ms until the process's
FIRST device->host fetch, ~28 ms ever after — see PERF.md "Dispatch
anatomy") and the achieved batching factor (client frames per TPU
dispatch). Writes bench_serve.json at the repo root.

Usage: python scripts/bench_serve.py [--sweep 16,64,128,256] [--seconds 5]
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HOP = 480
SR = 48000


def run_clients(port, n_clients, seconds, rng, srv=None):
    from deepfilternet_tpu.serve import StreamClient

    lat = [[] for _ in range(n_clients)]
    misses = [0] * n_clients
    barrier = threading.Barrier(n_clients + 1)
    stop = threading.Event()

    def client(ci):
        # no deadline: the warm frame below waits on the server's cold
        # slot-pool compile (minutes); pacing starts after the barrier
        c = StreamClient(port=port, timeout=None)
        hop = (rng.standard_normal(HOP) * 0.1).astype(np.float32)
        c.process_frame(hop)  # join the pool / warm slot
        barrier.wait()
        t0 = time.time()
        i = 0
        while not stop.is_set():
            target = t0 + i * HOP / SR
            now = time.time()
            if now < target:
                time.sleep(target - now)
            t1 = time.time()
            c.process_frame(hop)
            dt = time.time() - t1
            lat[ci].append(dt)
            if dt > HOP / SR:
                misses[ci] += 1
            i += 1
        c.close()

    threads = [threading.Thread(target=client, args=(ci,), daemon=True)
               for ci in range(n_clients)]
    for t in threads:
        t.start()
    barrier.wait()
    if srv is not None:  # dispatches so far are warmup/compile — skip them
        srv.dispatch_times.clear()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join(timeout=5)
    all_lat = np.array([x for l in lat for x in l]) * 1e3
    total = len(all_lat)
    r = {
        "hops": total,
        "p50_ms": round(float(np.percentile(all_lat, 50)), 2),
        "p99_ms": round(float(np.percentile(all_lat, 99)), 2),
        "max_ms": round(float(all_lat.max()), 2),
        "deadline_miss_pct": round(100.0 * sum(misses) / max(total, 1), 2),
    }
    if srv is not None:
        d = np.array(srv.dispatch_times) * 1e3
        if len(d):
            # submit -> output-on-host per tick; includes the transport RTT
            # behind a relay (ticks pipeline, so throughput can exceed
            # 1/pipeline_latency)
            r["pipeline_ms_p50"] = round(float(np.percentile(d, 50)), 2)
            r["pipeline_ms_p99"] = round(float(np.percentile(d, 99)), 2)
    return r


def _probe_transport_states():
    """Measure BOTH transport states explicitly (PERF.md "Dispatch
    anatomy", r05 finding): synced device-only dispatches are ~0.03 ms
    until the process's FIRST device->host fetch; ONE np.asarray of any
    size flips every later synced round trip to ~28 ms, permanently.

    Must run at the very top of the process — the clean state exists only
    before anything fetches (even a compile-heavy phase can flip it)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((1024,), jnp.float32)  # 4 KB output
    jax.block_until_ready(f(x))  # compile (no host fetch)

    def timed(n=20):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            ts.append(time.perf_counter() - t0)
        return round(float(np.percentile(np.array(ts) * 1e3, 50)), 2)

    pre_ms = timed()
    # the state flip: one 4 KB device->host fetch
    t0 = time.perf_counter()
    np.asarray(f(x))
    fetch_ms = round((time.perf_counter() - t0) * 1e3, 2)
    post_ms = timed()
    print(f"transport states: pre-fetch synced dispatch {pre_ms} ms | "
          f"first 4 KB fetch {fetch_ms} ms | post-fetch {post_ms} ms",
          flush=True)
    return {"pre_fetch_ms_p50": pre_ms, "first_fetch_4kb_ms": fetch_ms,
            "post_fetch_ms_p50": post_ms}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", default="16,64,128,256")
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--model", default=None)
    ap.add_argument("--no-fuse-ops", dest="fuse_ops", action="store_false",
                    help="disable the op-chain-fused runtime (the measured-"
                         "fastest config, default on)")
    ap.add_argument("--capacity", default="",
                    help="comma-separated slot-pool sizes for a device-only "
                         "chip-tick sweep (no clients) — finds where the "
                         "colocated 10 ms budget runs out, e.g. "
                         "512,1024,2048,4096")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from deepfilternet_tpu.enhance import init_df
    from deepfilternet_tpu.serve import StreamServer

    print(f"device: {jax.devices()[0]}", flush=True)

    # Transport probe at the VERY top: the clean (pre-first-fetch) state
    # exists only at process start — a 2026-08 re-run showed the state
    # also flips somewhere inside the long compile-heavy capacity phase
    # even without an explicit fetch, so probing after it reads ~28 ms
    # for "pre" too. Probe first, then sweep.
    probe = _probe_transport_states()

    # Capacity sweep next: measure_chip_tick chains dispatches with one
    # final sync, so it is nearly state-independent (the r04 N=16
    # "2.56 ms anomaly" was state contamination — fresh-process ticks
    # read 0.8-0.9 ms at N=16 AND N=64, probe r05).
    capacity = {}
    for n in [int(x) for x in args.capacity.split(",") if x]:
        model, df_state, _ = init_df(args.model)
        srv = StreamServer(model, df_state, port=0, max_streams=n,
                           fuse_ops=args.fuse_ops)
        ms = round(srv.measure_chip_tick(n=50), 2)
        capacity[str(n)] = {"chip_tick_ms": ms,
                            "deadline_margin_x": round(10.0 / ms, 1)}
        print(f"capacity N={n:5d} tick={ms} ms "
              f"(margin {capacity[str(n)]['deadline_margin_x']}x)", flush=True)

    rng = np.random.default_rng(0)
    results = {}
    for n in [int(x) for x in args.sweep.split(",") if x]:
        model, df_state, _ = init_df(args.model)
        srv = StreamServer(model, df_state, port=0, max_streams=n,
                           fuse_ops=args.fuse_ops)
        srv.start()
        port = srv._sock.getsockname()[1]
        # device-only tick cost first (idle server, shared executable)
        chip_tick_ms = round(srv.measure_chip_tick(n=50), 2)
        r = run_clients(port, n, args.seconds, rng, srv=srv)
        r["batching_factor"] = round(
            srv.frames_processed / max(srv.dispatches, 1), 2
        )
        r["dispatches"] = srv.dispatches
        r["sustainable_e2e"] = bool(r["p99_ms"] < 10.0
                                    and r["deadline_miss_pct"] < 1.0)
        r["chip_tick_ms"] = chip_tick_ms
        r["sustainable_colocated"] = bool(chip_tick_ms < 10.0)
        srv.stop()
        results[str(n)] = r
        print(f"N={n:4d} {json.dumps(r)}", flush=True)
    out = os.path.join(REPO, "bench_serve.json")
    prev = {}
    if os.path.exists(out):  # partial runs update, not clobber
        try:
            with open(out) as f:
                prev = json.load(f)
        except Exception:
            prev = {}
    payload = {"device": str(jax.devices()[0]),
               "tunnel_rtt_ms_p50": probe["post_fetch_ms_p50"],
               "tunnel_rtt_prefetch_state_ms_p50": probe["pre_fetch_ms_p50"],
               "fetch_rtt_4kb_ms_p50": probe["first_fetch_4kb_ms"],
               "results": results or prev.get("results", {}),
               "capacity": capacity or prev.get("capacity", {})}
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
