"""Stream-server scale test on the real chip (VERDICT r2 #6).

Starts a StreamServer in-process (real TPU runtime), then for each N in
the sweep spawns N concurrent clients paced at REALTIME (one 10 ms hop per
10 ms), runs for --seconds, and reports:

  * achieved batching factor: client frames per TPU dispatch
  * round-trip latency p50 / p99 per hop
  * sustainability: fraction of hops that met the 10 ms deadline

The run is sustainable when p99 < 10 ms and deadline misses ~0; the
largest sustainable N is the server's per-chip capacity at realtime
pacing. Writes bench_serve.json at the repo root.

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


def run_clients(port, n_clients, seconds, rng):
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
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join(timeout=5)
    all_lat = np.array([x for l in lat for x in l]) * 1e3
    total = len(all_lat)
    return {
        "hops": total,
        "p50_ms": round(float(np.percentile(all_lat, 50)), 2),
        "p99_ms": round(float(np.percentile(all_lat, 99)), 2),
        "max_ms": round(float(all_lat.max()), 2),
        "deadline_miss_pct": round(100.0 * sum(misses) / max(total, 1), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", default="16,64,128,256")
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--model", default=None)
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
    rng = np.random.default_rng(0)
    results = {}
    for n in [int(x) for x in args.sweep.split(",")]:
        model, df_state, _ = init_df(args.model)
        srv = StreamServer(model, df_state, port=0, max_streams=n)
        srv.start()
        port = srv._sock.getsockname()[1]
        r = run_clients(port, n, args.seconds, rng)
        r["batching_factor"] = round(
            srv.frames_processed / max(srv.dispatches, 1), 2
        )
        r["dispatches"] = srv.dispatches
        r["sustainable"] = bool(r["p99_ms"] < 10.0
                                and r["deadline_miss_pct"] < 1.0)
        srv.stop()
        results[str(n)] = r
        print(f"N={n:4d} {json.dumps(r)}", flush=True)
        if not r["sustainable"]:
            break
    out = os.path.join(REPO, "bench_serve.json")
    with open(out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "results": results}, f,
                  indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
