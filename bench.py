"""Benchmark: aggregate real-time factor of streaming DFN3 on one TPU chip.

Prints ONE JSON line:
  {"metric": "aggregate_rtf_streams_per_chip", "value": N, "unit": "x_realtime",
   "vs_baseline": N/2000}

The metric is (streams * audio_seconds) / wall_seconds for the FULL
streaming pipeline (STFT, features, model, DF, ISTFT) over a batch of
independent 48 kHz streams — the BASELINE.json north star (>=2000x per
chip at DFN3 parity). Extra diagnostics go to stderr.

Runs the bf16 runtime by default (BENCH_DTYPE=f32 to override): weights/
features in bfloat16, spectrum/DF/mask application in f32 — measured at
quality parity on the golden asset with the bundled demo model (bf16 vs
f32 STOI differs in the 4th decimal). BENCH_STREAMS/BENCH_SECONDS/
BENCH_UNROLL override the batch geometry.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # Backend-init watchdog: a dead TPU transport makes jax.devices() hang
    # forever (observed r03: the axon relay died and every backend init
    # blocked indefinitely). Fail fast with a diagnosable record instead
    # of eating the whole driver budget.
    from deepfilternet_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    import threading

    ready = threading.Event()

    def _probe():
        import jax as _jax

        _probe.devices = _jax.devices()  # noqa: B023 — stash for logging
        ready.set()

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    budget = float(os.environ.get("BENCH_BACKEND_TIMEOUT_S", "600"))
    if not ready.wait(budget):
        print(json.dumps({
            "metric": "aggregate_rtf_streams_per_chip",
            "value": 0.0,
            "unit": "x_realtime",
            "vs_baseline": 0.0,
            "error": f"TPU backend init did not complete in {budget:.0f}s "
                     "(transport down?)",
        }), flush=True)
        os._exit(1)

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the 2048-stream program takes minutes to
    # compile cold; cached re-runs (same jaxlib + flags) start in seconds.
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never a failure
        log(f"compilation cache unavailable: {e}")

    from deepfilternet_tpu.enhance import init_df
    from deepfilternet_tpu.streaming import StreamingRuntime

    dev = jax.devices()[0]
    log(f"device: {dev}")

    model, df_state, _ = init_df()
    dt_name = os.environ.get("BENCH_DTYPE", "bf16")
    if dt_name not in ("bf16", "f32"):
        sys.exit(f"BENCH_DTYPE must be bf16 or f32, got {dt_name!r}")
    dtype = jnp.float32 if dt_name == "f32" else jnp.bfloat16
    unroll = int(os.environ.get("BENCH_UNROLL", "1"))
    # Default is the per-frame scan runtime: best measured config on chip
    # (58k @ S=4096 bf16). The whole-cell Pallas kernel currently tops out
    # at 53.7k (s_blk=512, chunk=4, t_major) — see PERF.md; keep it opt-in
    # until it beats the scan.
    runtime = os.environ.get("BENCH_RUNTIME", "scan")
    log(f"runtime: {runtime} dtype: {dtype.__name__} unroll: {unroll}")
    if runtime == "xcell":
        # packed-carry XLA scan over the prefolded SSA cell
        # (ops/pallas_cell.py cell_process_xla)
        from deepfilternet_tpu.streaming_pallas import PallasStreamingRuntime

        rt = PallasStreamingRuntime(
            model, df_state, matmul_dtype=dtype, backend="xla",
            chunk=int(os.environ.get("BENCH_CHUNK", "8")),
        )
    elif runtime == "pallas":
        # whole-cell fused kernel (ops/pallas_cell.py): frames loop inside
        # one Pallas program, weights VMEM-resident per stream block
        from deepfilternet_tpu.streaming_pallas import PallasStreamingRuntime

        rt = PallasStreamingRuntime(
            model, df_state, matmul_dtype=dtype,
            s_blk=int(os.environ.get("BENCH_SBLK", "512")),
            chunk=int(os.environ.get("BENCH_CHUNK", "4")),
            t_major=os.environ.get("BENCH_TMAJOR", "1") == "1",
        )
    else:
        # fuse_ops defaults ON: measured 62,480x vs 58,129x plain scan at
        # S=4096/2s/bf16 (PERF.md r03) at 3e-7 parity. packed_carry measured
        # a 47% loss; unroll>1 loses even composed with fuse_ops.
        rt = StreamingRuntime(
            model, df_state, dtype=dtype, unroll=unroll,
            fused=os.environ.get("BENCH_FUSED", "0") == "1",
            use_pallas=os.environ.get("BENCH_PFRONTEND", "0") == "1",
            packed_carry=os.environ.get("BENCH_PACKED", "0") == "1",
            fuse_ops=os.environ.get("BENCH_FUSE_OPS", "1") == "1",
            # refuted levers (PERF.md r04 "refuted levers" — all three
            # measured slower than the r03 fuse_ops config): dense
            # dw+pw+BN conv fold; dec/df GRU pair merge
            fuse_convs=os.environ.get("BENCH_FUSE_CONVS", "0") == "1",
            fuse_gru_pairs=os.environ.get("BENCH_FUSE_PAIRS", "0") == "1",
            # capacity knob for S=8192: the stacked [T,S,hop] scan output
            # is what OOMs past 4096, not the carry (see PERF.md)
            out_dtype=jnp.bfloat16
            if os.environ.get("BENCH_OUT_DTYPE", "f32") == "bf16" else None,
        )

    # 4096 streams amortize the scan's fixed per-iteration overhead better
    # than 2048 (+19% aggregate RTF same-day); 2 s of audio is enough for a
    # steady-state rate and keeps the in/out buffers well inside HBM
    n_streams = int(os.environ.get("BENCH_STREAMS", "4096"))
    seconds = float(os.environ.get("BENCH_SECONDS", "2.0"))
    sr = df_state.sr
    hop = df_state.hop_size
    t = int(seconds * sr) // hop * hop

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((n_streams, t)).astype(np.float32) * 0.1)

    carry = rt.init(n_streams)
    # warmup / compile
    t0 = time.time()
    carry2, out = rt.process(carry, audio)
    out.block_until_ready()
    log(f"compile+first run: {time.time() - t0:.1f}s")

    # timed runs — variance protocol (VERDICT r04 #3): >=5 repeated
    # measurements post-compile; the headline is the MEDIAN, with the
    # spread recorded so round-over-round deltas are interpretable
    # against session drift (PERF.md documents ~2% same-code drift).
    n_rep = int(os.environ.get("BENCH_REPS", "5"))
    times = []
    for _ in range(n_rep):
        t0 = time.time()
        carry2, out = rt.process(carry2, audio)
        out.block_until_ready()
        times.append(time.time() - t0)
    audio_seconds = n_streams * (t / sr)
    rtfs = sorted(audio_seconds / x for x in times)
    p50 = float(np.median(rtfs))
    log(f"streams={n_streams} audio={t/sr:.1f}s wall_p50={np.median(times)*1e3:.1f}ms "
        f"per-frame={np.median(times)/(t//hop)*1e6:.0f}us "
        f"aggregate_rtf p50={p50:.0f}x min={rtfs[0]:.0f}x max={rtfs[-1]:.0f}x "
        f"(n={n_rep})")

    print(json.dumps({
        "metric": "aggregate_rtf_streams_per_chip",
        "value": round(p50, 1),
        "unit": "x_realtime",
        "vs_baseline": round(p50 / 2000.0, 3),
        "rtf_min": round(rtfs[0], 1),
        "rtf_max": round(rtfs[-1], 1),
        "n_rep": n_rep,
        "spread_pct": round(100.0 * (rtfs[-1] - rtfs[0]) / p50, 2),
    }))


if __name__ == "__main__":
    main()
