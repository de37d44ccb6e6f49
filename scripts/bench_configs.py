"""Per-config benchmark coverage of the BASELINE.json config list.

Measures, on one TPU chip, every configuration the reference's baseline
names (BASELINE.json "configs"), not just the single headline geometry:

  1. DeepFilterNet2 offline enhance of assets/noisy_snr0.wav
  2. DeepFilterNet3 batch enhancement with post-filter + delay compensation
  3. DeepFilterNet (v1) ERB-gain-only path (mask_only fidelity ablation)
  4. Low-latency streaming frame-by-frame at S=1 (us/frame vs the 10 ms
     real-time budget the reference's tract runtime is built around,
     tract.rs:509-642, enhance_wav.rs:166-173)
  5. df_order 1-5 multi-frame filtering sweep (streaming, S=1024)

Writes bench_configs.json at the repo root and prints one row per config.
Usage: python scripts/bench_configs.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HOP = 480
SR = 48000


def _bench(fn, reps=3):
    """(compile_s, best_wall_s) for fn() -> jax arrays."""
    import jax

    t0 = time.time()
    jax.block_until_ready(fn())
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn())
        best = min(best, time.time() - t0)
    return compile_s, best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="smaller batches (CPU/debug)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from deepfilternet_tpu.config import config
    from deepfilternet_tpu.enhance import enhance, init_df
    from deepfilternet_tpu.streaming import StreamingRuntime
    from deepfilternet_tpu.utils.audio_io import load_audio, resample

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    results = {}

    noisy_path = "/root/reference/assets/noisy_snr0.wav"
    noisy, sr0 = load_audio(noisy_path)
    if sr0 != SR:
        noisy = resample(noisy, sr0, SR)
    noisy_dur = noisy.shape[-1] / SR

    # ---- 1. DFN2 offline enhance of the golden asset --------------------
    m2, st2, _ = init_df(os.path.join(REPO, "pretrained", "dfn2_fixture_demo"))
    compile_s, wall = _bench(lambda: jnp.asarray(enhance(m2, st2, noisy)))
    results["dfn2_offline_golden_wav"] = {
        "rtf": round(noisy_dur / wall, 1), "wall_ms": round(wall * 1e3, 2),
        "audio_s": round(noisy_dur, 2), "batch": 1, "compile_s": round(compile_s, 1),
    }

    # ---- 2. DFN3 batch enhancement with post-filter ---------------------
    # The r03 number (56.8x aggregate) conflated three things: the offline
    # forward's [B,C,T,F] HBM-resident activations, ~200 MB of H2D+D2H
    # through the ~35 MB/s axon tunnel, and the harness's extra re-upload.
    # r04 splits them: batch enhancement routes through the streaming scan
    # (enhance backend="scan", frame-exact vs offline — tests/test_enhance
    # .py::test_scan_backend_matches_offline), compute is timed with
    # device-staged input and no output fetch (what a co-located datagen
    # pipeline pays), and the tunnel transfer is reported separately.
    from deepfilternet_tpu.enhance import _get_scan_runtime

    b = 16 if args.quick else 256
    secs = 2.0
    batch = (rng.standard_normal((b, int(secs * SR) // HOP * HOP)) * 0.1
             ).astype(np.float32)
    m3, st3, _ = init_df(os.path.join(REPO, "pretrained", "dfn3_fixture_demo"),
                         post_filter=True)
    rt3 = _get_scan_runtime(m3, st3, 0.0)
    dev_batch = jnp.asarray(batch)
    jax.block_until_ready(dev_batch)
    carry0 = rt3.init(b)
    compile_s, wall = _bench(lambda: rt3.process(carry0, dev_batch)[1])
    t0 = time.time()
    jax.block_until_ready(jnp.asarray(batch))
    h2d_s = time.time() - t0
    _, out_dev = rt3.process(carry0, dev_batch)
    t0 = time.time()
    np.asarray(out_dev)
    d2h_s = time.time() - t0
    results["dfn3_batch_pf"] = {
        "rtf": round(b * secs / wall, 1), "wall_ms": round(wall * 1e3, 2),
        "audio_s": secs, "batch": b, "compile_s": round(compile_s, 1),
        "post_filter": True, "delay_compensated": True, "backend": "scan",
        "tunnel_h2d_ms": round(h2d_s * 1e3, 1),
        "tunnel_d2h_ms": round(d2h_s * 1e3, 1),
        "rtf_e2e_tunnel": round(b * secs / (wall + h2d_s + d2h_s), 1),
    }

    # ---- 3. DFN1 ERB-gain-only ablation ---------------------------------
    m1, st1, _ = init_df(os.path.join(REPO, "pretrained", "dfn1_fixture_demo"),
                         mask_only=True)
    rt1b = _get_scan_runtime(m1, st1, 0.0)
    carry1 = rt1b.init(b)
    compile_s, wall = _bench(lambda: rt1b.process(carry1, dev_batch)[1])
    results["dfn1_erb_only_batch"] = {
        "rtf": round(b * secs / wall, 1), "wall_ms": round(wall * 1e3, 2),
        "audio_s": secs, "batch": b, "compile_s": round(compile_s, 1),
        "mask_only": True, "backend": "scan",
    }

    # ---- 4. low-latency streaming: single stream, frame by frame --------
    # lookahead-0 DFN3 (the reference's lowest-latency configuration;
    # total algorithmic latency = fft - hop = 10 ms). The number reported
    # is wall-clock us per 10 ms hop at S=1 — the single-stream real-time
    # margin.
    m3s, st3s, _ = init_df(os.path.join(REPO, "pretrained", "dfn3_fixture_demo"))
    rt1 = StreamingRuntime(m3s, st3s)
    carry = rt1.init(1)
    frame = jnp.asarray(batch[:1, :HOP])
    step = jax.jit(rt1.process_frame)
    carry, out = step(carry, frame)  # compile
    jax.block_until_ready(out)
    lat = []
    for _ in range(200):
        t0 = time.time()
        carry, out = step(carry, frame)
        jax.block_until_ready(out)
        lat.append(time.time() - t0)
    lat_us = np.array(lat) * 1e6
    results["dfn3_low_latency_s1"] = {
        "frame_us_p50": round(float(np.percentile(lat_us, 50)), 1),
        "frame_us_p99": round(float(np.percentile(lat_us, 99)), 1),
        "budget_us": 10000.0,
        "realtime_margin_x": round(10000.0 / float(np.percentile(lat_us, 50)), 1),
        "lookahead_frames": 0,
    }

    # ---- 5. df_order 1..5 sweep (streaming, S=1024) ---------------------
    s5 = 64 if args.quick else 1024
    secs5 = 1.0
    audio5 = jnp.asarray(
        (rng.standard_normal((s5, int(secs5 * SR) // HOP * HOP)) * 0.1
         ).astype(np.float32))
    sweep = {}
    for order in (1, 2, 3, 4, 5):
        config.reset()
        config.set("DF_ORDER", str(order), section="df")
        mo, sto, _ = init_df()
        rto = StreamingRuntime(mo, sto, dtype=jnp.bfloat16)
        c = rto.init(s5)
        c, _ = rto.process(c, audio5)  # compile
        compile_s, wall = _bench(lambda: rto.process(c, audio5)[1])
        sweep[f"order{order}"] = {
            "rtf": round(s5 * secs5 / wall, 1),
            "per_frame_us": round(wall / (audio5.shape[-1] // HOP) * 1e6, 1),
        }
        print(f"df_order={order}: rtf={sweep[f'order{order}']['rtf']}", flush=True)
    config.reset()
    results["df_order_sweep_s1024"] = sweep

    # ---- 6. export artifact round trip ON THE CHIP -----------------------
    # The deploy-artifact equivalent of the reference's tract pulse check
    # (scripts/test_model_tract_cli.sh): export the bundled DFN3 to a
    # tar.gz, load the serialized StableHLO back, and run one batch on the
    # device backend (VERDICT r3 #8; CPU round trip already covered by
    # tests/test_aux.py::test_export_and_reload).
    import tempfile

    from deepfilternet_tpu.scripts.export import export_model, load_exported

    with tempfile.TemporaryDirectory() as td:
        art = os.path.join(td, "dfn3.tar.gz")
        export_model(os.path.join(REPO, "pretrained", "dfn3_fixture_demo"), art)
        fn = load_exported(art, "offline.stablehlo")
        spec = jnp.zeros((1, 10, 481, 2))
        fe = jnp.zeros((1, 10, 32))
        fs = jnp.zeros((1, 10, 96, 2))
        compile_s, wall = _bench(lambda: fn(spec, fe, fs)[0])
        spec_e = fn(spec, fe, fs)[0]
        results["export_stablehlo_roundtrip"] = {
            "ok": bool(np.all(np.isfinite(np.asarray(spec_e)))),
            "backend": str(jax.devices()[0].platform),
            "wall_ms": round(wall * 1e3, 2),
            "compile_s": round(compile_s, 1),
        }

    for k, v in results.items():
        print(k, json.dumps(v), flush=True)
    out_path = os.path.join(REPO, "bench_configs.json")
    with open(out_path, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "results": results}, f, indent=2)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
