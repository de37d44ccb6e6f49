"""Perf experiment: per-frame scan vs chunked runtime, f32 vs bf16.

Measures aggregate RTF of the full streaming pipeline on the attached
device for a grid of (runtime, dtype, chunk_frames) points. Diagnostics
only — bench.py remains the official metric.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from deepfilternet_tpu.enhance import init_df
    from deepfilternet_tpu.streaming import ChunkedStreamingRuntime, StreamingRuntime

    print(f"device: {jax.devices()[0]}", flush=True)
    model, df_state, _ = init_df()
    sr, hop = df_state.sr, df_state.hop_size
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    seconds = 4.0
    t = int(seconds * sr) // hop * hop
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((n_streams, t)).astype(np.float32) * 0.1)

    def run(tag, rt):
        carry = rt.init(n_streams)
        t0 = time.time()
        carry2, out = rt.process(carry, audio)
        out.block_until_ready()
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            _, out = rt.process(carry2, audio)
            out.block_until_ready()
            best = min(best, time.time() - t0)
        rtf = n_streams * (t / sr) / best
        print(
            f"{tag:28s} compile={compile_s:6.1f}s wall={best * 1e3:8.1f}ms "
            f"per-frame={best / (t // hop) * 1e6:6.0f}us rtf={rtf:9.0f}x",
            flush=True,
        )

    grid = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "frame-bf16", "chunk20-f32", "chunk20-bf16", "chunk50-bf16", "chunk100-bf16",
    ]
    for g in grid:
        if g.startswith("frame"):
            dt = jnp.bfloat16 if g.endswith("bf16") else jnp.float32
            run(g, StreamingRuntime(model, df_state, dtype=dt))
        else:
            cf = int(g[5:].split("-")[0])
            dt = jnp.bfloat16 if g.endswith("bf16") else jnp.float32
            run(g, ChunkedStreamingRuntime(model, df_state, chunk_frames=cf, dtype=dt))


if __name__ == "__main__":
    main()
