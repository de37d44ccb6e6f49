"""Scan-unroll experiment: full streaming cell with lax.scan unroll 1/2/4/8."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from deepfilternet_tpu.enhance import init_df
    from deepfilternet_tpu.streaming import StreamingRuntime

    print(f"device: {jax.devices()[0]}", flush=True)
    model, df_state, _ = init_df()
    sr, hop = df_state.sr, df_state.hop_size
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    unrolls = [int(u) for u in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["1", "2", "4", "8"])]
    seconds = 2.0
    t = int(seconds * sr) // hop * hop
    n_frames = t // hop
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((n_streams, t)).astype(np.float32) * 0.1)

    rt = StreamingRuntime(model, df_state, dtype=jnp.bfloat16)
    carry = rt.init(n_streams)

    for u in unrolls:

        rt.unroll = u
        rt._process_jit.clear()
        run = rt._get_process(n_frames)

        t0 = time.time()
        c2, out = run(carry, audio)
        out.block_until_ready()
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            _, out = run(c2, audio)
            out.block_until_ready()
            best = min(best, time.time() - t0)
        rtf = n_streams * (t / sr) / best
        print(
            f"unroll={u:2d} compile={compile_s:6.1f}s wall={best * 1e3:8.1f}ms "
            f"per-frame={best / n_frames * 1e6:6.0f}us rtf={rtf:9.0f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
