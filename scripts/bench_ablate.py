"""Ablation profile of the per-frame streaming cell.

Times scan loops that run only parts of the cell, to locate the per-frame
cost: full cell, frontend-only (STFT+features+synthesis, model bypassed),
model-only (frontend bypassed with precomputed features), and an
empty-carry control (carry shuttle cost).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, carry, audio):
    import jax

    jfn = jax.jit(fn)
    t0 = time.time()
    c2, out = jfn(carry, audio)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _, out = jfn(c2, audio)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return compile_s, best


def main():
    import jax
    import jax.numpy as jnp

    from deepfilternet_tpu.enhance import init_df
    from deepfilternet_tpu.streaming import StreamingRuntime

    print(f"device: {jax.devices()[0]}", flush=True)
    model, df_state, _ = init_df()
    sr, hop = df_state.sr, df_state.hop_size
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    seconds = 2.0
    t = int(seconds * sr) // hop * hop
    n_frames = t // hop
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((n_streams, t)).astype(np.float32) * 0.1)

    rt = StreamingRuntime(model, df_state, dtype=jnp.bfloat16)
    carry = rt.init(n_streams)

    def report(tag, compile_s, best):
        print(
            f"{tag:24s} compile={compile_s:6.1f}s wall={best * 1e3:8.1f}ms "
            f"per-frame={best / n_frames * 1e6:6.0f}us "
            f"rtf={n_streams * (t / sr) / best:9.0f}x",
            flush=True,
        )

    # 1. full cell
    def full(c, a):
        frames = jnp.moveaxis(a.reshape(a.shape[0], n_frames, hop), 1, 0)
        return jax.lax.scan(rt._cell, c, frames)

    report("full-cell", *timeit(full, carry, audio))

    # 2. frontend only: STFT analysis + features + synthesis of the raw spec
    from deepfilternet_tpu.ops.norms import erb_norm_step
    from deepfilternet_tpu.ops.stft import analysis_step_ri, synthesis_step_ri

    def frontend_cell(c, frame):
        amem, spec_re, spec_im = analysis_step_ri(c.analysis_mem, frame, rt.stft_cfg)
        power = spec_re**2 + spec_im**2
        erb_db = 10.0 * jnp.log10(power @ rt.erb_fwd + 1e-10)
        mn, feat_erb = erb_norm_step(c.mean_norm, erb_db, rt.alpha)
        mag_lo = jnp.sqrt(power[..., : rt.nb_df])
        un = mag_lo * (1.0 - rt.alpha) + c.unit_norm * rt.alpha
        smem, out = synthesis_step_ri(c.synthesis_mem, spec_re, spec_im, rt.stft_cfg)
        c = c._replace(analysis_mem=amem, synthesis_mem=smem, mean_norm=mn,
                       unit_norm=un)
        return c, out + feat_erb.sum() * 0

    def frontend(c, a):
        frames = jnp.moveaxis(a.reshape(a.shape[0], n_frames, hop), 1, 0)
        return jax.lax.scan(frontend_cell, c, frames)

    report("frontend-only", *timeit(frontend, carry, audio))

    # 3. model only: fixed features, no STFT
    f = rt.cfg["freq_bins"]
    spec_ri = jnp.asarray(
        rng.standard_normal((n_streams, f, 2)).astype(np.float32) * 0.3
    )
    fe = jnp.asarray(
        rng.standard_normal((n_streams, rt.nb_erb)), rt.dtype
    )
    fs = jnp.asarray(
        rng.standard_normal((n_streams, rt.nb_df, 2)), rt.dtype
    )
    spec_b = spec_ri.astype(rt.dtype)

    def model_cell(mc, _):
        mc, (spec_e, lsnr, mask) = rt.model.module.streaming_cell(
            rt.model.params, rt.model.state, rt.cfg, mc, spec_b, fe, fs
        )
        return mc, spec_e[..., 0].sum()

    def model_only(mc, a):
        return jax.lax.scan(model_cell, mc, jnp.arange(n_frames))

    report("model-only", *timeit(model_only, carry.model, audio))

    # 4. carry shuttle control: touch every carry leaf, no compute
    def shuttle_cell(c, frame):
        c2 = jax.tree.map(lambda x: x + jnp.asarray(1, x.dtype), c)
        return c2, frame

    def shuttle(c, a):
        frames = jnp.moveaxis(a.reshape(a.shape[0], n_frames, hop), 1, 0)
        return jax.lax.scan(shuttle_cell, c, frames)

    report("carry-shuttle", *timeit(shuttle, carry, audio))


if __name__ == "__main__":
    main()
