"""Whole-cell Pallas kernel vs the lax.scan streaming runtime.

Runs the kernel in Pallas interpreter mode on CPU with f32 matmuls, so any
disagreement with StreamingRuntime is a real layout/semantics bug, not
precision noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfilternet_tpu.enhance import init_df
from deepfilternet_tpu.streaming import RuntimeParams, StreamingRuntime
from deepfilternet_tpu.streaming_pallas import PallasStreamingRuntime

HOP = 480


@pytest.fixture(scope="module")
def model():
    return init_df()  # random-init DFN3, default config


def _audio(s, frames, seed=0, scale=0.1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((s, frames * HOP)).astype(np.float32) * scale
    )


def _run_pair(model_t, params=RuntimeParams(), s=4, frames=8, audio=None,
              **pallas_kw):
    m, df_state, _ = model_t
    audio = _audio(s, frames) if audio is None else audio
    ref = StreamingRuntime(m, df_state, params)
    cr = ref.init(s)
    cr, out_ref = ref.process(cr, audio)
    prt = PallasStreamingRuntime(
        m, df_state, params, matmul_dtype=jnp.float32, s_blk=s, chunk=4,
        interpret=True, **pallas_kw,
    )
    cp = prt.init(s)
    cp, out_p = prt.process(cp, audio)
    return (cr, out_ref), (cp, out_p)


def test_output_parity(model):
    (cr, out_ref), (cp, out_p) = _run_pair(model)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_ref), atol=2e-4, rtol=1e-3
    )


def test_output_parity_t_major(model):
    """Time-major audio layout (frames-leading blocks) is bit-equivalent
    in frame math; only the block transfer pattern differs."""
    (cr, out_ref), (cp, out_p) = _run_pair(model, t_major=True)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_ref), atol=2e-4, rtol=1e-3
    )


def test_carry_parity(model):
    (cr, _), (cp, _) = _run_pair(model)
    for name in ("analysis_mem", "synthesis_mem", "mean_norm", "unit_norm"):
        np.testing.assert_allclose(
            np.asarray(getattr(cp, name)), np.asarray(getattr(cr, name)),
            atol=2e-4, rtol=1e-3, err_msg=name,
        )
    for name in ("enc_gru_h", "dec_gru_h", "df_gru_h", "df_ring_re",
                 "df_ring_im", "erb_buf", "spec_buf"):
        np.testing.assert_allclose(
            np.asarray(getattr(cp.model, name)),
            np.asarray(getattr(cr.model, name)),
            atol=2e-4, rtol=1e-3, err_msg=name,
        )


def test_chunk_continuity(model):
    """Two 4-frame calls == one 8-frame call (state-continuous chunks)."""
    m, df_state, _ = model
    audio = _audio(2, 8, seed=1)
    prt = PallasStreamingRuntime(
        m, df_state, matmul_dtype=jnp.float32, s_blk=2, chunk=4, interpret=True
    )
    c1 = prt.init(2)
    c1, o_full = prt.process(c1, audio)
    c2 = prt.init(2)
    c2, o_a = prt.process(c2, audio[:, : 4 * HOP])
    c2, o_b = prt.process(c2, audio[:, 4 * HOP :])
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([o_a, o_b], -1)), np.asarray(o_full),
        atol=1e-5, rtol=1e-5,
    )


def test_runtime_params_parity(model):
    params = RuntimeParams(atten_lim_db=12.0, post_filter_beta=0.02,
                           lsnr_gating=True)
    (_, out_ref), (_, out_p) = _run_pair(model, params=params, frames=4)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_ref), atol=2e-4, rtol=1e-3
    )


def test_silence_skip(model):
    """Quiet frames mute the output after silence_skip_frames."""
    m, df_state, _ = model
    s, frames = 2, 8
    audio = jnp.zeros((s, frames * HOP), jnp.float32)
    prt = PallasStreamingRuntime(
        m, df_state, matmul_dtype=jnp.float32, s_blk=s, chunk=4, interpret=True
    )
    c = prt.init(s)
    c, out = prt.process(c, audio)
    assert int(c.silence_ctr[0]) == frames
    np.testing.assert_allclose(np.asarray(out[:, 6 * HOP :]), 0.0, atol=1e-12)


def test_reduce_mask_unsupported(model):
    m, df_state, _ = model
    with pytest.raises(NotImplementedError):
        PallasStreamingRuntime(
            m, df_state, RuntimeParams(reduce_mask="max", n_channels=2)
        )


def test_output_parity_xla_backend(model):
    """cell_process_xla (packed-carry lax.scan, no Mosaic) matches the
    reference runtime, including carried state and RuntimeParams stages."""
    params = RuntimeParams(atten_lim_db=12.0, lsnr_gating=True)
    (cr, out_ref), (cp, out_p) = _run_pair(model, params=params,
                                           backend="xla")
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_ref), atol=2e-4, rtol=1e-3
    )
    for name in ("analysis_mem", "synthesis_mem", "mean_norm", "unit_norm"):
        np.testing.assert_allclose(
            np.asarray(getattr(cp, name)), np.asarray(getattr(cr, name)),
            atol=2e-4, rtol=1e-3, err_msg=name,
        )


def test_chunk_continuity_xla_backend(model):
    m, df_state, _ = model
    audio = _audio(2, 8, seed=3)
    prt = PallasStreamingRuntime(
        m, df_state, matmul_dtype=jnp.float32, s_blk=2, chunk=4,
        backend="xla",
    )
    c1 = prt.init(2)
    _, o_full = prt.process(c1, audio)
    c2 = prt.init(2)
    c2, o_a = prt.process(c2, audio[:, : 4 * HOP])
    _, o_b = prt.process(c2, audio[:, 4 * HOP :])
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([o_a, o_b], -1)), np.asarray(o_full),
        atol=1e-5, rtol=1e-5,
    )


def test_mosaic_layout_rule():
    """Auto-shrunk grid tiles must keep satisfying the Mosaic block-shape
    rule (last two block dims multiples of (8, 128) or the full dims)."""
    from deepfilternet_tpu.streaming_pallas import _mosaic_layout

    # process_frame: chunk auto-shrinks to 1 == n_frames -> s-major legal
    assert _mosaic_layout(4096, 128, 1, 1, False) == (128, False)
    # 100 frames -> chunk 5: s-major illegal (5 % 8, 5 != 100) -> t-major
    assert _mosaic_layout(4096, 128, 100, 5, False) == (128, True)
    # t-major with an odd stream block widens to the full stream dim
    assert _mosaic_layout(6, 6, 100, 5, False) == (6, True)
    assert _mosaic_layout(24, 6, 800, 8, True) == (24, True)
    # legal configs pass through untouched
    assert _mosaic_layout(4096, 512, 200, 4, True) == (512, True)
    assert _mosaic_layout(4096, 128, 200, 8, False) == (128, False)
