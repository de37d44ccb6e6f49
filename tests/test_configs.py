"""Configuration-matrix tests: the BASELINE.json config sweep.

Covers: DFN2 offline; DFN3 with post-filter + delay compensation; DFN1
ERB-only ablation; a low-latency streaming configuration (shorter
FFT/hop); and the df_order 1-5 multi-frame sweep — every case through the
full pipeline (features -> model -> enhance/stream) at its own DSP config.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfilternet_tpu.config import config
from deepfilternet_tpu.enhance import DfState, enhance, init_df
from deepfilternet_tpu.streaming import StreamingRuntime
from deepfilternet_tpu.utils.audio_io import load_audio

ASSET = "/root/reference/assets/noisy_snr0.wav"


def _audio(n=48000):
    a, _ = load_audio(ASSET)
    return a[:, :n]


class TestConfigMatrix:
    def test_dfn2_offline(self):
        config.reset()
        config.set("MODEL", "deepfilternet2", section="train")
        config.set("GRU_TYPE", "squeeze", section="deepfilternet")
        config.set("DF_OUTPUT_LAYER", "groupedlinear", section="deepfilternet")
        config.set("DFOP_METHOD", "complex_strided", section="deepfilternet")
        config.set("DF_N_ITER", "1", section="deepfilternet")
        model, df_state, _ = init_df(model_name="deepfilternet2")
        out = enhance(model, df_state, _audio())
        assert out.shape == (1, 48000)
        assert np.all(np.isfinite(out))

    def test_dfn3_postfilter_delay_comp(self):
        config.reset()
        model, df_state, _ = init_df(post_filter=True, model_name="deepfilternet3")
        assert model.cfg["mask_pf"] is True
        audio = _audio()
        out = enhance(model, df_state, audio, pad=True)
        assert out.shape == audio.shape

    def test_dfn1_erb_only(self):
        config.reset()
        model, df_state, _ = init_df(model_name="deepfilternet")
        out = enhance(model, df_state, _audio(24000))
        assert np.all(np.isfinite(out))

    @pytest.mark.parametrize("df_order", [1, 2, 3, 4, 5])
    def test_df_order_sweep(self, df_order):
        """Multi-frame filtering sweep (hearing-aid config space)."""
        config.reset()
        config.set("DF_ORDER", str(df_order), section="DF")
        from deepfilternet_tpu.models import dfnet3

        params, state, cfg = dfnet3.init_dfnet3(jax.random.PRNGKey(0))
        assert cfg["df_order"] == df_order
        rng = np.random.default_rng(0)
        spec = jnp.asarray(rng.standard_normal((1, 6, 481, 2)).astype(np.float32))
        fe = jnp.asarray(rng.standard_normal((1, 6, 32)).astype(np.float32))
        fs = jnp.asarray(rng.standard_normal((1, 6, 96, 2)).astype(np.float32))
        (spec_e, _, _, coefs), _ = dfnet3.forward(params, state, cfg, spec, fe, fs)
        assert coefs.shape[1] == df_order
        # streaming still matches offline at this order
        carry = dfnet3.streaming_init(1, cfg)
        outs = []
        for i in range(6):
            carry, (se, _, _) = dfnet3.streaming_cell(
                params, state, cfg, carry, spec[:, i], fe[:, i], fs[:, i]
            )
            outs.append(np.asarray(se))
        np.testing.assert_allclose(np.asarray(spec_e), np.stack(outs, 1), atol=2e-4)

    def test_low_latency_config(self):
        """DFN3-ll-style: fft 480 (10 ms), hop 240 (5 ms) => 5 ms delay."""
        config.reset()
        config.set("FFT_SIZE", "480", section="DF")
        config.set("HOP_SIZE", "240", section="DF")
        config.set("NB_DF", "48", section="DF")
        model, df_state, _ = init_df()
        assert df_state.fft_size == 480 and df_state.delay == 240
        audio = _audio(24000)
        out = enhance(model, df_state, audio)
        assert out.shape == audio.shape
        # streaming at the low-latency config
        rt = StreamingRuntime(model, df_state)
        carry = rt.init(1)
        carry, o = rt.process(carry, jnp.asarray(audio[:, : 240 * 20]))
        assert o.shape == (1, 240 * 20)
        assert np.all(np.isfinite(np.asarray(o)))

    def test_nondefault_erb_counts(self):
        config.reset()
        config.set("NB_ERB", "24", section="DF")
        config.set("NB_DF", "64", section="DF")
        model, df_state, _ = init_df()
        assert model.cfg["nb_erb"] == 24
        out = enhance(model, df_state, _audio(24000))
        assert np.all(np.isfinite(out))
