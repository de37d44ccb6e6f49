"""ASRLoss (Whisper distillation, reference df/loss.py:419-648).

Uses a tiny randomly initialized Flax Whisper: the loss plumbing (resample,
log-mel, encoder MSE, greedy decode, CE/CTC token loss, gradients) is what
is under test — perceptual quality needs the real weights, which are not
vendorable here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_whisper():
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_flax_whisper import (
        FlaxWhisperForConditionalGeneration,
    )

    cfg = WhisperConfig(
        vocab_size=64, num_mel_bins=80, d_model=32,
        encoder_layers=1, encoder_attention_heads=2,
        decoder_layers=1, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=1500, max_target_positions=64,
        decoder_start_token_id=1, eos_token_id=2, pad_token_id=2,
    )
    return FlaxWhisperForConditionalGeneration(cfg, seed=0)


class TestResample:
    def test_polyphase_exact_vs_upfirdn(self):
        """The strided-conv formulation is an exact polyphase resampler:
        with identical taps it matches scipy.signal.upfirdn bit-close."""
        from deepfilternet_tpu.train.asr_loss import _kaiser_sinc_taps, fir_resample
        from scipy.signal import upfirdn

        rng = np.random.default_rng(0)
        x = rng.standard_normal(4800).astype(np.float32)
        taps = _kaiser_sinc_taps(1, 3)
        y = np.asarray(fir_resample(jnp.asarray(x[None]), 48000, 16000))[0]
        assert y.shape[0] == 1600
        y_ref = upfirdn(taps, x, up=1, down=3)
        d = (len(taps) // 2) // 3  # group delay compensated by the conv pad
        np.testing.assert_allclose(y[50:1500], y_ref[50 + d:1500 + d],
                                   atol=2e-6)

    def test_close_to_scipy_resample_poly(self):
        """Different anti-alias designs, same passband: sample-wise close
        on band-limited audio."""
        from deepfilternet_tpu.train.asr_loss import fir_resample
        from scipy import signal as ss

        rng = np.random.default_rng(0)
        x = rng.standard_normal(48000).astype(np.float32)
        sos = ss.butter(8, 6000, fs=48000, output="sos")
        x = ss.sosfilt(sos, x).astype(np.float32)
        y = np.asarray(fir_resample(jnp.asarray(x[None]), 48000, 16000))[0]
        y_ref = ss.resample_poly(x, 1, 3)
        err = np.abs(y[100:-100] - y_ref[100:-100])
        assert err.max() < 2e-2, err.max()

    def test_identity(self):
        from deepfilternet_tpu.train.asr_loss import fir_resample

        x = jnp.ones((2, 100))
        assert fir_resample(x, 16000, 16000) is x


class TestLogMel:
    def test_shape_and_scale(self):
        from deepfilternet_tpu.train.asr_loss import whisper_log_mel

        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)
        f = whisper_log_mel(a)
        assert f.shape == (2, 80, 3000)
        # whisper normalization keeps features in a small range
        assert float(jnp.max(f)) <= 3.0 and float(jnp.min(f)) >= -1.5
        # the padded region maps to the per-sample floor, constant per sample
        tail = f[:, :, 2000:]
        assert float(jnp.max(jnp.std(tail.reshape(2, -1), axis=1))) < 1e-3


class TestASRLoss:
    def _audio(self):
        rng = np.random.default_rng(1)
        clean = rng.standard_normal((2, 48000)).astype(np.float32) * 0.1
        enh = clean + rng.standard_normal((2, 48000)).astype(np.float32) * 0.02
        return jnp.asarray(enh), jnp.asarray(clean)

    def test_ce_finite_and_grad_flows(self, tiny_whisper):
        from deepfilternet_tpu.train.asr_loss import ASRLoss

        loss = ASRLoss(48000, factor=1.0, factor_lm=1.0,
                       whisper_model=tiny_whisper, blank_id=3)
        enh, clean = self._audio()

        val, grad = jax.jit(jax.value_and_grad(lambda e: loss(e, clean)))(enh)
        assert np.isfinite(float(val))
        g = np.asarray(grad)
        assert np.isfinite(g).all() and np.abs(g).max() > 0

    def test_identical_inputs_zero_embedding_loss(self, tiny_whisper):
        from deepfilternet_tpu.train.asr_loss import ASRLoss

        loss = ASRLoss(48000, factor=1.0, factor_lm=0.0,
                       whisper_model=tiny_whisper)
        _, clean = self._audio()
        v = float(loss(clean, clean))
        assert v == pytest.approx(0.0, abs=1e-10)

    def test_ctc_variant(self, tiny_whisper):
        from deepfilternet_tpu.train.asr_loss import ASRLoss

        loss = ASRLoss(48000, factor=0.0, factor_lm=1.0, loss_lm="CTC",
                       whisper_model=tiny_whisper, blank_id=3)
        enh, clean = self._audio()
        v = float(jax.jit(loss.__call__)(enh, clean))
        assert np.isfinite(v)

    def test_missing_weights_raises(self):
        from deepfilternet_tpu.train.asr_loss import ASRLoss

        with pytest.raises(NotImplementedError, match="Whisper"):
            ASRLoss(48000, model="/nonexistent/path")

    def test_bad_loss_lm_rejected(self, tiny_whisper):
        from deepfilternet_tpu.train.asr_loss import ASRLoss

        with pytest.raises(ValueError, match="loss_lm"):
            ASRLoss(48000, loss_lm="nope", whisper_model=tiny_whisper)

    def test_loss_aggregator_wires_asr(self, tiny_whisper):
        from deepfilternet_tpu.config import config
        from deepfilternet_tpu.ops import Stft, stft
        from deepfilternet_tpu.train.loss import Loss

        config.reset()
        config.set("factor", "1.0", section="ASRLoss")
        config.set("factor_lm", "0.0", section="ASRLoss")
        try:
            p = Stft(48000, 960, 480)
            agg = Loss(p, (2,) * 32, 96, (-15.0, 35.0), asr_model=tiny_whisper)
            rng = np.random.default_rng(2)
            clean_td = jnp.asarray(rng.standard_normal((1, 48000)).astype(np.float32) * 0.1)
            noisy_td = clean_td + 0.05
            sc = stft(clean_td, p)
            sn = stft(noisy_td, p)
            mask = jnp.ones(sc.shape[:-1] + (32,)) * 0.5
            lsnr = jnp.zeros(sc.shape[:-1] + (1,))
            total, parts = agg(sc, sn, sn, mask, lsnr)
            assert "asr" in parts and np.isfinite(float(parts["asr"]))
            assert np.isfinite(float(total))
        finally:
            config.reset()
