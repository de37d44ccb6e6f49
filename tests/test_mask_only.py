"""Mask-only (run_df=False) ablation tests.

Reference semantics (df/checkpoint.py:25-32, deepfilternet.py:274-279,
deepfilternet2.py:498-503, deepfilternet3.py:436): with `mask_only` /
`--no-df-stage` the DF (or multiframe) stage is skipped and the output is
the ERB-masked spectrum. Coefficients are still computed and returned.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfilternet_tpu.config import config
from deepfilternet_tpu.models import model_module

ASSET = "/root/reference/assets/noisy_snr0.wav"

FAMILIES = [
    "deepfilternet",
    "deepfilternet2",
    "deepfilternet3",
    "deepfilternetmf",
]


def _init(name):
    config.reset()
    mod, init_fn, _ = model_module(name)
    params, state, cfg = init_fn(jax.random.PRNGKey(0))
    return mod, params, state, cfg


def _rand_inputs(rng, b, t, cfg):
    spec = jnp.asarray(
        rng.standard_normal((b, t, cfg["freq_bins"], 2)).astype(np.float32)
    )
    fe = jnp.asarray(rng.standard_normal((b, t, cfg["nb_erb"])).astype(np.float32))
    fs = jnp.asarray(
        rng.standard_normal((b, t, cfg["nb_df"], 2)).astype(np.float32)
    )
    return spec, fe, fs


class TestMaskOnlyForward:
    @pytest.mark.parametrize("name", FAMILIES)
    def test_output_is_masked_spectrum(self, name, rng):
        """run_df=False output == spec * (mask @ erb_inv_fb), whole band."""
        mod, params, state, cfg = _init(name)
        spec, fe, fs = _rand_inputs(rng, 2, 8, cfg)
        cfg_mo = dict(cfg, run_df=False)
        (spec_e, mask, _, _), _ = mod.forward(params, state, cfg_mo, spec, fe, fs)
        spec_c = spec[..., 0] + 1j * spec[..., 1]
        spec_m = spec_c * (mask @ jnp.asarray(cfg["erb_inv_fb"]))
        expect = jnp.stack([jnp.real(spec_m), jnp.imag(spec_m)], axis=-1)
        np.testing.assert_allclose(
            np.asarray(spec_e), np.asarray(expect), atol=1e-6
        )

    @pytest.mark.parametrize("name", FAMILIES)
    def test_differs_from_full_model(self, name, rng):
        """The DF stage must actually do something on random weights."""
        mod, params, state, cfg = _init(name)
        spec, fe, fs = _rand_inputs(rng, 1, 8, cfg)
        (full, _, _, _), _ = mod.forward(params, state, cfg, spec, fe, fs)
        (mo, _, _, _), _ = mod.forward(
            params, state, dict(cfg, run_df=False), spec, fe, fs
        )
        assert not np.allclose(np.asarray(full), np.asarray(mo), atol=1e-6)


class TestMaskOnlyStreaming:
    def test_streaming_equals_offline(self):
        """DFN3 mask-only must stream == offline (carry stays toggle-safe)."""
        from deepfilternet_tpu.enhance import enhance, init_df
        from deepfilternet_tpu.streaming import StreamingRuntime
        from deepfilternet_tpu.utils.audio_io import load_audio

        model, df_state, _ = init_df(mask_only=True)
        assert model.cfg.get("run_df", True) is False
        audio, _ = load_audio(ASSET)
        audio = audio[:, : 480 * 30]
        off = enhance(model, df_state, audio, pad=False)
        rt = StreamingRuntime(model, df_state)
        carry = rt.init(1)
        _, out = rt.process(carry, jnp.asarray(audio))
        np.testing.assert_allclose(np.asarray(out), off, atol=1e-4)


class TestMaskOnlyCli:
    def test_no_df_stage_and_noisy_dir(self, tmp_path):
        from deepfilternet_tpu.enhance import main
        from deepfilternet_tpu.utils.audio_io import load_audio, save_audio

        audio, sr = load_audio(ASSET)
        ind = tmp_path / "in"
        ind.mkdir()
        save_audio(str(ind / "clip.wav"), audio[:, : 480 * 20], sr)
        out_full = tmp_path / "full"
        out_mo = tmp_path / "mo"
        main([str(ind / "clip.wav"), "-o", str(out_full), "--no-suffix"])
        # --noisy-dir mode + --no-df-stage together
        main(["--noisy-dir", str(ind), "-o", str(out_mo), "--no-suffix",
              "--no-df-stage"])
        a, _ = load_audio(str(out_full / "clip.wav"))
        b, _ = load_audio(str(out_mo / "clip.wav"))
        assert a.shape == b.shape
        assert not np.allclose(a, b, atol=1e-6)

    def test_rejects_both_inputs(self, tmp_path):
        from deepfilternet_tpu.enhance import main

        with pytest.raises(SystemExit):
            main([ASSET, "--noisy-dir", str(tmp_path)])

    def test_rejects_no_inputs(self):
        from deepfilternet_tpu.enhance import main

        with pytest.raises(SystemExit):
            main(["-o", "/tmp"])


class TestMaskOnlyTraining:
    def test_mask_only_freezes_df_decoder(self, rng):
        """MASK_ONLY training: model built with run_df=False and the DF
        decoder params frozen, mirroring reference df/train.py:123-130
        (run_df=False model) + 486-494 (optimizer param filter)."""
        import jax
        import jax.numpy as jnp

        from deepfilternet_tpu.config import config
        from deepfilternet_tpu.models import dfnet3
        from deepfilternet_tpu.ops import Stft, erb_widths
        from deepfilternet_tpu.train.loss import Loss
        from deepfilternet_tpu.train.trainer import (
            DF_DECODER_KEYS,
            init_train_state,
            make_optimizer,
            make_train_step,
            trainable_filter,
        )

        config.reset()
        config.set("factor_magnitude", "100", section="SpectralLoss")
        params, state, cfg = dfnet3.init_dfnet3(jax.random.PRNGKey(0))
        cfg = dict(cfg, run_df=False)
        loss_obj = Loss(Stft(48000, 960, 480), erb_widths(48000, 960, 32, 2),
                        cfg["nb_df"], (-15, 35))
        optimizer = make_optimizer()
        step = jax.jit(make_train_step(
            dfnet3, cfg, loss_obj, optimizer,
            trainable=trainable_filter(mask_only=True)))
        ts = init_train_state(params, state, optimizer)
        b, t = 1, 12
        batch = {
            "noisy": jnp.asarray(
                rng.standard_normal((b, t, 481, 2)).astype(np.float32) * 0.1),
            "clean": jnp.asarray(
                rng.standard_normal((b, t, 481, 2)).astype(np.float32) * 0.05),
            "feat_erb": jnp.asarray(
                rng.standard_normal((b, t, 32)).astype(np.float32)),
            "feat_spec": jnp.asarray(
                rng.standard_normal((b, t, 96, 2)).astype(np.float32)),
        }
        ts2, metrics = step(ts, batch, jnp.asarray(1e-3), jnp.asarray(0.05))
        assert bool(metrics["finite"])
        frozen = [k for k in params if k in DF_DECODER_KEYS]
        assert frozen, sorted(params)
        for k in frozen:
            np.testing.assert_array_equal(
                np.asarray(jax.tree.leaves(ts.params[k])[0]),
                np.asarray(jax.tree.leaves(ts2.params[k])[0]),
                err_msg=f"{k} should be frozen")
        # an encoder param must have moved
        moved = np.abs(
            np.asarray(jax.tree.leaves(ts2.params["lsnr_fc"])[0])
            - np.asarray(jax.tree.leaves(ts.params["lsnr_fc"])[0])
        ).max()
        assert moved > 0
        config.reset()
