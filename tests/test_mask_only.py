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
