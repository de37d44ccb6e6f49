"""Data engine tests using the reference's bundled mini HDF5 fixtures
(SURVEY.md §4.1: assets/clean.hdf5, noise_vorbis.hdf5, noise_flac.hdf5)."""

import numpy as np
import pytest

from deepfilternet_tpu.data import _native
from deepfilternet_tpu.data.dataloader import DataLoader, collate
from deepfilternet_tpu.data.dataset import (
    DatasetConfig,
    FdDataset,
    Hdf5Cfg,
    TdDataset,
    combine_noises,
    mix_audio_signal,
    mix_f,
)
from deepfilternet_tpu.data.hdf5 import Hdf5Dataset
from deepfilternet_tpu.data import augmentations as aug

ASSETS = "/root/reference/assets"


class TestNative:
    def test_available(self):
        assert _native.available()

    def test_biquad_matches_scipy(self):
        from scipy.signal import lfilter

        x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
        b, a = aug.low_pass(2000, 0.7, 48000)
        got = _native.biquad_chain(x, np.array([*b, *a]))
        exp = lfilter(np.array(b) / a[0], np.array(a) / a[0], x.astype(np.float64))
        np.testing.assert_allclose(got, exp, atol=1e-4)


class TestHdf5:
    def test_pcm(self):
        ds = Hdf5Dataset(f"{ASSETS}/clean.hdf5")
        assert ds.codec == "pcm" and ds.sr == 48000
        keys = ds.keys("speech")
        assert len(keys) == 1
        audio = ds.read("speech", keys[0])
        assert audio.ndim == 2 and audio.dtype == np.float32
        assert np.abs(audio).max() <= 1.0

    def test_pcm_random_slice(self):
        ds = Hdf5Dataset(f"{ASSETS}/clean.hdf5")
        key = ds.keys("speech")[0]
        rng = np.random.default_rng(0)
        a = ds.read("speech", key, max_len=1000, rng=rng)
        assert a.shape[-1] == 1000

    @pytest.mark.parametrize("name,codec", [("noise_vorbis.hdf5", "vorbis"),
                                            ("noise_flac.hdf5", "flac")])
    def test_compressed(self, name, codec):
        ds = Hdf5Dataset(f"{ASSETS}/{name}")
        assert ds.codec == codec
        key = "assets_noise_freesound_573577.wav"
        audio = ds.read("noise", key)
        assert audio.shape == (1, 236983)


class TestMixing:
    def test_mix_f_snr(self, rng):
        clean = rng.standard_normal((1, 48000)).astype(np.float32)
        noise = rng.standard_normal((1, 48000)).astype(np.float32) * 3
        for snr in (-5, 0, 10):
            k = mix_f(clean, noise, snr)
            got_snr = 10 * np.log10(np.sum(clean**2) / np.sum((noise * k) ** 2))
            assert abs(got_snr - snr) < 0.1

    def test_mix_clipping_guard(self, rng):
        clean = rng.standard_normal((1, 1000)).astype(np.float32) * 2
        noise = rng.standard_normal((1, 1000)).astype(np.float32)
        c, n, m = mix_audio_signal(clean, None, noise, 0.0, 6.0)
        assert np.abs(m).max() <= 1.0 + 1e-6
        assert np.abs(c).max() <= 1.0 + 1e-6

    def test_combine_noises(self, rng):
        noises = [rng.standard_normal((1, 3000)).astype(np.float32),
                  rng.standard_normal((2, 12000)).astype(np.float32)]
        out = combine_noises(1, 9000, noises, [0.0, -6.0], rng)
        assert out.shape == (1, 9000)


class TestAugmentations:
    def test_remove_dc(self, rng):
        x = rng.standard_normal((1, 1000)).astype(np.float32) + 0.5
        y = aug.RandRemoveDc(1.0)(x, rng)
        assert abs(y.mean()) < 1e-6

    def test_clipping(self, rng):
        x = rng.standard_normal((1, 1000)).astype(np.float32)
        y = aug.RandClipping(1.0, c_range=(0.5, 0.5))(x, rng)
        assert np.abs(y).max() <= 0.5 * np.abs(x).max() + 1e-6

    def test_gen_noise_spectra(self, rng):
        pink = aug.gen_noise(1.0, 1, 48000, 48000, rng)
        white = aug.gen_noise(0.0, 1, 48000, 48000, rng)
        # pink noise has more low-frequency energy relative to high
        def ratio(x):
            s = np.abs(np.fft.rfft(x[0])) ** 2
            return s[10:100].mean() / s[10000:20000].mean()
        assert ratio(pink) > 10 * ratio(white)

    def test_vtlp_shifts_formants(self, rng):
        """RandVTLP with alpha>1 must move spectral energy upward while
        preserving shape and rough energy (the 'new speaker' synthesizer,
        VERDICT r3 #5)."""
        sr = 48000
        t = np.arange(sr, dtype=np.float32) / sr
        # formant-like narrowband component at 2 kHz over weak noise
        x = (np.sin(2 * np.pi * 2000 * t)
             + 0.01 * rng.standard_normal(sr).astype(np.float32))[None]
        x = x.astype(np.float32)
        up = aug.RandVTLP(1.0, sr=sr, alpha_range=(1.12, 1.12))(x, rng)
        dn = aug.RandVTLP(1.0, sr=sr, alpha_range=(0.9, 0.9))(x, rng)
        assert up.shape == x.shape and np.all(np.isfinite(up))

        def centroid(v):
            s = np.abs(np.fft.rfft(v[0])) ** 2
            f = np.arange(s.size)
            return (f * s).sum() / s.sum()

        assert centroid(up) > centroid(x) * 1.05
        assert centroid(dn) < centroid(x) * 0.95
        # energy roughly preserved (windowing/warp losses bounded)
        assert 0.5 < (up**2).mean() / (x**2).mean() < 2.0
        from deepfilternet_tpu.utils.audio_io import load_audio

        rir, _ = load_audio(f"{ASSETS}/rir_sim_1001_w11.7_l2.6_h2.5_rt60_0.7919.wav")
        sp = rng.standard_normal((1, 48000)).astype(np.float32) * 0.1
        ns = rng.standard_normal((1, 48000)).astype(np.float32) * 0.1
        rv = aug.RandReverbSim(1.0, 48000)
        sp2, ns2, sp_rev = rv.transform(sp, ns, rir, rng)
        assert sp2.shape == sp.shape and ns2.shape == ns.shape
        if sp_rev is not None:
            assert sp_rev.shape == sp.shape

    def test_air_absorption_matches_reference_table(self, rng):
        """Pin the attenuation curve against the reference's vendored
        pyroomacoustics coefficients (augmentations.rs:1155-1199) and its
        interp_atten semantics (rs:1211-1232): per-band amplitude
        exp(-d*coef), linear interp over bins, flat beyond the band edges."""
        from deepfilternet_tpu.data.augmentations import AirAbsorptionAugmentation

        a = AirAbsorptionAugmentation()
        # the six physical + two artificial conditions, exact coef rows
        assert sorted(a.COEF_TABLE) == [
            "10C_30-50%", "10C_50-70%", "10C_70-90%", "20C_30-50",
            "20C_50-70%", "20C_70-90%", "Strong-High-1", "Strong-High-2",
        ]
        np.testing.assert_allclose(
            a.COEF_TABLE["20C_30-50"],
            (0.1, 0.3, 0.6, 1.0, 1.9, 5.8, 20.3, 72.3, 259.9),
        )
        sr, n_freqs, d = 48000, 1025, 10.0
        coefs = a.COEF_TABLE["20C_30-50"]
        att = a.attenuation(coefs, d, sr, n_freqs)
        freqs = np.linspace(0, sr / 2, n_freqs)
        # at (closest bin to) each center frequency: exp(-d*c) exactly-ish
        for cf, c in zip(a.CENTER_FREQS, coefs):
            i = int(np.argmin(np.abs(freqs - cf)))
            np.testing.assert_allclose(
                att[i], np.exp(-d * c * 1e-3), rtol=2e-3
            )
        # flat below the first center frequency (reference prepends (0, a0))
        below = att[freqs <= 125.0]
        np.testing.assert_allclose(below, np.exp(-d * coefs[0] * 1e-3), rtol=1e-6)
        # midpoint between two centers interpolates the *amplitudes* linearly
        mid = 0.5 * (np.exp(-d * coefs[5] * 1e-3) + np.exp(-d * coefs[6] * 1e-3))
        i = int(np.argmin(np.abs(freqs - 6000.0)))
        np.testing.assert_allclose(att[i], mid, rtol=2e-3)
        # monotone non-increasing curve, strong high-band absorption
        assert np.all(np.diff(att) <= 1e-9)
        assert att[-1] < 0.1 < att[0]

    def test_resample_rate(self, rng):
        x = rng.standard_normal((1, 48000)).astype(np.float32)
        y = aug.RandResample(1.0, sr=48000, r_low=0.95, r_high=0.95)(x, rng)
        assert abs(y.shape[-1] - 48000 * 0.95) < 2000


class TestTdDataset:
    @pytest.fixture(scope="class")
    def ds(self):
        cfgs = [Hdf5Cfg("clean.hdf5", 100), Hdf5Cfg("noise_flac.hdf5", 1),
                Hdf5Cfg("noise_vorbis.hdf5", 1)]
        return TdDataset(ASSETS, cfgs, "train", max_len_s=2.0, seed=42)

    def test_index_with_sampling_factor(self, ds):
        assert len(ds) == 100  # one speech key x factor 100

    def test_deterministic(self, ds):
        s1 = ds.get_sample(3, seed=7)
        s2 = ds.get_sample(3, seed=7)
        np.testing.assert_array_equal(s1["noisy"], s2["noisy"])
        s3 = ds.get_sample(3, seed=8)
        assert not np.array_equal(s1["noisy"], s3["noisy"])

    def test_sample_contents(self, ds):
        s = ds.get_sample(0, seed=1)
        assert s["speech"].shape == s["noisy"].shape
        assert s["speech"].shape[-1] == 2 * 48000
        assert np.abs(s["noisy"]).max() <= 1.0 + 1e-6
        assert s["snr"] in (-5, 0, 5, 10, 20, 40)
        assert s["gain"] in (-6, 0, 6)
        # mixture actually contains noise
        assert not np.allclose(s["speech"], s["noisy"])


class TestFdDataset:
    @pytest.fixture(scope="class")
    def fd(self):
        cfgs = [Hdf5Cfg("clean.hdf5", 20), Hdf5Cfg("noise_flac.hdf5", 1)]
        td = TdDataset(ASSETS, cfgs, "train", max_len_s=1.0, seed=42)
        return FdDataset(td)

    def test_features(self, fd):
        s = fd.get_sample(0, seed=0)
        t = 48000 // 480
        assert s["spec_clean"].shape == (1, t, 481)
        assert s["feat_erb"].shape == (1, t, 32)
        assert s["feat_spec"].shape == (1, t, 96)
        assert np.all(np.isfinite(s["feat_erb"]))

    def test_features_match_jax_dsp(self, fd):
        """FdDataset's NumPy feature path must equal the JAX ops."""
        import jax.numpy as jnp

        from deepfilternet_tpu.ops import Stft, erb_feat, spec_feat, stft

        s = fd.get_sample(1, seed=3)
        cfg = Stft(sr=48000, fft_size=960, hop_size=480)
        spec = stft(jnp.asarray(s["noisy"]), cfg)
        np.testing.assert_allclose(np.asarray(spec), s["spec_noisy"], atol=1e-5)
        fe = erb_feat(spec, fd.widths, fd.alpha)
        np.testing.assert_allclose(np.asarray(fe), s["feat_erb"], atol=1e-4)
        fs = spec_feat(spec, 96, fd.alpha)
        np.testing.assert_allclose(np.asarray(fs), s["feat_spec"], atol=1e-4)


class TestDataLoader:
    def test_epoch_iteration(self):
        cfgs = [Hdf5Cfg("clean.hdf5", 8), Hdf5Cfg("noise_flac.hdf5", 1)]
        td = TdDataset(ASSETS, cfgs, "train", max_len_s=1.0, seed=42)
        fd = FdDataset(td)
        dl = DataLoader(fd, batch_size=4, num_workers=2)
        batches = list(dl.iter_epoch("train", seed=1))
        assert len(batches) == 2
        b = batches[0]
        assert b.noisy.shape[0] == 4
        assert b.feat_erb.shape[-1] == 32
        assert b.spec_noisy.dtype == np.complex64

    def test_collate_multichannel(self):
        """Collate stacks every audio channel: spectral fields come out
        [B, C, T', F] (dataloader.rs:484-548), and batch_to_arrays folds
        channels into the batch axis for the C=1-input models."""
        from deepfilternet_tpu.data.dataloader import collate
        from deepfilternet_tpu.train.run import batch_to_arrays

        rng = np.random.default_rng(0)
        c, f, e, fp = 2, 481, 32, 96

        def sample(idx, t_samples, t_frames):
            return {
                "speech": rng.standard_normal((c, t_samples)).astype(np.float32),
                "noisy": rng.standard_normal((c, t_samples)).astype(np.float32),
                "spec_clean": (rng.standard_normal((c, t_frames, f))
                               + 1j * rng.standard_normal((c, t_frames, f))
                               ).astype(np.complex64),
                "spec_noisy": (rng.standard_normal((c, t_frames, f))
                               + 1j * rng.standard_normal((c, t_frames, f))
                               ).astype(np.complex64),
                "feat_erb": rng.standard_normal((c, t_frames, e)).astype(np.float32),
                "feat_spec": (rng.standard_normal((c, t_frames, fp))
                              + 1j * rng.standard_normal((c, t_frames, fp))
                              ).astype(np.complex64),
                "max_freq": 24000, "snr": 5, "gain": 0, "idx": idx,
            }

        b = collate([sample(0, 960, 2), sample(1, 1440, 3)])
        assert b.spec_noisy.shape == (2, c, 3, f)
        assert b.feat_erb.shape == (2, c, 3, e)
        assert b.feat_spec.shape == (2, c, 3, fp)
        # second channel survives (previously dropped)
        assert np.any(b.feat_erb[0, 1] != 0)
        arrays = batch_to_arrays(b)
        assert arrays["noisy"].shape == (2 * c, 3, f, 2)
        assert arrays["feat_erb"].shape == (2 * c, 3, e)
        # fold order is (batch, channel): row 1 is sample 0 / channel 1
        np.testing.assert_array_equal(arrays["feat_erb"][1], b.feat_erb[0, 1])

    def test_deterministic_epochs(self):
        cfgs = [Hdf5Cfg("clean.hdf5", 4), Hdf5Cfg("noise_flac.hdf5", 1)]
        td = TdDataset(ASSETS, cfgs, "train", max_len_s=0.5, seed=42)
        fd = FdDataset(td)
        dl = DataLoader(fd, batch_size=2, num_workers=3)
        b1 = [b.noisy for b in dl.iter_epoch("train", seed=5)]
        b2 = [b.noisy for b in dl.iter_epoch("train", seed=5)]
        for x, y in zip(b1, b2):
            np.testing.assert_array_equal(x, y)

    def test_dataset_config_json(self):
        cfg = DatasetConfig.open(f"{ASSETS}/dataset.cfg")
        assert len(cfg.train) == 2
        assert cfg.train[0].filename == "clean.hdf5"
        assert cfg.train[0].sampling_factor == 100


class TestFractionalSampling:
    def test_per_epoch_regeneration(self):
        cfgs = [Hdf5Cfg("clean.hdf5", 4.5), Hdf5Cfg("noise_flac.hdf5", 1)]
        td = TdDataset(ASSETS, cfgs, "train", max_len_s=0.5, seed=7)
        lens = set()
        for epoch in range(20):
            td.set_epoch(epoch)
            lens.add(len(td))
        # 4.5 factor: sometimes 4, sometimes 5 per epoch
        assert lens == {4, 5}
        # deterministic per epoch seed
        td.set_epoch(3); a = len(td)
        td.set_epoch(3); assert len(td) == a


class TestVtlpPoolGrowth:
    """scripts/make_vtlp_pool.py — the curriculum data-ceiling tool: grow
    the clean pool with deterministic VTLP pseudo-speakers and train on it
    through an extra Hdf5Cfg (train_demo's DEMO_EXTRA_CLEAN knob;
    pretrained/README.md r05 row)."""

    def test_pool_generates_and_feeds_tddataset(self, tmp_path):
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = tmp_path / "clean_vtlp.hdf5"
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "make_vtlp_pool.py"),
             f"{ASSETS}/clean.hdf5", str(out), "--alphas", "0.92,1.08"],
            capture_output=True, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        assert r.returncode == 0, r.stderr

        ds = Hdf5Dataset(str(out))
        keys = ds.keys("speech")
        assert len(keys) == 2 and all("_vtlp" in k for k in keys)
        assert ds.sr == 48000 and ds.codec == "pcm"

        # warped copies are real audio, not silence or byte copies
        src = Hdf5Dataset(f"{ASSETS}/clean.hdf5")
        k0 = src.keys("speech")[0]
        a = src.read("speech", k0)
        w = ds.read("speech", keys[0])
        assert w.shape == a.shape
        assert np.all(np.isfinite(w)) and np.abs(w).max() > 0.01
        assert not np.allclose(w, a, atol=1e-3)

        # the grown pool mixes through TdDataset exactly like the original
        os.symlink(f"{ASSETS}/clean.hdf5", tmp_path / "clean.hdf5")
        os.symlink(f"{ASSETS}/noise_flac.hdf5", tmp_path / "noise_flac.hdf5")
        cfgs = [Hdf5Cfg("clean.hdf5", 2), Hdf5Cfg("clean_vtlp.hdf5", 1),
                Hdf5Cfg("noise_flac.hdf5", 1)]
        td = TdDataset(str(tmp_path), cfgs, "train", max_len_s=0.5, seed=3)
        assert len(td) == 2 + 2  # 1 original key x2 + 2 pseudo-speakers x1
        s = td.get_sample(len(td) - 1, seed=0)
        assert np.all(np.isfinite(s["noisy"]))
        assert not np.allclose(s["speech"], s["noisy"])
