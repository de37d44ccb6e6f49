"""Evaluation suite tests: metric sanity + monotonicity on the assets."""

import os
import numpy as np
import pytest

from deepfilternet_tpu.eval import sepm
from deepfilternet_tpu.eval.evaluation import compute_metrics, si_sdr_np
from deepfilternet_tpu.eval.stoi import stoi
from deepfilternet_tpu.utils.audio_io import load_audio, resample

CLEAN = "/root/reference/assets/clean_freesound_33711.wav"
NOISY = "/root/reference/assets/noisy_snr0.wav"


@pytest.fixture(scope="module")
def audio():
    clean, sr = load_audio(CLEAN)
    noisy, _ = load_audio(NOISY)
    n = min(clean.shape[-1], noisy.shape[-1], 5 * 48000)
    return clean[0, :n], noisy[0, :n], sr


class TestStoi:
    def test_perfect(self, audio):
        clean, _, sr = audio
        s = stoi(clean, clean, sr)
        assert s > 0.99

    def test_monotonic_with_noise(self, audio):
        clean, noisy, sr = audio
        s_clean = stoi(clean, clean, sr)
        s_noisy = stoi(clean, noisy, sr)
        rng = np.random.default_rng(0)
        very_noisy = clean + rng.standard_normal(len(clean)).astype(np.float32) * 0.5
        s_very = stoi(clean, very_noisy, sr)
        assert s_clean > s_noisy > s_very
        assert 0 < s_very < 1

    def test_known_range_on_asset(self, audio):
        """Reference golden for noisy input vs clean is ~0.88 (test_df.py runs
        the models to >0.96); the noisy mixture must land well below clean."""
        clean, noisy, sr = audio
        s = stoi(clean, noisy, sr)
        assert 0.5 < s < 0.99


class TestSiSdr:
    def test_known_snr(self, audio):
        clean, _, _ = audio
        rng = np.random.default_rng(1)
        noise = rng.standard_normal(len(clean)).astype(np.float32)
        noise *= np.sqrt(np.sum(clean**2) / np.sum(noise**2)) / np.sqrt(10.0)  # 10 dB
        est = clean + noise
        got = si_sdr_np(est, clean)
        assert abs(got - 10.0) < 0.5


class TestSepm:
    def test_snrseg_perfect_is_max(self, audio):
        clean, _, sr = audio
        c16 = resample(clean[None], sr, 16000)[0]
        assert sepm.snr_seg(c16, c16, 16000) == pytest.approx(35.0, abs=0.5)

    def test_snrseg_orders_by_noise(self, audio):
        clean, noisy, sr = audio
        c16 = resample(clean[None], sr, 16000)[0]
        n16 = resample(noisy[None], sr, 16000)[0]
        snr_noisy = sepm.snr_seg(c16, n16, 16000)
        snr_half = sepm.snr_seg(c16, c16 + (n16 - c16) * 0.25, 16000)
        assert snr_half > snr_noisy

    def test_llr_wss_zero_for_identical(self, audio):
        clean, _, sr = audio
        c16 = resample(clean[None], sr, 16000)[0]
        assert abs(sepm.llr(c16, c16, 16000)) < 1e-6
        assert sepm.wss(c16, c16, 16000) < 1e-6

    def test_llr_wss_positive_for_noisy(self, audio):
        clean, noisy, sr = audio
        c16 = resample(clean[None], sr, 16000)[0]
        n16 = resample(noisy[None], sr, 16000)[0]
        assert sepm.llr(c16, n16, 16000) > 0.1
        assert sepm.wss(c16, n16, 16000) > 5.0

    def test_composite_with_builtin_pesq(self, audio):
        clean, noisy, sr = audio
        c16 = resample(clean[None], sr, 16000)[0]
        n16 = resample(noisy[None], sr, 16000)[0]
        pesq_mos, csig, cbak, covl, segsnr = sepm.composite(c16, n16, 16000)
        # the from-spec NumPy PESQ (eval/pesq.py) backs composite() when
        # the ITU wheel is absent: all five outputs are finite
        for v in (pesq_mos, csig, cbak, covl, segsnr):
            assert np.isfinite(v)
        assert 1.0 <= pesq_mos <= 4.66


class TestComputeMetrics:
    def test_bundle(self, audio):
        clean, noisy, sr = audio
        m = compute_metrics(clean, noisy, sr, metrics=("stoi", "sisdr", "snrseg"))
        assert set(m) == {"stoi", "sisdr", "snrseg"}
        assert all(np.isfinite(v) for v in m.values())

    def test_enhancement_improves_over_noisy(self, audio):
        """A trivial oracle Wiener-ish blend must beat raw noisy on SI-SDR."""
        clean, noisy, sr = audio
        blended = 0.7 * clean + 0.3 * noisy
        assert si_sdr_np(blended, clean) > si_sdr_np(noisy, clean)


class TestEvalDir:
    def test_pairing_and_loop(self, tmp_path):
        import shutil

        from deepfilternet_tpu.scripts.eval_dir import main as eval_main

        noisy_dir = tmp_path / "noisy"
        clean_dir = tmp_path / "clean"
        noisy_dir.mkdir()
        clean_dir.mkdir()
        # make a matching pair by truncating the assets
        from deepfilternet_tpu.utils.audio_io import load_audio, save_audio

        n, sr = load_audio(NOISY)
        c, _ = load_audio(CLEAN)
        t = 24000
        save_audio(str(noisy_dir / "a.wav"), n[:, :t], sr)
        save_audio(str(clean_dir / "a.wav"), c[:, :t], sr)
        csv = str(tmp_path / "out.csv")
        means = eval_main([
            "--noisy-dir", str(noisy_dir), "--clean-dir", str(clean_dir),
            "--csv", csv, "--metrics", "sisdr,snrseg", "--workers", "1",
        ])
        assert "sisdr" in means and np.isfinite(means["sisdr"])
        assert os.path.getsize(csv) > 10

    def test_dns_naming(self, tmp_path):
        from deepfilternet_tpu.scripts.eval_dir import pair_files
        from deepfilternet_tpu.utils.audio_io import load_audio, save_audio

        noisy_dir = tmp_path / "noisy"; noisy_dir.mkdir()
        clean_dir = tmp_path / "clean"; clean_dir.mkdir()
        n, sr = load_audio(NOISY)
        save_audio(str(noisy_dir / "book_snr5_fileid_7.wav"), n[:, :4800], sr)
        save_audio(str(clean_dir / "clean_fileid_7.wav"), n[:, :4800], sr)
        pairs = pair_files(str(noisy_dir), str(clean_dir), dns=True)
        assert len(pairs) == 1
