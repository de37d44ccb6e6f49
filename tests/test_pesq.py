"""Property tests for the from-spec NumPy PESQ (ITU-T P.862/P.862.2).

The ITU reference implementation (`pesq` wheel) is unavailable offline,
so these pin the algorithm's structural properties instead of golden
values: identity maps to the top of the scale, scores decrease
monotonically with additive-noise SNR, time alignment absorbs constant
delays, scores stay in the MOS-LQO range, and composite() integration
produces non-NaN CSIG/CBAK/COVL (VERDICT round-1 item 2).
"""

import numpy as np
import pytest
import scipy.signal as ss

from deepfilternet_tpu.eval import sepm
from deepfilternet_tpu.eval.pesq import pesq


@pytest.fixture(scope="module")
def speech16k():
    from deepfilternet_tpu.utils import load_audio

    a, _ = load_audio("/root/reference/assets/clean_freesound_33711.wav", 48000)
    return ss.resample_poly(np.asarray(a)[0].astype(np.float64), 1, 3)


def _add_noise(x, snr_db, seed=0):
    rng = np.random.default_rng(seed)
    n = rng.standard_normal(len(x))
    g = np.sqrt(np.mean(x**2) / (np.mean(n**2) * 10 ** (snr_db / 10)))
    return x + g * n


def test_identity_top_of_scale(speech16k):
    score = pesq(16000, speech16k, speech16k, "wb")
    # raw 4.5 through the P.862.2 MOS-LQO mapping
    assert abs(score - 4.6439) < 1e-3


def test_monotonic_in_snr(speech16k):
    scores = [pesq(16000, speech16k, _add_noise(speech16k, s), "wb")
              for s in (40, 30, 20, 10, 0)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 4.0  # nearly clean
    assert scores[-1] < 1.8  # heavily degraded


def test_range(speech16k):
    rng = np.random.default_rng(1)
    noise_only = rng.standard_normal(len(speech16k))
    score = pesq(16000, speech16k, noise_only, "wb")
    assert 1.0 <= score <= 4.66


def test_delay_invariance(speech16k):
    deg = _add_noise(speech16k, 20)
    delayed = np.concatenate([np.zeros(300), deg])[: len(speech16k)]
    s0 = pesq(16000, speech16k, deg, "wb")
    s1 = pesq(16000, speech16k, delayed, "wb")
    assert abs(s0 - s1) < 0.15


def test_nb_mode(speech16k):
    x8 = ss.resample_poly(speech16k, 1, 2)
    ident = pesq(8000, x8, x8, "nb")
    assert abs(ident - 4.5486) < 1e-2  # raw 4.5 through P.862.1 mapping
    noisy = pesq(8000, x8, _add_noise(x8, 10), "nb")
    assert noisy < ident - 0.5


def test_mode_validation(speech16k):
    with pytest.raises(ValueError):
        pesq(8000, speech16k, speech16k, "wb")
    with pytest.raises(ValueError):
        pesq(44100, speech16k, speech16k, "nb")
    with pytest.raises(ValueError):
        pesq(16000, speech16k, speech16k, "fb")


def test_composite_non_nan(speech16k):
    deg = _add_noise(speech16k, 10)
    p, csig, cbak, covl, segsnr = sepm.composite(
        speech16k.astype(np.float32), deg.astype(np.float32), 16000
    )
    for name, v in dict(pesq=p, csig=csig, cbak=cbak, covl=covl,
                        segsnr=segsnr).items():
        assert np.isfinite(v), name
    assert 1.0 <= p <= 4.66
    assert 1.0 <= csig <= 5.0 and 1.0 <= cbak <= 5.0 and 1.0 <= covl <= 5.0
