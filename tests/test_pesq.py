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
    assert scores[0] > 3.8  # nearly clean
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


def test_anchor_families(speech16k):
    """Multi-family calibration anchors (scripts/calibrate_pesq.py): the
    recalibrated scale must stay monotone within each distortion family
    and land in plausible windows on the best-established anchors, instead
    of only behaving on white noise (round-2 weakness: the white-only
    calibration read ~0.35 MOS high on enhancement-style distortions)."""
    x = speech16k
    # white noise family: windows around P.862 conformance-style targets
    for snr, lo, hi in [(0, 1.0, 1.8), (10, 1.4, 2.4), (20, 2.1, 3.1),
                        (30, 2.9, 3.9)]:
        s = pesq(16000, x, _add_noise(x, snr), "wb")
        assert lo <= s <= hi, (snr, s)
    # low-pass family: monotone in cutoff, severe band-loss clearly
    # below the near-transparent case
    def lp(cut):
        spec = np.fft.rfft(x)
        f = np.fft.rfftfreq(len(x), 1 / 16000)
        spec[f > cut] = 0
        return pesq(16000, x, np.fft.irfft(spec, len(x)), "wb")

    s2, s34, s6 = lp(2000), lp(3400), lp(6000)
    assert s2 < s34 < s6, (s2, s34, s6)
    assert s6 - s2 > 0.25
    # clipping family: monotone in severity
    peak = np.abs(x).max()
    c5, c2, c1 = (pesq(16000, x, np.clip(x, -f * peak, f * peak), "wb")
                  for f in (0.5, 0.2, 0.1))
    assert c5 > c2 > c1, (c5, c2, c1)
    # level offsets are nearly transparent (PESQ level-aligns)
    assert pesq(16000, x, 0.1 * x, "wb") > 4.4


def test_cross_model_ordering():
    """PESQ ordering must agree with SI-SDR ordering for clearly-separated
    model pairs (VERDICT r2 #4b). The committed demo-model goldens are
    produced by the full enhance pipeline; when two models differ by >2 dB
    SI-SDR on the golden asset, the local-PESQ ordering must match."""
    import itertools
    import json
    import os

    root = os.path.join(os.path.dirname(os.path.dirname(__file__)), "pretrained")
    goldens = {}
    for name in ("dfn1_fixture_demo", "dfn2_fixture_demo", "dfn3_fixture_demo"):
        path = os.path.join(root, name, "golden_metrics.json")
        if os.path.isfile(path):
            goldens[name] = json.load(open(path))
    assert len(goldens) >= 2, "demo goldens missing"
    for a, b in itertools.combinations(goldens, 2):
        ga, gb = goldens[a], goldens[b]
        if abs(ga["sisdr"] - gb["sisdr"]) > 2.0:
            better, worse = (ga, gb) if ga["sisdr"] > gb["sisdr"] else (gb, ga)
            assert better["pesq"] >= worse["pesq"] - 0.05, (a, b, ga, gb)


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
