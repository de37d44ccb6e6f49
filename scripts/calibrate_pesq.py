"""Fit the from-spec PESQ raw->MOS power law on a multi-family anchor set.

The ITU implementation is not available in this environment, so the
calibration targets are APPROXIMATE published-behavior values of wideband
PESQ (P.862.2 MOS-LQO) on classic anchor conditions — additive white and
pink noise at several SNRs, low-pass filtering, amplitude clipping, reverb
(the in-repo measured RIR), and level offsets. Fitting across families
(rather than white noise alone, the round-2 state) makes the local scale
considerably less optimistic on non-additive distortions; it remains a
local scale, documented as non-ITU-comparable.

Usage: python scripts/calibrate_pesq.py
Prints the fitted (A, P) for eval/pesq.py::_CAL_A/_CAL_P and the anchor
table with fitted vs target MOS.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepfilternet_tpu.eval.pesq import pesq_indicator  # noqa: E402
from deepfilternet_tpu.utils.audio_io import load_audio  # noqa: E402

FS = 16000


def _mos_to_raw_wb(mos: float) -> float:
    """Invert the P.862.2 MOS-LQO mapping."""
    return (3.8224 - np.log(4.0 / (mos - 0.999) - 1.0)) / 1.3669


def _rms(x):
    return float(np.sqrt(np.mean(x**2) + 1e-20))


def _add_noise(clean, noise, snr_db, rng):
    n = noise[: len(clean)]
    if len(n) < len(clean):
        n = np.tile(n, len(clean) // len(n) + 1)[: len(clean)]
    g = _rms(clean) / (_rms(n) * 10.0 ** (snr_db / 20.0))
    return clean + g * n


def _lowpass(x, cutoff_hz):
    spec = np.fft.rfft(x)
    freqs = np.fft.rfftfreq(len(x), 1.0 / FS)
    spec[freqs > cutoff_hz] = 0.0
    return np.fft.irfft(spec, len(x))


def build_anchors(clean, rir, rng):
    """[(name, degraded, target_wb_mos)] — targets are approximate
    published-behavior values of ITU wideband PESQ on these conditions."""
    white = rng.standard_normal(len(clean))
    f = np.fft.rfftfreq(len(clean), 1.0 / FS)
    pink_spec = np.fft.rfft(rng.standard_normal(len(clean))) / np.sqrt(
        np.maximum(f, 1.0)
    )
    pink = np.fft.irfft(pink_spec, len(clean))

    # (name, degraded, target MOS, fit weight). White-noise targets are the
    # best-established (P.862 conformance data); they carry double weight.
    # PESQ largely forgives stationary band limitation (the per-band
    # frequency-response compensation is designed to), so the low-pass
    # targets are mild; clipping at 0.5x peak touches few samples of this
    # clip and is near-transparent.
    anchors = []
    for snr, tgt in [(0, 1.3), (5, 1.55), (10, 1.9), (15, 2.35), (20, 2.8),
                     (30, 3.6), (40, 4.25)]:
        anchors.append((f"white{snr}", _add_noise(clean, white, snr, rng), tgt, 2.0))
    for snr, tgt in [(5, 1.5), (15, 2.25), (25, 3.1)]:
        anchors.append((f"pink{snr}", _add_noise(clean, pink, snr, rng), tgt, 1.0))
    for hz, tgt in [(2000, 2.9), (3400, 3.4), (6000, 4.2)]:
        anchors.append((f"lp{hz}", _lowpass(clean, hz), tgt, 1.0))
    peak = float(np.abs(clean).max())
    for frac, tgt in [(0.5, 4.2), (0.2, 3.0), (0.1, 2.2)]:
        anchors.append(
            (f"clip{frac}", np.clip(clean, -frac * peak, frac * peak), tgt, 1.0)
        )
    # reverb: full RIR vs the measured room response (rt60 ~0.79 s)
    rev = np.convolve(clean, rir)[: len(clean)]
    anchors.append(("reverb", rev, 2.4, 1.0))
    return anchors


def main():
    ref_dir = "/root/reference/assets"
    clean, _ = load_audio(os.path.join(ref_dir, "clean_freesound_33711.wav"), FS)
    clean = np.asarray(clean[0], np.float64)
    rir, _ = load_audio(
        os.path.join(ref_dir, "rir_sim_1001_w11.7_l2.6_h2.5_rt60_0.7919.wav"), FS
    )
    rir = np.asarray(rir[0], np.float64)
    rng = np.random.default_rng(42)

    anchors = build_anchors(clean, rir, rng)
    rows = []
    for name, deg, tgt, wgt in anchors:
        v = pesq_indicator(FS, clean, deg, "wb")
        rows.append((name, v, tgt, _mos_to_raw_wb(tgt), wgt))
        print(f"{name:10s} v={v:8.4f} target_mos={tgt:.2f}", flush=True)

    vs = np.array([r[1] for r in rows])
    raw_t = np.array([r[3] for r in rows])
    wgt = np.array([r[4] for r in rows])
    # weighted least squares in log space: 4.5 - raw_t = A * v^P
    y = np.log(np.maximum(4.5 - raw_t, 1e-3))
    x = np.log(np.maximum(vs, 1e-12))
    p, log_a = np.polyfit(x, y, 1, w=np.sqrt(wgt))
    a = float(np.exp(log_a))
    print(f"\nfitted: _CAL_A = {a:.4f}  _CAL_P = {p:.4f}\n")

    def mos_of(v):
        raw = np.clip(4.5 - a * v**p, -0.5, 4.5)
        return 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224))

    err = []
    for name, v, tgt, _, _w in rows:
        m = mos_of(v)
        err.append(m - tgt)
        print(f"{name:10s} fitted_mos={m:.2f} target={tgt:.2f} err={m - tgt:+.2f}")
    print(f"\nmean abs err: {np.mean(np.abs(err)):.3f}  max: {np.max(np.abs(err)):.3f}")


if __name__ == "__main__":
    main()
