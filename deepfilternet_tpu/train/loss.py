"""Training losses (reference: df/loss.py).

All losses are pure jittable functions over complex spectra represented as
re/im pairs or complex64 interior values. The `Loss` aggregator wires the
same config sections/keys as the reference ([MaskLoss], [SpectralLoss],
[MultiResSpecLoss], [SdrLoss], [LocalSnrLoss]) with identical defaults.

ASRLoss (Whisper-embedding distillation, df/loss.py:419-648) is implemented
in `asr_loss.py` (jittable JAX, HF Flax Whisper); the pretrained weights are
not vendored, so enabling it requires a local weights path (ASRLoss.MODEL)
or an injected model, else construction raises with a clear message.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepfilternet_tpu.config import Csv, config
from deepfilternet_tpu.ops import Stft, erb_fb_matrices, istft
from deepfilternet_tpu.ops.lsnr import local_snr_target

# ---------------------------------------------------------------------------
# mask target functions (df/loss.py:18-35)
# ---------------------------------------------------------------------------


def wg(s: jnp.ndarray, x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    n = x - s
    ss = jnp.abs(s) ** 2
    nn = jnp.abs(n) ** 2
    return jnp.clip(ss / (ss + nn + eps), 0.0, 1.0)


def irm(s: jnp.ndarray, x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    n = x - s
    return jnp.clip(jnp.abs(s) / (jnp.abs(s) + jnp.abs(n) + eps), 0.0, 1.0)


def iam(s: jnp.ndarray, x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    return jnp.clip(jnp.abs(s) / (jnp.abs(x) + eps), 0.0, 1.0)


_MASK_FNS = {"wg": wg, "irm": irm, "iam": iam}


# ---------------------------------------------------------------------------
# auxiliary hann STFT (torch.stft semantics: center reflect pad, periodic
# hann, 1/sqrt(n_fft) normalization) used by MultiResSpecLoss
# ---------------------------------------------------------------------------


def _hann_periodic(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


def hann_stft(x: jnp.ndarray, n_fft: int, hop: Optional[int] = None) -> jnp.ndarray:
    """x: [..., T] -> [..., T', F] complex (T' = T//hop + 1)."""
    hop = hop or n_fft // 4
    pad = n_fft // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    t = x.shape[-1]
    n_frames = t // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = xp[..., idx] * jnp.asarray(_hann_periodic(n_fft))
    return jnp.fft.rfft(frames, axis=-1) / math.sqrt(n_fft)


def loss_istft(spec: jnp.ndarray, n_fft: int, hop: int,
               window_np: np.ndarray) -> jnp.ndarray:
    """Exact replication of the reference trainer's Istft (df/loss.py:66-92):
    pad one extra frame, `torch.istft(normalized=True, center=True)` with the
    vorbis analysis window.

    This is NOT the DSP-exact inverse (`ops.istft`): torch's normalized
    istft multiplies frames by sqrt(n_fft) and divides by the window-square
    envelope, so applied to our forward-normalized analysis spectra it
    reconstructs `c * x` with `c = sqrt(n_fft) * wnorm ~= 0.0323` at the
    default 960/480 config. The reference computes ALL time-domain losses
    (MultiResSpecLoss, SdrLoss) on these scaled signals, which changes the
    effective magnitude-loss weight by `c**(2*gamma)` (~62x at gamma=0.6).
    Matching it bit-for-bit is required for config-compatible training
    (verified vs torch.istft in tests/test_loss_parity.py).

    spec: [..., T, F] complex -> [..., hop*T] float.
    """
    t = spec.shape[-2]
    w = jnp.asarray(window_np)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * math.sqrt(n_fft) * w
    n_frames_env = t + 1  # the zero-pad frame still contributes window envelope
    length = n_fft + hop * (n_frames_env - 1)
    idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
    y = jnp.zeros(spec.shape[:-2] + (length,), frames.dtype)
    y = y.at[..., idx.reshape(-1)].add(frames.reshape(*frames.shape[:-2], -1))
    env = np.zeros(length, np.float64)
    w2 = np.asarray(window_np, np.float64) ** 2
    for fi in range(n_frames_env):
        env[fi * hop: fi * hop + n_fft] += w2
    y = y / jnp.asarray(env.astype(np.float32))
    return y[..., n_fft // 2: n_fft // 2 + hop * t]


# ---------------------------------------------------------------------------
# individual losses
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _safe_angle_re_im(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return jnp.arctan2(im, re)


def _safe_angle_fwd(re, im):
    return jnp.arctan2(im, re), (re, im)


def _safe_angle_bwd(res, g):
    re, im = res
    gi = g / jnp.maximum(re * re + im * im, 1e-10)
    return -im * gi, re * gi


_safe_angle_re_im.defvjp(_safe_angle_fwd, _safe_angle_bwd)


def safe_angle(z: jnp.ndarray) -> jnp.ndarray:
    """atan2(im, re) with the zero-magnitude-robust gradient of the
    reference's `angle` autograd Function (df/utils.py:48-74): the backward
    denominator |z|^2 is clamped to 1e-10, so exact-zero bins (silence /
    padding) produce zero gradient instead of NaN."""
    return _safe_angle_re_im(jnp.real(z), jnp.imag(z))


def spectral_loss(
    enhanced: jnp.ndarray,
    clean: jnp.ndarray,
    gamma: float = 1.0,
    factor_magnitude: float = 1.0,
    factor_complex: float = 1.0,
    factor_under: float = 1.0,
) -> jnp.ndarray:
    """df/loss.py:137-177: gamma-compressed magnitude MSE (+ complex MSE),
    with extra weight where the estimate under-shoots."""
    e_abs = jnp.abs(enhanced)
    c_abs = jnp.abs(clean)
    if gamma != 1.0:
        e_abs = jnp.maximum(e_abs, 1e-12) ** gamma
        c_abs = jnp.maximum(c_abs, 1e-12) ** gamma
    tmp = (e_abs - c_abs) ** 2
    if factor_under != 1.0:
        tmp = tmp * jnp.where(e_abs < c_abs, factor_under, 1.0)
    loss = jnp.mean(tmp) * factor_magnitude
    if factor_complex > 0:
        if gamma != 1.0:
            e = e_abs * jnp.exp(1j * safe_angle(enhanced))
            c = c_abs * jnp.exp(1j * safe_angle(clean))
        else:
            e, c = enhanced, clean
        loss_c = jnp.mean(jnp.abs(e - c) ** 2) / 2.0  # == MSE over re/im stack
        loss = loss + loss_c * factor_complex
    return loss


def multi_res_spec_loss(
    enhanced_td: jnp.ndarray,
    clean_td: jnp.ndarray,
    n_ffts: Sequence[int] = (512, 1024, 2048),
    gamma: float = 1.0,
    factor: float = 1.0,
    factor_complex: float = 0.0,
) -> jnp.ndarray:
    """df/loss.py:95-134 over time-domain signals [B, T]."""
    loss = jnp.zeros(())
    for n_fft in n_ffts:
        y = hann_stft(enhanced_td, n_fft)
        s = hann_stft(clean_td, n_fft)
        y_abs, s_abs = jnp.abs(y), jnp.abs(s)
        if gamma != 1.0:
            y_abs = jnp.maximum(y_abs, 1e-12) ** gamma
            s_abs = jnp.maximum(s_abs, 1e-12) ** gamma
        loss = loss + jnp.mean((y_abs - s_abs) ** 2) * factor
        if factor_complex > 0:
            if gamma != 1.0:
                y = y_abs * jnp.exp(1j * safe_angle(y))
                s = s_abs * jnp.exp(1j * safe_angle(s))
            loss = loss + jnp.mean(jnp.abs(y - s) ** 2) / 2.0 * factor_complex
    return loss


def mask_loss(
    pred_mask: jnp.ndarray,
    clean: jnp.ndarray,
    noisy: jnp.ndarray,
    erb_fb: jnp.ndarray,
    mask: str = "iam",
    gamma: float = 0.6,
    gamma_pred: float = 0.6,
    powers: Sequence[int] = (2, 4),
    factors: Sequence[float] = (1.0, 10.0),
    f_under: float = 2.0,
    factor: float = 1.0,
    eps: float = 1e-12,
    max_bin_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """df/loss.py:180-277. pred_mask: [B, T, E]; clean/noisy: [B, T, F]
    complex; erb_fb: [F, E] normalized forward matrix."""
    g_t = (_MASK_FNS[mask](clean, noisy) @ erb_fb) ** gamma
    g_p = jnp.maximum(pred_mask, eps) ** gamma_pred
    tmp = (g_t - g_p) ** 2
    if f_under != 1.0:
        tmp = tmp * jnp.where(g_p < g_t, f_under, 1.0)
    if max_bin_mask is not None:
        tmp = tmp * max_bin_mask
    loss = jnp.zeros(())
    for power, fct in zip(powers, factors):
        loss = loss + jnp.mean(jnp.maximum(tmp, 1e-13) ** (power // 2)) * fct * factor
    return loss


def si_sdr(enhanced: jnp.ndarray, target: jnp.ndarray,
           eps: float = float(np.finfo(np.float32).eps)) -> jnp.ndarray:
    """Scale-invariant SDR per sample [B, T] -> [B] in dB (df/loss.py:345-373)."""
    rss = jnp.sum(target * target, axis=-1, keepdims=True)
    a = (jnp.sum(target * enhanced, axis=-1, keepdims=True) + eps) / (rss + eps)
    e_true = a * target
    e_res = enhanced - e_true
    sss = jnp.sum(e_true**2, axis=-1)
    snn = jnp.sum(e_res**2, axis=-1)
    return 10.0 * jnp.log10((sss + eps) / (snn + eps))


def sdr_loss(enhanced_td, clean_td, factor: float = 0.2) -> jnp.ndarray:
    return -jnp.mean(si_sdr(enhanced_td, clean_td)) * factor


def seg_sdr_loss(
    enhanced_td, clean_td, window_sizes: Sequence[int], factor: float = 0.2,
    overlap: float = 0.0,
) -> jnp.ndarray:
    loss = jnp.zeros(())
    for ws in window_sizes:
        ws = min(ws, enhanced_td.shape[-1])
        hop = max(int((1 - overlap) * ws), 1)
        n = (enhanced_td.shape[-1] - ws) // hop + 1
        idx = np.arange(n)[:, None] * hop + np.arange(ws)[None, :]
        e = enhanced_td[..., idx].reshape(-1, ws)
        c = clean_td[..., idx].reshape(-1, ws)
        loss = loss + jnp.mean(si_sdr(e, c))
    return -loss * factor


def local_snr_loss(pred_lsnr: jnp.ndarray, target_lsnr: jnp.ndarray,
                   factor: float = 1.0) -> jnp.ndarray:
    """pred_lsnr: [B, T, 1]; target: [B, T] (df/loss.py:408-416)."""
    return jnp.mean((pred_lsnr[..., 0] - target_lsnr) ** 2) * factor


def df_alpha_loss(
    pred_alpha: jnp.ndarray,
    target_lsnr: jnp.ndarray,
    factor: float = 1.0,
    lsnr_thresh: float = -7.5,
    lsnr_min: float = -10.0,
) -> jnp.ndarray:
    """DFN1/2 alpha-head penalty (df/loss.py:297-342)."""

    def mapping(lsnr, thresh, lo):
        a_ = 1.0 / (thresh - lo)
        b_ = -a_ * lo
        return 1.0 - jnp.clip(a_ * lsnr + b_, 0.0, 1.0)

    w_off = mapping(target_lsnr, lsnr_thresh, lsnr_min)[..., None]
    l_off = jnp.mean((pred_alpha * w_off) ** 2)
    w_on = mapping(target_lsnr, lsnr_thresh + 2.5, 0.0)[..., None]
    l_on = 0.1 * jnp.mean(jnp.abs((1.0 - pred_alpha) * w_on))
    return (l_off + l_on) * factor


# ---------------------------------------------------------------------------
# aggregator
# ---------------------------------------------------------------------------


class Loss:
    """Config-wired loss aggregator (df/loss.py:651-804).

    Call with complex spectra in the model's STFT domain:
        loss_fn(clean, noisy, enhanced, mask, lsnr) -> scalar
    All inputs [B, T, F] complex except mask [B, T, E], lsnr [B, T, 1].
    """

    def __init__(self, stft_cfg: Stft, erb_widths_: Sequence[int], nb_df: int,
                 lsnr_range: Tuple[float, float], asr_model=None):
        self.stft_cfg = stft_cfg
        self.nb_df = nb_df
        self.lsnr_range = lsnr_range
        self.erb_fb = jnp.asarray(
            erb_fb_matrices(tuple(erb_widths_), normalized=True, inverse=False)
        )
        self.erb_inv_fb = jnp.asarray(
            erb_fb_matrices(tuple(erb_widths_), normalized=True, inverse=True)
        )
        c = config
        self.ml_f = c("factor", 0.0, float, section="MaskLoss")
        self.ml_mask = c("mask", "iam", str, section="MaskLoss")
        self.ml_gamma = c("gamma", 0.6, float, section="MaskLoss")
        self.ml_gamma_pred = c("gamma_pred", 0.6, float, section="MaskLoss")
        self.ml_f_under = c("f_under", 2.0, float, section="MaskLoss")
        ml_max_freq = c("max_freq", 0.0, float, section="MaskLoss")
        self.ml_f_max_idx = (
            int(ml_max_freq / (stft_cfg.sr / stft_cfg.fft_size))
            if ml_max_freq > 0 else None
        )
        # DfAlphaLoss (df/loss.py:297-342): penalize the DFN1/DFN2 alpha
        # head for using DF in very noisy segments
        self.dfalpha_f = c("factor", 0.0, float, section="DfAlphaLoss")
        self.dfalpha_thresh = c("lsnr_thresh", -7.5, float, section="DfAlphaLoss")
        self.dfalpha_min = c("lsnr_min", -10.0, float, section="DfAlphaLoss")
        self.sl_fm = c("factor_magnitude", 0.0, float, section="SpectralLoss")
        self.sl_fc = c("factor_complex", 0.0, float, section="SpectralLoss")
        self.sl_fu = c("factor_under", 1.0, float, section="SpectralLoss")
        self.sl_gamma = c("gamma", 1.0, float, section="SpectralLoss")
        self.mrsl_f = c("factor", 0.0, float, section="MultiResSpecLoss")
        self.mrsl_fc = c("factor_complex", 0.0, float, section="MultiResSpecLoss")
        self.mrsl_gamma = c("gamma", 1.0, float, section="MultiResSpecLoss")
        self.mrsl_ffts = tuple(
            int(v) for v in c("fft_sizes", (512, 1024, 2048), Csv(int),
                              section="MultiResSpecLoss")
        )
        self.sdrl_f = c("factor", 0.0, float, section="SdrLoss")
        self.sdrl_seg_ws = tuple(
            int(v) for v in c("segmental_ws", (), Csv(int), section="SdrLoss")
        )
        self.lsnr_f = c("factor", 0.0005, float, section="LocalSnrLoss")
        # Time-domain reconstruction for MRSL/SDR losses. "torch" (default)
        # replicates the reference trainer's normalized torch.istft — the
        # signals feeding the TD losses are scaled by sqrt(n_fft)*wnorm
        # (see loss_istft) — so config factors mean the same thing as in
        # df/train.py. "exact" uses the DSP-exact inverse (true amplitude;
        # the pre-r05 behavior).
        self.td_istft = c("TD_LOSS_ISTFT", "torch", str, section="train")
        assert self.td_istft in ("torch", "exact"), self.td_istft
        asrl_f = c("factor", 0.0, float, section="ASRLoss")
        self.asr_loss = None
        if asrl_f > 0 or asr_model is not None:
            from deepfilternet_tpu.train.asr_loss import ASRLoss

            self.asr_loss = ASRLoss(
                sr=stft_cfg.sr,
                factor=asrl_f,
                factor_lm=c("factor_lm", 1.0, float, section="ASRLoss"),
                loss_lm=c("loss_lm", "CrossEntropy", str, section="ASRLoss"),
                model=c("model", "", str, section="ASRLoss"),
                whisper_model=asr_model,
            )

    def __call__(
        self,
        clean: jnp.ndarray,
        noisy: jnp.ndarray,
        enhanced: jnp.ndarray,
        mask: jnp.ndarray,
        lsnr: jnp.ndarray,
        df_alpha: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        p = self.stft_cfg
        losses: Dict[str, jnp.ndarray] = {}
        total = jnp.zeros(())
        lsnr_gt = local_snr_target(
            clean,
            noisy - clean,
            p.sr,
            p.fft_size,
            p.hop_size,
            (self.lsnr_range[0] - 1, self.lsnr_range[1] + 1),
        )
        if self.ml_f != 0:
            if self.ml_mask == "spec":
                # MaskSpecLoss (df/loss.py:280-294): apply the ERB mask to
                # the noisy spectrum, spectral-loss against clean
                gains = mask @ self.erb_inv_fb  # [B,T,F]
                enh_m = noisy * gains
                cl = clean
                if self.ml_f_max_idx is not None:
                    enh_m = enh_m[..., : self.ml_f_max_idx]
                    cl = cl[..., : self.ml_f_max_idx]
                losses["mask"] = spectral_loss(
                    enh_m, cl, gamma=self.ml_gamma, factor_magnitude=self.ml_f,
                    factor_complex=0.0,
                )
            else:
                losses["mask"] = mask_loss(
                    mask, clean, noisy, self.erb_fb,
                    mask=self.ml_mask, gamma=self.ml_gamma,
                    gamma_pred=self.ml_gamma_pred,
                    f_under=self.ml_f_under, factor=self.ml_f,
                )
        if self.sl_fm + self.sl_fc > 0:
            losses["spectral"] = spectral_loss(
                enhanced, clean, gamma=self.sl_gamma, factor_magnitude=self.sl_fm,
                factor_complex=self.sl_fc, factor_under=self.sl_fu,
            )
        need_td = self.mrsl_f > 0 or self.sdrl_f != 0 or self.asr_loss is not None
        if need_td:
            if self.td_istft == "torch":
                from deepfilternet_tpu.ops.stft import vorbis_window

                win = vorbis_window(p.fft_size)
                enhanced_td = loss_istft(enhanced, p.fft_size, p.hop_size, win)
                clean_td = loss_istft(clean, p.fft_size, p.hop_size, win)
            else:
                enhanced_td = istft(enhanced, p)
                clean_td = istft(clean, p)
        if self.mrsl_f > 0:
            losses["mrsl"] = multi_res_spec_loss(
                enhanced_td, clean_td, self.mrsl_ffts, gamma=self.mrsl_gamma,
                factor=self.mrsl_f, factor_complex=self.mrsl_fc,
            )
        if self.sdrl_f != 0:
            if self.sdrl_seg_ws and any(w > 0 for w in self.sdrl_seg_ws):
                losses["sdr"] = seg_sdr_loss(enhanced_td, clean_td, self.sdrl_seg_ws,
                                             factor=self.sdrl_f)
            else:
                losses["sdr"] = sdr_loss(enhanced_td, clean_td, factor=self.sdrl_f)
        if self.lsnr_f != 0:
            losses["lsnr"] = local_snr_loss(lsnr, lsnr_gt, factor=self.lsnr_f)
        if self.dfalpha_f != 0 and df_alpha is not None:
            losses["df_alpha"] = df_alpha_loss(
                df_alpha, lsnr_gt, factor=self.dfalpha_f,
                lsnr_thresh=self.dfalpha_thresh, lsnr_min=self.dfalpha_min,
            )
        if self.asr_loss is not None:
            losses["asr"] = self.asr_loss(enhanced_td, clean_td)
        for v in losses.values():
            total = total + v
        return total, losses
