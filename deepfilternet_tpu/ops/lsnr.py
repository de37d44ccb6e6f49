"""Local SNR target computation (df/modules.py:816-876).

Frame-local speech/noise energies with a small hann smoothing window over
time, in dB, clamped to the configured LSNR range. Used as the training
target for the model's LSNR head.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _hann(ws: int) -> np.ndarray:
    """torch.hann_window(ws) equivalent (periodic)."""
    if ws == 1:
        # torch.hann_window(1, periodic=True) == [0.]; guard with ones so a
        # ws=1 smoothing window is the identity (see test_lsnr for the
        # torch-checked behavior actually used by the reference config).
        return np.ones(1, np.float32)
    n = np.arange(ws, dtype=np.float64)
    return (0.5 * (1 - np.cos(2 * np.pi * n / ws))).astype(np.float32)


def calc_ws(ws_ms: float, sr: int, fft_size: int, hop_size: int) -> int:
    ws = ws_ms - fft_size / sr * 1000.0
    ws = 1 + ws / (hop_size / sr * 1000.0)
    return max(int(round(ws)), 1)


def _local_energy(spec: jnp.ndarray, ws: int) -> jnp.ndarray:
    """spec: [B, T, F] complex -> [B, T] hann-smoothed frame energies."""
    if ws % 2 == 0:
        ws += 1
    half = ws // 2
    e = jnp.sum(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2, axis=-1)  # [B, T]
    e = jnp.pad(e, ((0, 0), (half, half)))
    w = jnp.asarray(_hann(ws))
    t = spec.shape[-2]
    idx = np.arange(t)[:, None] + np.arange(ws)[None, :]
    return jnp.sum(e[:, idx] * w, axis=-1) / ws


def local_snr(
    clean: jnp.ndarray,
    noise: jnp.ndarray,
    window_size: int,
    db: bool = False,
    window_size_ns: Optional[int] = None,
    eps: float = 1e-12,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """clean/noise: [B, T, F] complex. Returns (snr [B,T], E_s, E_n)."""
    e_s = _local_energy(clean, window_size)
    e_n = _local_energy(noise, window_size_ns or window_size)
    snr = e_s / jnp.maximum(e_n, eps)
    if db:
        snr = 10.0 * jnp.log10(jnp.maximum(snr, eps))
    return snr, e_s, e_n


def local_snr_target(
    clean: jnp.ndarray,
    noise: jnp.ndarray,
    sr: int,
    fft_size: int,
    hop_size: int,
    snr_range: Tuple[float, float],
    ws_ms: float = 20.0,
    max_bin: Optional[int] = None,
) -> jnp.ndarray:
    """LocalSnrTarget.forward equivalent: [B, T] dB target in snr_range."""
    if max_bin is not None:
        clean = clean[..., :max_bin]
        noise = noise[..., :max_bin]
    ws = calc_ws(ws_ms, sr, fft_size, hop_size)
    snr, _, _ = local_snr(clean, noise, ws, db=True, window_size_ns=ws * 2)
    return jnp.clip(snr, snr_range[0], snr_range[1])
