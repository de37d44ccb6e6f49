"""Vorbis-windowed STFT / inverse STFT with the reference's exact numerics.

Reference semantics (/root/reference/libDF/src/lib.rs:103-154, 356-427 and
/root/reference/pyDF/src/lib.rs:41-107):

  * window: vorbis ``sin(pi/2 * sin^2(pi*(n+0.5)/N))`` computed in float64;
  * forward normalization ``wnorm = 2*hop / fft_size**2`` applied in
    analysis only (forward rFFT itself is unnormalized);
  * analysis is streaming: frame ``i`` transforms
    ``signal[(i+1)*hop - fft : (i+1)*hop]`` with implicit left zero
    padding (the zero-initialized ``analysis_mem``), producing exactly
    ``T // hop`` frames — equivalent to left-padding by ``fft - hop`` and
    framing with stride ``hop``;
  * synthesis is unnormalized irFFT (scale ``fft_size``), windowed,
    overlap-added; the pipeline's algorithmic delay is ``fft - hop``.

TPU-first formulation: instead of a sequential per-frame loop, analysis is a
single gather-into-frames + batched rFFT (or a DFT matmul on the MXU, see
`dft_matrices`), and synthesis overlap-add is a strided scatter-add. Both
are fully parallel over frames, XLA-fusable, and shard trivially over a
stream/batch axis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def vorbis_window(fft_size: int) -> np.ndarray:
    """Vorbis (Princen-Bradley compliant) window, float64 math, f32 output."""
    half = fft_size / 2
    n = np.arange(fft_size, dtype=np.float64)
    s = np.sin(0.5 * np.pi * (n + 0.5) / half)
    return np.sin(0.5 * np.pi * s * s).astype(np.float32)


def wnorm(fft_size: int, hop_size: int) -> float:
    """Forward normalization 1/(N^2/(2*hop)) (lib.rs:133)."""
    return float(2.0 * hop_size / (fft_size * fft_size))


class Stft(NamedTuple):
    """Static STFT configuration (the analog of the reference's DFState

    minus the mutable per-stream buffers, which live in explicit carry
    pytrees on the streaming path instead)."""

    sr: int
    fft_size: int
    hop_size: int

    @property
    def freq_size(self) -> int:
        return self.fft_size // 2 + 1

    @property
    def delay(self) -> int:
        return self.fft_size - self.hop_size

    @property
    def window(self) -> np.ndarray:
        return vorbis_window(self.fft_size)

    @property
    def wnorm(self) -> float:
        return wnorm(self.fft_size, self.hop_size)


def frame_signal(x: jnp.ndarray, fft_size: int, hop_size: int) -> jnp.ndarray:
    """[..., T] -> [..., T//hop, fft_size] with left zero-pad of fft-hop.

    Frame i holds signal[(i+1)*hop - fft : (i+1)*hop], matching the
    streaming analysis memory semantics.
    """
    t = x.shape[-1]
    n_frames = t // hop_size
    pad = [(0, 0)] * (x.ndim - 1) + [(fft_size - hop_size, 0)]
    xp = jnp.pad(x, pad)
    idx = (
        np.arange(n_frames)[:, None] * hop_size + np.arange(fft_size)[None, :]
    )  # static [T', N]
    return xp[..., idx]


def _use_dft_matmul() -> bool:
    # XLA's TPU FFT lowering is an order of magnitude slower than the
    # equivalent MXU matmul at these sizes; CPU keeps the true FFT.
    import jax

    return jax.default_backend() == "tpu"


def stft(x: jnp.ndarray, cfg: Stft) -> jnp.ndarray:
    """Analysis: [..., T] real -> [..., T//hop, F] complex64.

    Matches pyDF `DF.analysis` bit-for-bit semantics (modulo fp summation
    order): windowed rfft scaled by wnorm, with fresh (zero) stream state.
    On TPU the windowed DFT runs as MXU matmuls (see dft_matrices).
    """
    frames = frame_signal(x, cfg.fft_size, cfg.hop_size)
    if _use_dft_matmul():
        cos_m, sin_m = dft_matrices(cfg.fft_size, cfg.hop_size)
        re = frames @ jnp.asarray(cos_m)
        im = frames @ jnp.asarray(sin_m)
        return (re + 1j * im).astype(jnp.complex64)
    win = jnp.asarray(cfg.window)
    spec = jnp.fft.rfft(frames * win, axis=-1)
    return (spec * cfg.wnorm).astype(jnp.complex64)


def istft(spec: jnp.ndarray, cfg: Stft) -> jnp.ndarray:
    """Synthesis: [..., T', F] complex -> [..., T'*hop] real.

    Unnormalized inverse (irfft * fft_size), windowed, overlap-add. Output
    sample block i is the OLA sum over in-flight frames, matching
    frame_synthesis (lib.rs:396-427). The first output hop of a fresh
    stream corresponds to synthesis memory zero.
    """
    n_frames = spec.shape[-2]
    fft = cfg.fft_size
    hop = cfg.hop_size
    if _use_dft_matmul():
        re_m, im_m = idft_matrices(fft)
        frames = (jnp.real(spec) @ jnp.asarray(re_m)
                  + jnp.imag(spec) @ jnp.asarray(im_m)).astype(jnp.float32)
    else:
        win = jnp.asarray(cfg.window)
        frames = jnp.fft.irfft(spec, n=fft, axis=-1) * (fft * 1.0)
        frames = (frames * win).astype(jnp.float32)

    # Overlap-add via reshape trick: split each frame into fft//hop hop-sized
    # chunks, then sum shifted diagonals. r = fft//hop is a small static int.
    r = fft // hop
    assert fft % hop == 0, "istft currently requires hop | fft"
    chunks = frames.reshape(frames.shape[:-1] + (r, hop))  # [..., T', r, hop]
    out_len = n_frames * hop
    out = jnp.zeros(spec.shape[:-2] + (out_len + (r - 1) * hop,), jnp.float32)
    for k in range(r):
        # chunk k of frame i lands at output offset (i + k) * hop
        seg = chunks[..., :, k, :].reshape(chunks.shape[:-3] + (out_len,))
        out = out.at[..., k * hop : k * hop + out_len].add(seg)
    return out[..., :out_len]


def istft_ri(spec_ri: jnp.ndarray, cfg: Stft) -> jnp.ndarray:
    """Synthesis from re/im-split input [..., T', F, 2] -> [..., T'*hop].

    Real-only math end to end (safe at eager/jit boundaries on runtimes
    that cannot materialize complex arrays in HBM, e.g. the axon TPU
    plugin)."""
    n_frames = spec_ri.shape[-3]
    fft = cfg.fft_size
    hop = cfg.hop_size
    re_m, im_m = idft_matrices(fft)
    frames = (spec_ri[..., 0] @ jnp.asarray(re_m)
              + spec_ri[..., 1] @ jnp.asarray(im_m)).astype(jnp.float32)
    r = fft // hop
    chunks = frames.reshape(frames.shape[:-1] + (r, hop))
    out_len = n_frames * hop
    out = jnp.zeros(spec_ri.shape[:-3] + (out_len + (r - 1) * hop,), jnp.float32)
    for k in range(r):
        seg = chunks[..., :, k, :].reshape(chunks.shape[:-3] + (out_len,))
        out = out.at[..., k * hop : k * hop + out_len].add(seg)
    return out[..., :out_len]


# ---------------------------------------------------------------------------
# DFT-as-matmul: XLA's TPU FFT lowering for N=960 is an order of magnitude
# slower than an MXU matmul of the same math (measured ~3 ms vs ~40 us per
# 512-stream frame). For the streaming hot path we materialize the real-DFT
# as two [N, F] matrices with the analysis window and wnorm folded in, and
# the inverse as two [F, N] matrices with the synthesis window folded in.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def dft_matrices(fft_size: int, hop_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """(cos_mat, sin_mat): windowed forward real-DFT, [N, F] each.

    spec = (frame @ cos_mat) + 1j * (frame @ sin_mat), matching
    rfft(frame * window) * wnorm. Built in float64, stored float32.
    """
    n = fft_size
    f = n // 2 + 1
    k = np.arange(n, dtype=np.float64)[:, None]
    j = np.arange(f, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * k * j / n
    w = vorbis_window(n).astype(np.float64)[:, None]
    scale = wnorm(fft_size, hop_size)
    cos_m = (np.cos(ang) * w * scale).astype(np.float32)
    sin_m = (np.sin(ang) * w * scale).astype(np.float32)
    return cos_m, sin_m


@functools.lru_cache(maxsize=None)
def idft_matrices(fft_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """(re_mat, im_mat): [F, N] inverse real-DFT x fft_size with the
    synthesis window folded in.

    x = spec_re @ re_mat + spec_im @ im_mat  ==  irfft(spec) * N * window.
    Interior bins count twice (conjugate symmetry), DC/Nyquist once.
    """
    n = fft_size
    f = n // 2 + 1
    j = np.arange(f, dtype=np.float64)[:, None]
    k = np.arange(n, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * j * k / n
    mult = np.full((f, 1), 2.0)
    mult[0] = 1.0
    if n % 2 == 0:
        mult[-1] = 1.0
    w = vorbis_window(n).astype(np.float64)[None, :]
    re_m = (np.cos(ang) * mult * w).astype(np.float32)
    im_m = (-np.sin(ang) * mult * w).astype(np.float32)
    return re_m, im_m


def analysis_step_ri(
    state: jnp.ndarray, frame: jnp.ndarray, cfg: "Stft"
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MXU-matmul streaming analysis returning re/im parts.

    state: [..., fft-hop]; frame: [..., hop].
    Returns (new_state, spec_re [..., F], spec_im [..., F]).
    """
    buf = jnp.concatenate([state, frame], axis=-1)
    cos_m, sin_m = dft_matrices(cfg.fft_size, cfg.hop_size)
    # Two separate matmuls, DELIBERATELY: merging into one [fft, 2F]
    # product measured -4% at S=4096 (PERF.md r04 refuted levers — the
    # merged output breaks XLA's epilogue fusion into the downstream
    # power/feature math and costs an extra HBM round trip).
    re = buf @ jnp.asarray(cos_m)
    im = buf @ jnp.asarray(sin_m)
    return buf[..., cfg.hop_size :], re, im


def synthesis_step_ri(
    state: jnp.ndarray, spec_re: jnp.ndarray, spec_im: jnp.ndarray, cfg: "Stft"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MXU-matmul streaming synthesis from re/im parts (windowed iDFT +
    overlap-add). Same semantics as synthesis_step."""
    fft = cfg.fft_size
    hop = cfg.hop_size
    re_m, im_m = idft_matrices(fft)
    # two matmuls + add, deliberately (see analysis_step_ri note)
    x = spec_re @ jnp.asarray(re_m) + spec_im @ jnp.asarray(im_m)
    out = x[..., :hop] + state[..., :hop]
    tail = x[..., hop:]
    d = fft - hop
    shifted = jnp.concatenate(
        [state[..., hop:], jnp.zeros(state.shape[:-1] + (hop,), state.dtype)], axis=-1
    )
    new_state = shifted + tail if d > 0 else shifted
    return new_state, out


# ---------------------------------------------------------------------------
# Streaming single-frame kernels (the lax.scan cell building blocks)
# ---------------------------------------------------------------------------


class StftState(NamedTuple):
    """Per-stream mutable STFT state: analysis + synthesis memories.

    analysis_mem: [..., fft-hop] last input samples (pre-window history).
    synthesis_mem: [..., fft-hop] pending overlap-add tail.
    """

    analysis_mem: jnp.ndarray
    synthesis_mem: jnp.ndarray


def stft_state_init(batch_shape: Tuple[int, ...], cfg: Stft) -> StftState:
    d = cfg.fft_size - cfg.hop_size
    z = jnp.zeros(batch_shape + (d,), jnp.float32)
    return StftState(analysis_mem=z, synthesis_mem=z)


def analysis_step(
    state: jnp.ndarray, frame: jnp.ndarray, cfg: Stft
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One hop of streaming analysis.

    state: [..., fft-hop] analysis memory; frame: [..., hop].
    Returns (new_state, spec [..., F] complex64).
    """
    buf = jnp.concatenate([state, frame], axis=-1)
    win = jnp.asarray(cfg.window)
    spec = jnp.fft.rfft(buf * win, axis=-1) * cfg.wnorm
    new_state = buf[..., cfg.hop_size :]
    return new_state, spec.astype(jnp.complex64)


def synthesis_step(
    state: jnp.ndarray, spec: jnp.ndarray, cfg: Stft
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One hop of streaming synthesis (irfft + window + OLA).

    state: [..., fft-hop] synthesis memory; spec: [..., F] complex.
    Returns (new_state, out [..., hop]).
    """
    fft = cfg.fft_size
    hop = cfg.hop_size
    win = jnp.asarray(cfg.window)
    x = jnp.fft.irfft(spec, n=fft, axis=-1) * (fft * 1.0)
    x = (x * win).astype(jnp.float32)
    out = x[..., :hop] + state[..., :hop]
    # Remaining tail overlaps into future frames: shift memory left by hop,
    # add head of x-tail, append final hop of x.
    tail = x[..., hop:]
    d = fft - hop
    shifted = jnp.concatenate(
        [state[..., hop:], jnp.zeros(state.shape[:-1] + (hop,), state.dtype)], axis=-1
    )
    new_state = shifted + tail if d > 0 else shifted
    return new_state, out
