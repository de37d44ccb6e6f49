"""ASR (Whisper) perceptual loss — TPU-native version of df/loss.py:419-648.

The reference distills OpenAI-Whisper behavior into training: (1) MSE
between the Whisper audio-encoder embeddings of the enhanced and clean
signals (df/loss.py:470-474), and (2) a token loss on the decoder logits —
CrossEntropy against tokens greedily decoded from the clean signal
(eot-padded, df/loss.py:476-545) or CTC with eot-derived lengths.

This implementation is fully jittable JAX end to end:

- 48 kHz -> 16 kHz conversion is an anti-aliased polyphase FIR decimation
  expressed as a strided convolution (MXU-friendly), not a host-side
  resampler.
- Whisper log-mel features (n_fft 400, hop 160, 80 slaney-normalized mel
  bands, log10 clamp + per-sample max-8 floor, (x+4)/4) are computed with
  a DFT matmul + mel matrix matmul.
- The Whisper model is the HF Flax implementation; the greedy decode of
  the clean signal runs as a `lax.scan` with a fixed token budget
  (`sample_len`, reference max_ctx=25) under stop_gradient, and the token
  loss teacher-forces those tokens through the decoder on the *enhanced*
  embeddings (one decoder call — the jit-friendly form of the reference's
  sampled-path logits).

Pretrained weights are not vendorable in this environment: constructing
with a `model` path that does not exist raises with a clear message.
Tests inject a tiny randomly initialized Whisper via `whisper_model=`.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# polyphase FIR resampling as strided convolution
# ---------------------------------------------------------------------------


def _kaiser_sinc_taps(up: int, down: int, taps_per_phase: int = 16,
                      beta: float = 8.555) -> np.ndarray:
    """Lowpass FIR for rational resampling by up/down (cutoff at the
    narrower Nyquist), kaiser-windowed sinc."""
    cutoff = 0.5 / max(up, down)  # in units of the upsampled rate
    half = taps_per_phase * max(up, down)
    n = np.arange(-half, half + 1, dtype=np.float64)
    taps = 2 * cutoff * np.sinc(2 * cutoff * n)
    taps *= np.kaiser(len(n), beta)
    taps *= up / taps.sum() / up  # unity DC gain after upsampling
    return (taps * up).astype(np.float32)


def fir_resample(x: jnp.ndarray, sr_in: int, sr_out: int) -> jnp.ndarray:
    """Rational-rate resample [..., T] -> [..., T*sr_out/sr_in], jittable.

    Implemented as lhs-dilated + strided conv (polyphase): XLA lowers this
    to MXU-friendly strided convolution; no host round-trip.
    """
    if sr_in == sr_out:
        return x
    g = math.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    taps = _kaiser_sinc_taps(up, down)
    k = len(taps)
    lead = x.shape[:-1]
    t = x.shape[-1]
    xx = x.reshape(-1, 1, t)
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        xx,
        jnp.asarray(taps).reshape(1, 1, k),
        window_strides=(down,),
        padding=[(pad, pad)],
        lhs_dilation=(up,),
        dimension_numbers=("NCT", "IOT", "NCT"),
    )
    out_len = (t * up) // down
    return y[..., 0, :out_len].reshape(*lead, -1)


# ---------------------------------------------------------------------------
# Whisper log-mel features
# ---------------------------------------------------------------------------


def _slaney_mel_fb(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """Slaney-style mel filterbank [n_fft//2+1, n_mels] (librosa default),
    the filter family Whisper's preprocessing uses."""
    fmin, fmax = 0.0, sr / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = f / (200.0 / 3.0)
        log_region = f >= 1000.0
        mel = np.where(
            log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / np.log(6.4) * 27.0, mel
        )
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3.0)
        log_region = m >= 15.0
        return np.where(log_region, 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0)), f)

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz = mel_to_hz(mels)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    fb = np.zeros((len(bins), n_mels), dtype=np.float64)
    for i in range(n_mels):
        lo, ctr, hi = hz[i], hz[i + 1], hz[i + 2]
        up = (bins - lo) / max(ctr - lo, 1e-10)
        dn = (hi - bins) / max(hi - ctr, 1e-10)
        fb[:, i] = np.maximum(0.0, np.minimum(up, dn))
        fb[:, i] *= 2.0 / (hi - lo)  # slaney area normalization
    return fb.astype(np.float32)


def whisper_log_mel(audio16k: jnp.ndarray, n_fft: int = 400, hop: int = 160,
                    n_mels: int = 80, chunk_frames: int = 3000) -> jnp.ndarray:
    """audio [B, T] @16 kHz -> Whisper input_features [B, n_mels, 3000].

    Matches Whisper preprocessing: hann window, magnitude^2 of all frames
    except the trailing one, slaney mel fb, log10 clamp 1e-10, per-sample
    floor at (max - 8), then (x + 4) / 4. Audio is zero-padded/trimmed to
    `chunk_frames` (30 s).
    """
    b, t = audio16k.shape
    want = chunk_frames * hop
    if t >= want:
        audio16k = audio16k[:, :want]
    else:
        audio16k = jnp.pad(audio16k, ((0, 0), (0, want - t)))
    # reflect-pad half a window on each side (whisper/torch.stft center=True)
    p = n_fft // 2
    xpad = jnp.pad(audio16k, ((0, 0), (p, p)), mode="reflect")
    idx = np.arange(chunk_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = xpad[:, idx] * jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    # real DFT as matmul (MXU) — n_fft=400 is small and non-power-of-two
    nfrq = n_fft // 2 + 1
    nn = np.arange(n_fft)
    kk = np.arange(nfrq)
    ang = 2.0 * np.pi * np.outer(nn, kk) / n_fft
    cos_m = jnp.asarray(np.cos(ang).astype(np.float32))
    sin_m = jnp.asarray((-np.sin(ang)).astype(np.float32))
    re = frames @ cos_m
    im = frames @ sin_m
    power = re**2 + im**2  # [B, F, nfrq] with F=chunk_frames
    mel = power @ jnp.asarray(_slaney_mel_fb(16000, n_fft, n_mels))  # [B,F,M]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    log_spec = jnp.maximum(log_spec, floor)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.transpose(log_spec, (0, 2, 1))  # [B, M, F]


# ---------------------------------------------------------------------------
# the loss
# ---------------------------------------------------------------------------


class ASRLoss:
    """Whisper-distillation loss (reference df/loss.py:419-648 semantics).

    factor    — weight of the encoder-embedding MSE.
    factor_lm — weight of the token loss on decoder logits.
    loss_lm   — "CrossEntropy" (default) or "CTC" (optax.ctc_loss).
    model     — local path to HF Flax Whisper weights (from_pretrained);
                weights are not vendorable here, so a missing path raises.
    whisper_model — an already-constructed FlaxWhisperForConditionalGeneration
                (tests inject a tiny random one).
    initial_tokens — decoder prompt (sot sequence); defaults to the model's
                decoder_start_token_id (+ any forced_decoder_ids).
    """

    target_sr = 16000
    n_fft = 400
    hop = 160
    n_mels = 80
    sample_len = 25  # reference max_ctx

    def __init__(
        self,
        sr: int,
        factor: float = 1.0,
        factor_lm: float = 1.0,
        loss_lm: str = "CrossEntropy",
        model: str = "",
        whisper_model=None,
        initial_tokens: Optional[Sequence[int]] = None,
        blank_id: int = 220,  # whisper token for " "
    ) -> None:
        if loss_lm not in ("CrossEntropy", "CTC"):
            raise ValueError(f"loss_lm must be CrossEntropy or CTC, got {loss_lm!r}")
        self.sr = sr
        self.factor = float(factor)
        self.factor_lm = float(factor_lm)
        self.loss_lm = loss_lm
        self.blank_id = blank_id
        if whisper_model is None:
            if not model or not os.path.exists(model):
                raise NotImplementedError(
                    "ASRLoss needs local HF Flax Whisper weights "
                    "(config ASRLoss.MODEL=/path/to/whisper); pretrained "
                    "weights are not vendored in this environment "
                    "(reference df/loss.py:419-648)."
                )
            from transformers.models.whisper.modeling_flax_whisper import (
                FlaxWhisperForConditionalGeneration,
            )

            whisper_model = FlaxWhisperForConditionalGeneration.from_pretrained(model)
        self.whisper = whisper_model
        cfg = whisper_model.config
        if initial_tokens is None:
            initial_tokens = [cfg.decoder_start_token_id]
            forced = getattr(cfg, "forced_decoder_ids", None) or []
            initial_tokens += [tok for _, tok in forced]
        self.initial_tokens = tuple(int(t) for t in initial_tokens)
        self.eot = int(cfg.eos_token_id)

    # -- whisper plumbing ---------------------------------------------------

    def _embed(self, audio_td: jnp.ndarray) -> jnp.ndarray:
        a16 = fir_resample(audio_td, self.sr, self.target_sr)
        feats = whisper_log_mel(a16, self.n_fft, self.hop, self.n_mels)
        return self.whisper.encode(input_features=feats).last_hidden_state

    def _greedy_tokens(self, enc_hidden: jnp.ndarray) -> jnp.ndarray:
        """Greedy decode with a fixed budget; returns [B, sample_len] tokens
        (eot-propagating: once eot is emitted the rest stay eot)."""
        b = enc_hidden.shape[0]
        init = jnp.asarray(self.initial_tokens, jnp.int32)
        n0 = len(self.initial_tokens)
        total = n0 + self.sample_len
        ids0 = jnp.full((b, total), self.eot, jnp.int32)
        ids0 = ids0.at[:, :n0].set(init[None, :])

        from transformers.modeling_flax_outputs import FlaxBaseModelOutput

        enc_out = FlaxBaseModelOutput(last_hidden_state=enc_hidden)

        def step(carry, i):
            ids, done = carry
            logits = self.whisper.decode(
                decoder_input_ids=ids, encoder_outputs=enc_out
            ).logits  # [B, total, V]
            pos = n0 + i - 1  # logits at the last committed token predict slot n0+i
            nxt = jnp.argmax(logits[:, pos], axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, self.eot, nxt)
            ids = jax.lax.dynamic_update_index_in_dim(
                ids.T, nxt, pos + 1, axis=0
            ).T
            done = done | (nxt == self.eot)
            return (ids, done), None

        (ids, _), _ = jax.lax.scan(
            step, (ids0, jnp.zeros((b,), bool)), jnp.arange(self.sample_len)
        )
        return jax.lax.stop_gradient(ids[:, n0:])

    # -- public -------------------------------------------------------------

    def __call__(self, enhanced_td: jnp.ndarray, clean_td: jnp.ndarray
                 ) -> jnp.ndarray:
        emb_e = self._embed(enhanced_td)
        emb_c = jax.lax.stop_gradient(self._embed(clean_td))
        loss = jnp.zeros(())
        if self.factor > 0:
            loss = loss + jnp.mean((emb_e - emb_c) ** 2) * self.factor
        if self.factor_lm > 0:
            tokens_c = self._greedy_tokens(emb_c)  # [B, S]
            n0 = len(self.initial_tokens)
            b = tokens_c.shape[0]
            init = jnp.broadcast_to(
                jnp.asarray(self.initial_tokens, jnp.int32)[None, :], (b, n0)
            )
            dec_in = jnp.concatenate([init, tokens_c], axis=1)[:, :-1]
            from transformers.modeling_flax_outputs import FlaxBaseModelOutput

            logits = self.whisper.decode(
                decoder_input_ids=dec_in,
                encoder_outputs=FlaxBaseModelOutput(last_hidden_state=emb_e),
            ).logits[:, n0 - 1 :]  # predictions for the sampled positions
            logp = jax.nn.log_softmax(logits, axis=-1)
            if self.loss_lm == "CrossEntropy":
                nll = -jnp.take_along_axis(logp, tokens_c[..., None], axis=-1)[..., 0]
                loss = loss + jnp.mean(nll) * self.factor_lm
            else:  # CTC
                import optax

                lengths = jnp.argmax(
                    jnp.concatenate(
                        [tokens_c == self.eot,
                         jnp.ones((b, 1), bool)], axis=1
                    ), axis=1,
                )
                t_steps = logp.shape[1]
                logit_pad = jnp.zeros((b, t_steps))
                label_pad = (
                    jnp.arange(tokens_c.shape[1])[None, :] >= lengths[:, None]
                ).astype(jnp.float32)
                ctc = optax.ctc_loss(
                    logits, logit_pad, tokens_c, label_pad, blank_id=self.blank_id
                )
                loss = loss + jnp.mean(ctc) * self.factor_lm
        return loss
