"""User-facing enhancement API + `deepFilter`-compatible CLI.

Mirrors the reference's df/enhance.py surface:
  * `init_df(model_base_dir, ...)` -> (model, df_state, suffix)
  * `df_features(audio, df_state, nb_df)` -> (spec, erb_feat, spec_feat)
  * `enhance(model, df_state, audio, pad=True, atten_lim_db=None)`
  * CLI: `python -m deepfilternet_tpu.enhance noisy.wav [-o outdir] [--pf] ...`

Differences by design: the model is a (params, state, cfg, module) bundle
rather than an nn.Module; everything device-side runs under one jit with
real-valued tensors at the boundary (re/im split); the delay-compensation
semantics (pad n_fft, trim d = n_fft - hop) match enhance.py:206-250.
"""

from __future__ import annotations

import argparse
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepfilternet_tpu.checkpoint import read_cp
from deepfilternet_tpu.config import config
from deepfilternet_tpu.models import init_model
from deepfilternet_tpu.ops import (
    Stft,
    erb_widths,
    get_norm_alpha,
    istft,
    stft,
)
from deepfilternet_tpu.ops.stft import istft_ri
from deepfilternet_tpu.ops.features import erb_feat as _erb_feat
from deepfilternet_tpu.ops.features import spec_feat as _spec_feat
from deepfilternet_tpu.utils.audio_io import load_audio, resample, save_audio


@dataclass
class DfState:
    """Static DSP state: the analog of the reference's `DF` pyclass."""

    sr: int = 48000
    fft_size: int = 960
    hop_size: int = 480
    nb_erb: int = 32
    min_nb_erb_freqs: int = 1

    @property
    def stft_cfg(self) -> Stft:
        return Stft(sr=self.sr, fft_size=self.fft_size, hop_size=self.hop_size)

    @property
    def erb_widths(self):
        return erb_widths(self.sr, self.fft_size, self.nb_erb, self.min_nb_erb_freqs)

    @property
    def delay(self) -> int:
        return self.fft_size - self.hop_size


@dataclass
class DfModel:
    params: Any
    state: Any
    cfg: Dict
    module: Any
    post_filter: bool = False
    epoch: Optional[int] = None
    _jit_cache: Dict = field(default_factory=dict)


def init_df(
    model_base_dir: Optional[str] = None,
    post_filter: bool = False,
    log_level: str = "INFO",
    config_allow_defaults: bool = True,
    epoch: str | int = "best",
    mask_only: bool = False,
    model_name: Optional[str] = None,
) -> Tuple[DfModel, DfState, str]:
    """Load a model + DSP state.

    If `model_base_dir` is given it must contain `config.ini` and a
    `checkpoints/` dir (reference layout); otherwise defaults are used with
    randomly initialized weights (no pretrained download in this
    environment).
    """
    if model_base_dir is not None and (
        model_base_dir.endswith(".tar.gz") or model_base_dir.endswith(".tgz")
    ):
        # model artifact tar.gz (scripts/export.py; the DfParams loader
        # analog, tract.rs:22-92): extract to a cache dir and load from there
        import hashlib
        import tarfile

        digest = hashlib.sha256(model_base_dir.encode()).hexdigest()[:12]
        cache = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "deepfilternet_tpu", digest,
        )
        if not os.path.isdir(cache):
            os.makedirs(cache, exist_ok=True)
            with tarfile.open(model_base_dir, "r:gz") as tar:
                tar.extractall(cache, filter="data")
        model_base_dir = cache
    if model_base_dir is not None:
        # a model dir fully defines its configuration
        config.reset()
        cfg_path = os.path.join(model_base_dir, "config.ini")
        config.load(cfg_path if os.path.isfile(cfg_path) else None,
                    allow_defaults=config_allow_defaults, allow_reload=True)
    params, state, cfg, module = init_model(model_name)
    model = DfModel(params=params, state=state, cfg=cfg, module=module,
                    post_filter=post_filter)
    if post_filter:
        model.cfg = dict(cfg, mask_pf=True)
    # mask-only: skip the DF stage, output the ERB-masked spectrum
    # (reference: df/enhance.py:172-175 + checkpoint.py:32 run_df=False)
    mask_only = mask_only or config("MASK_ONLY", False, bool, section="train")
    if mask_only:
        model.cfg = dict(model.cfg, run_df=False)
    suffix = "new"
    if model_base_dir is not None:
        ckpt_dir = os.path.join(model_base_dir, "checkpoints")
        payload = read_cp(ckpt_dir, which=epoch)
        if payload is not None:
            model.params = payload["params"]
            if payload["state"]:
                model.state = payload["state"]
            model.epoch = payload.get("epoch")
            suffix = f"e{model.epoch}"
    p_cfg = model.cfg
    df_state = DfState(
        sr=config("SR", 48000, int, section="DF"),
        fft_size=config("FFT_SIZE", 960, int, section="DF"),
        hop_size=config("HOP_SIZE", 480, int, section="DF"),
        nb_erb=p_cfg["nb_erb"],
        min_nb_erb_freqs=config("MIN_NB_ERB_FREQS", 2, int, section="DF"),
    )
    return model, df_state, suffix


_FEATURE_JIT_CACHE: Dict = {}


def df_features(
    audio: np.ndarray, df_state: DfState, nb_df: int, alpha: Optional[float] = None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute (spec [C,T,F,2], erb_feat [C,T,E], spec_feat [C,T,F',2]).

    Matches df/enhance.py:190-203: streaming-semantics STFT, dB ERB features
    with exponential mean norm, unit-normalized complex features. Runs as
    one jitted program with real-valued boundaries (complex stays interior —
    required on TPU runtimes that cannot materialize complex arrays).
    """
    if alpha is None:
        alpha = get_norm_alpha(df_state.sr, df_state.hop_size,
                               config("NORM_TAU", 1.0, float, section="DF"))
    key = (df_state.sr, df_state.fft_size, df_state.hop_size, df_state.nb_erb,
           df_state.min_nb_erb_freqs, nb_df, alpha)
    if key not in _FEATURE_JIT_CACHE:
        cfg = df_state.stft_cfg
        widths = df_state.erb_widths

        @jax.jit
        def run(audio):
            spec = stft(audio, cfg)  # complex, interior only
            erb = _erb_feat(spec, widths, alpha)
            sf = _spec_feat(spec, nb_df, alpha)
            spec_ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
            sf_ri = jnp.stack([jnp.real(sf), jnp.imag(sf)], axis=-1)
            return spec_ri, erb, sf_ri

        _FEATURE_JIT_CACHE[key] = run
    return _FEATURE_JIT_CACHE[key](jnp.asarray(audio))


def _get_forward_jit(model: DfModel):
    key = "offline_forward"
    if key not in model._jit_cache:
        module, cfg = model.module, model.cfg

        @jax.jit
        def run(params, state, spec, erb_f, spec_f):
            (spec_e, m, lsnr, _), _ = module.forward(
                params, state, cfg, spec, erb_f, spec_f, train=False
            )
            return spec_e, m, lsnr

        model._jit_cache[key] = run
    return model._jit_cache[key]


def _get_pipeline_jit(model: DfModel, df_state: DfState):
    """ONE jitted program for the whole offline path: STFT -> features ->
    forward -> atten-lim mixback -> ISTFT.

    A single executable per enhance() call instead of three (features /
    forward / synthesis) — matters both for XLA fusion across the stage
    boundaries and for per-dispatch transport cost (the axon relay charges
    ~27 ms per host sync; see PERF.md "Dispatch anatomy").
    """
    key = "offline_pipeline"
    if key not in model._jit_cache:
        module, cfg = model.module, model.cfg
        stft_cfg = df_state.stft_cfg
        widths = df_state.erb_widths
        nb_df = cfg["nb_df"]
        alpha = get_norm_alpha(df_state.sr, df_state.hop_size,
                               config("NORM_TAU", 1.0, float, section="DF"))

        @jax.jit
        def run(params, state, audio, lim):
            spec = stft(audio, stft_cfg)  # complex, interior only
            erb_f = _erb_feat(spec, widths, alpha)
            sf = _spec_feat(spec, nb_df, alpha)
            spec_ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
            sf_ri = jnp.stack([jnp.real(sf), jnp.imag(sf)], axis=-1)
            (spec_e_ri, _m, _lsnr, _), _ = module.forward(
                params, state, cfg, spec_ri, erb_f, sf_ri, train=False
            )
            # atten-lim mixback (lim==0 disables: reduces to spec_e)
            spec_e_ri = spec_ri * lim + spec_e_ri * (1.0 - lim)
            return istft_ri(spec_e_ri, stft_cfg)

        model._jit_cache[key] = run
    return model._jit_cache[key]


def enhance(
    model: DfModel,
    df_state: DfState,
    audio: np.ndarray,
    pad: bool = True,
    atten_lim_db: Optional[float] = None,
    backend: str = "offline",
    mesh=None,
) -> np.ndarray:
    """Enhance [C, T] float32 audio; returns the same shape when pad=True.

    Implements the reference's delay compensation (enhance.py:206-250):
    right-pad by n_fft before the STFT, trim [d, orig_len + d] after the
    inverse with d = n_fft - hop.

    backend:
      * "offline": whole-utterance frame-parallel forward as ONE jitted
        program (reference df/enhance.py:206-250 semantics).
      * "scan": route through the per-frame StreamingRuntime scan — the
        measured-fastest path per stream-frame on TPU (PERF.md). Output is
        frame-exact vs "offline" (tests/test_streaming.py); use for large
        batches, where the offline conv activations [B,C,T,F] spill to HBM
        while the scan's working set stays fused.
      * "auto": "scan" for batches >= 16 rows, else "offline".

    mesh: optional jax.sharding.Mesh — batch rows shard over the mesh's
    "data" axis for the scan backend (weights replicated, zero cross-chip
    traffic on the hot path); requires rows % mesh size == 0.
    """
    audio = np.atleast_2d(np.asarray(audio, np.float32))
    orig_len = audio.shape[-1]
    n_fft, hop = df_state.fft_size, df_state.hop_size
    if pad:
        audio = np.pad(audio, ((0, 0), (0, n_fft)))
    # trim to whole hops (streaming analysis consumes whole frames only)
    t_hops = audio.shape[-1] // hop
    audio = audio[..., : t_hops * hop]
    lim = 0.0
    if atten_lim_db is not None and abs(atten_lim_db) > 0:
        lim = 10.0 ** (-abs(atten_lim_db) / 20.0)
    if backend == "auto":
        backend = "scan" if audio.shape[0] >= 16 else "offline"
    if backend == "scan":
        rt = _get_scan_runtime(model, df_state, mesh=mesh)
        carry = rt.init(audio.shape[0])
        _, out = rt.process(carry, jnp.asarray(audio))
        out = np.asarray(out)
        if lim > 0:
            # attenuation-limit mixback (tract.rs:626-629) applied in the
            # time domain: the runtime's spectral mix lim*spec +
            # (1-lim)*spec_e commutes with the (linear) synthesis, and
            # istft(spec) is the input delayed by d = n_fft - hop
            # (perfect-reconstruction window). Doing it here keeps ONE
            # compiled scan runtime for every atten_lim value instead of
            # a per-value recompile. The first d samples (where the
            # zero-initialized overlap makes the identity partial) are
            # exactly the region trimmed below.
            d = n_fft - hop
            delayed = np.zeros_like(out)
            delayed[:, d:] = audio[:, : out.shape[1] - d]
            out = lim * delayed + (1.0 - lim) * out
    elif backend == "offline":
        run = _get_pipeline_jit(model, df_state)
        out = np.asarray(
            run(model.params, model.state, jnp.asarray(audio),
                jnp.float32(lim))
        )
    else:
        raise ValueError(f"unknown backend {backend!r}")
    if pad:
        d = n_fft - hop
        out = out[:, d : orig_len + d]
    return out


def _get_scan_runtime(model: DfModel, df_state: DfState, lim: float = 0.0,
                      mesh=None):
    """One cached scan runtime per model (per mesh); atten_lim is applied
    by the caller as a time-domain mixback (see enhance()), so `lim` no
    longer keys the cache (a per-value jit recompile)."""
    from deepfilternet_tpu.streaming import RuntimeParams, StreamingRuntime

    assert lim == 0.0, "atten_lim is applied outside the runtime now"
    key = "scan_runtime" if mesh is None else ("scan_runtime", id(mesh))
    if key not in model._jit_cache:
        if mesh is None:
            model._jit_cache[key] = StreamingRuntime(
                model, df_state, RuntimeParams(), fuse_ops=True
            )
        else:
            from deepfilternet_tpu.parallel.streams import (
                ShardedStreamingRuntime,
            )

            model._jit_cache[key] = ShardedStreamingRuntime(
                model, df_state, mesh=mesh, fuse_ops=True
            )
    return model._jit_cache[key]


# ---------------------------------------------------------------------------
# CLI (reference: deepFilter console script, enhance.py:299-379)
# ---------------------------------------------------------------------------


DEFAULT_MODEL_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pretrained", "dfn3_fixture_demo",
)


def main(args=None):
    from deepfilternet_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    parser = argparse.ArgumentParser(
        prog="deepFilter", description="Enhance noisy audio with DeepFilterNet-TPU"
    )
    parser.add_argument("noisy_audio_files", nargs="*", help="WAV files to enhance")
    parser.add_argument("--noisy-dir", "-i", default=None,
                        help="Enhance every file in this directory instead of "
                             "listing noisy_audio_files")
    parser.add_argument("--model-base-dir", "-m", default=None,
                        help="Directory with config.ini and checkpoints/")
    parser.add_argument("--output-dir", "-o", default=".")
    parser.add_argument("--pf", action="store_true", help="Enable perceptual post-filter")
    parser.add_argument("--atten-lim", "-a", type=float, default=None,
                        help="Noise attenuation limit in dB")
    parser.add_argument("--no-delay-compensation", "-D", dest="compensate_delay",
                        action="store_false")
    parser.add_argument("--no-suffix", action="store_true")
    parser.add_argument("--no-df-stage", action="store_true",
                        help="Mask-only ablation: skip the deep-filtering "
                             "stage, output the ERB-masked spectrum")
    parser.add_argument("--epoch", "-e", default="best")
    args = parser.parse_args(args)
    if args.noisy_dir is not None:
        if args.noisy_audio_files:
            parser.error("pass either noisy_audio_files or --noisy-dir, not both")
        args.noisy_audio_files = sorted(
            os.path.join(args.noisy_dir, f) for f in os.listdir(args.noisy_dir)
            if os.path.isfile(os.path.join(args.noisy_dir, f))
        )
    if not args.noisy_audio_files:
        parser.error("no input files (pass WAV paths or --noisy-dir)")

    model_dir = args.model_base_dir
    if model_dir is None and os.path.isdir(DEFAULT_MODEL_DIR):
        # the bundled default model (reference: baked-in DFN3 weights,
        # tract.rs:22-92 / maybe_download_model)
        model_dir = DEFAULT_MODEL_DIR
    model, df_state, suffix = init_df(
        model_dir, post_filter=args.pf, epoch=args.epoch,
        mask_only=args.no_df_stage,
    )
    os.makedirs(args.output_dir, exist_ok=True)
    for path in args.noisy_audio_files:
        audio, sr = load_audio(path)
        if sr != df_state.sr:
            audio = resample(audio, sr, df_state.sr)
        t0 = time.time()
        out = enhance(model, df_state, audio, pad=args.compensate_delay,
                      atten_lim_db=args.atten_lim)
        dt = time.time() - t0
        dur = audio.shape[-1] / df_state.sr
        print(f"Enhanced {path} in {dt:.2f}s (RTF: {dt / dur:.4f})")
        if sr != df_state.sr:
            out = resample(out, df_state.sr, sr)
        name = os.path.basename(path)
        if not args.no_suffix:
            stem, ext = os.path.splitext(name)
            name = f"{stem}_DeepFilterNet_TPU{ext}"
        save_audio(os.path.join(args.output_dir, name), out, sr)


if __name__ == "__main__":
    main()
