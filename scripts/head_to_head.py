"""Torch-vs-JAX trainer head-to-head on IDENTICAL fixture batches.

VERDICT r04 item 1(b): drive the reference torch DFN3 trainer
(df/train.py:324-457 semantics: Loss aggregate, clip_grad_norm_(1.0),
AdamW(amsgrad=True), per-iteration cosine lr) and our JAX trainer from the
SAME initial weights (torch init -> proven converter) and the SAME batch
stream (our deterministic DataLoader, identical epoch seeds, one shared
materialization), then compare:

  * per-step loss trajectories (written to pretrained/head_to_head.json),
  * golden-asset STOI / SI-SDR of both trained models, the torch-trained
    model evaluated through our inference stack via the proven converter.

Run on CPU so both sides compute in f32 (the chip's bf16 matmuls would
confound trainer parity with precision):

    JAX_PLATFORMS=cpu python -m scripts.head_to_head [steps] [batch] [len_s]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


LOSS_CFG = [
    # the fixture-demo stack (pretrained/README.md recipe) + the TD path
    ("SpectralLoss", "factor_magnitude", "100"),
    ("SpectralLoss", "factor_complex", "100"),
    ("SpectralLoss", "gamma", "0.6"),
    ("MaskLoss", "factor", "1"),
    ("LocalSnrLoss", "factor", "0.0005"),
    ("MultiResSpecLoss", "factor", "500"),
    ("MultiResSpecLoss", "factor_complex", "500"),
    ("MultiResSpecLoss", "gamma", "0.6"),
]
LR = 3e-4
WD = 0.05


def build_batches(n_steps: int, batch_size: int, len_s: float):
    """Materialize a deterministic batch stream from the fixture corpus,
    padded to one global frame count (single jit signature)."""
    from deepfilternet_tpu.data.dataloader import DataLoader
    from deepfilternet_tpu.data.dataset import FdDataset, Hdf5Cfg, TdDataset
    from deepfilternet_tpu.train.run import batch_to_arrays

    td = TdDataset(
        "/root/reference/assets",
        [Hdf5Cfg("clean.hdf5", 16), Hdf5Cfg("noise_flac.hdf5", 1)],
        "train", max_len_s=len_s, seed=1,
    )
    fd = FdDataset(td)
    dl = DataLoader(fd, batch_size=batch_size, num_workers=6, drop_last=True)
    batches, tds, epoch = [], [], 0
    while len(batches) < n_steps:
        for b in dl.iter_epoch("train", epoch):
            batches.append(batch_to_arrays(b))
            tds.append((b.speech[:, 0], b.noisy[:, 0]))
            if len(batches) >= n_steps:
                break
        epoch += 1
    tmax = max(a["noisy"].shape[1] for a in batches)
    out = []
    for a in batches:
        t = a["noisy"].shape[1]
        out.append({
            k: np.pad(v, [(0, 0), (0, tmax - t)] + [(0, 0)] * (v.ndim - 2))
            for k, v in a.items()
        })
    return out, tds


def torch_step_fn(model, loss_mod, opt):
    import torch

    def step(arrays, lr):
        for group in opt.param_groups:
            group["lr"] = lr
        opt.zero_grad()
        spec = torch.from_numpy(arrays["noisy"])[:, None]
        erb = torch.from_numpy(arrays["feat_erb"])[:, None]
        fspec = torch.from_numpy(arrays["feat_spec"])[:, None]
        clean = torch.from_numpy(arrays["clean"])[:, None]
        enh, m, lsnr, _ = model(spec, erb, fspec)
        err = loss_mod(
            clean=clean, noisy=spec, enhanced=enh, mask=m, lsnr=lsnr,
            snrs=torch.zeros(spec.shape[0]),
        )
        err.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        return float(err.detach())

    return step


def golden_eval(params, state, cfg, label):
    """STOI/SI-SDR of a DFN3 parameter set on the golden asset through our
    inference stack (scripts/test_df.py semantics)."""
    from deepfilternet_tpu.enhance import DfModel, DfState, enhance
    from deepfilternet_tpu.eval.evaluation import compute_metrics
    from deepfilternet_tpu.models import dfnet3
    from deepfilternet_tpu.utils.audio_io import load_audio

    model = DfModel(params=params, state=state, cfg=cfg, module=dfnet3)
    df_state = DfState(nb_erb=cfg["nb_erb"], min_nb_erb_freqs=2)
    noisy, _ = load_audio("/root/reference/assets/noisy_snr0.wav", 48000)
    clean, _ = load_audio(
        "/root/reference/assets/clean_freesound_33711.wav", 48000)
    enh = enhance(model, df_state, noisy)
    n = min(clean.shape[-1], enh.shape[-1])
    m = compute_metrics(clean[0, :n], enh[0, :n], 48000, ("stoi", "sisdr"))
    print(f"golden [{label}]: stoi={m['stoi']:.4f} sisdr={m['sisdr']:.2f} dB",
          flush=True)
    return m


def main(n_steps: int = 2000, batch_size: int = 4, len_s: float = 2.0):
    import jax

    if jax.default_backend() != "cpu":
        print(f"NOTE: running on {jax.default_backend()}; f32 parity "
              "expects JAX_PLATFORMS=cpu", flush=True)
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests._torch_ref import load_reference_df

    ref_config = load_reference_df()
    import df.deepfilternet3 as ref_dfn3
    import df.loss as ref_loss
    from df.model import ModelParams

    import deepfilternet_tpu.libdf_compat as libdf
    from deepfilternet_tpu.checkpoint import convert_dfn3_state_dict
    from deepfilternet_tpu.config import config
    from deepfilternet_tpu.models import dfnet3
    from deepfilternet_tpu.ops import Stft, erb_widths
    from deepfilternet_tpu.ops.stft import vorbis_window
    from deepfilternet_tpu.train.loss import Loss
    from deepfilternet_tpu.train.lr import cosine_scheduler
    from deepfilternet_tpu.train.trainer import (
        init_train_state, make_optimizer, make_train_step,
    )

    config.reset()
    for sec, k, v in LOSS_CFG:
        config.set(k, v, section=sec)
        ref_config.set(k, v, str, sec)
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)

    p = ModelParams()
    df_state = libdf.DF(sr=p.sr, fft_size=p.fft_size, hop_size=p.hop_size,
                        nb_bands=p.nb_erb, min_nb_erb_freqs=p.min_nb_freqs)

    # --- identical initial weights ---
    t_model = ref_dfn3.init_model(df_state)
    t_model.train()
    _, _, cfg = dfnet3.init_dfnet3(jax.random.PRNGKey(0))
    params, state = convert_dfn3_state_dict(t_model.state_dict())

    # --- identical data ---
    t0 = time.time()
    batches, _ = build_batches(n_steps, batch_size, len_s)
    print(f"materialized {len(batches)} batches in {time.time()-t0:.0f}s "
          f"(T={batches[0]['noisy'].shape[1]} frames)", flush=True)

    # --- losses ---
    widths = erb_widths(p.sr, p.fft_size, p.nb_erb, p.min_nb_freqs)
    stft_cfg = Stft(p.sr, p.fft_size, p.hop_size)
    j_loss = Loss(stft_cfg, widths, p.nb_df, (p.lsnr_min, p.lsnr_max))
    istft_mod = ref_loss.Istft(
        p.fft_size, p.hop_size, torch.from_numpy(vorbis_window(p.fft_size).copy()))
    t_loss = ref_loss.Loss(df_state, istft_mod)

    # --- optimizers + schedule ---
    lr_sched = cosine_scheduler(LR, 1e-6, epochs=1, niter_per_ep=n_steps,
                                warmup_epochs=0)
    opt_cfg = dict(lr=LR, weight_decay=WD, optimizer="adamw",
                   betas=(0.9, 0.999), amsgrad=True)
    optimizer = make_optimizer(opt_cfg)
    step_fn = jax.jit(make_train_step(dfnet3, cfg, j_loss, optimizer))
    ts = init_train_state(params, state, optimizer)
    t_opt = torch.optim.AdamW(t_model.parameters(), lr=LR, weight_decay=WD,
                              amsgrad=True)
    t_step = torch_step_fn(t_model, t_loss, t_opt)

    losses_j, losses_t = [], []
    t0 = time.time()
    for i, arrays in enumerate(batches):
        lr = float(lr_sched[min(i, len(lr_sched) - 1)])
        j_arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
        ts, metrics = step_fn(ts, j_arrays, jnp.asarray(lr, jnp.float32),
                              jnp.asarray(WD, jnp.float32))
        losses_j.append(float(metrics["loss"]))
        losses_t.append(t_step(arrays, lr))
        if i < 5 or (i + 1) % 50 == 0:
            dt = time.time() - t0
            print(f"step {i+1}/{len(batches)}: jax={losses_j[-1]:.4f} "
                  f"torch={losses_t[-1]:.4f} "
                  f"rel={abs(losses_j[-1]-losses_t[-1])/losses_t[-1]:.2e} "
                  f"({dt/(i+1):.2f}s/step)", flush=True)
        if (i + 1) % 200 == 0:  # partial progress survives interruption
            with open("/tmp/h2h_partial.json", "w") as f:
                json.dump({"losses_jax": losses_j, "losses_torch": losses_t}, f)

    lj, lt = np.asarray(losses_j), np.asarray(losses_t)
    w = max(min(50, len(lj) // 4), 1)
    smooth = lambda x: np.convolve(x, np.ones(w) / w, "valid")  # noqa: E731
    sj, st = smooth(lj), smooth(lt)
    summary = {
        "steps": len(lj),
        "batch_size": batch_size,
        "len_s": len_s,
        "lr": LR,
        "step0_rel_diff": float(abs(lj[0] - lt[0]) / lt[0]),
        "first10_max_rel_diff": float(np.max(np.abs(lj[:10] - lt[:10]) / lt[:10])),
        "smoothed_max_rel_diff": float(np.max(np.abs(sj - st) / st)),
        "final_smoothed_jax": float(sj[-1]),
        "final_smoothed_torch": float(st[-1]),
        "losses_jax": losses_j,
        "losses_torch": losses_t,
    }

    # --- converter proof on the TRAINED torch weights ---
    t_model.eval()
    params_t, state_t = convert_dfn3_state_dict(t_model.state_dict())
    summary["golden_jax_trained"] = golden_eval(
        ts.params, ts.model_state, cfg, "jax-trained")
    summary["golden_torch_trained"] = golden_eval(
        params_t, state_t, cfg, "torch-trained (via converter)")

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "pretrained", "head_to_head.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if not k.startswith("losses")}, indent=1), flush=True)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 2000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 4,
        float(sys.argv[3]) if len(sys.argv) > 3 else 2.0,
    )
