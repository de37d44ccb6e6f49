"""Train a bundled fixture-demo model (any generation) on the in-repo assets.

The reference CI pins golden metrics for its *released* checkpoints
(df/scripts/test_df.py:44-78); without network access to those weights,
this repo ships small fixture-trained demo checkpoints per generation
under pretrained/<name>_fixture_demo and regenerates its own goldens via
scripts.test_df. This driver (re)trains one such demo model:

    python -m deepfilternet_tpu.scripts.train_demo MODEL_DIR [seconds]

MODEL_DIR must contain a config.ini selecting the model + losses; the
best checkpoint is written to MODEL_DIR/checkpoints. Training data is the
reference's asset fixtures (clean.hdf5 + noise_flac.hdf5) in overfit mode
— a validation of the full train->inference stack, not a real corpus.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from deepfilternet_tpu.checkpoint import read_cp, write_cp
from deepfilternet_tpu.config import config


def main(model_dir: str, budget_s: float = 600.0, lr: float = 3e-4) -> None:
    from deepfilternet_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    config.reset()
    ini = os.path.join(model_dir, "config.ini")
    if os.path.isfile(ini):
        config.load(ini)
    # fixture-demo loss stack (reference train defaults)
    for sec, k, v in (
        ("SpectralLoss", "factor_magnitude", "100"),
        ("SpectralLoss", "factor_complex", "100"),
        ("SpectralLoss", "gamma", "0.6"),
        ("MaskLoss", "factor", "1"),
        ("LocalSnrLoss", "factor", "0.0005"),
    ):
        if not config.obj.parser.has_option(sec, k):
            config.set(k, v, section=sec)

    from deepfilternet_tpu.data.dataloader import DataLoader
    from deepfilternet_tpu.data.dataset import FdDataset, Hdf5Cfg, TdDataset
    from deepfilternet_tpu.eval.evaluation import si_sdr_np
    from deepfilternet_tpu.models import init_model, model_module
    from deepfilternet_tpu.ops import Stft, erb_widths
    from deepfilternet_tpu.ops.stft import istft_ri
    from deepfilternet_tpu.train.loss import Loss
    from deepfilternet_tpu.train.run import batch_to_arrays
    from deepfilternet_tpu.train.trainer import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    params, state, cfg, module = init_model()
    _, _, mp_cls = model_module()
    p = mp_cls()
    # MASK_ONLY / DF_ONLY training modes (df/train.py:123-130, 486-494)
    mask_only = config("MASK_ONLY", False, bool, section="train")
    df_only = config("DF_ONLY", False, bool, section="train")
    if mask_only:
        cfg = dict(cfg, run_df=False)

    # data-recipe knobs (see pretrained/README.md): the fixture corpus is
    # tiny, so generalization to the golden asset is driven by mix
    # diversity — crop length, SNR emphasis, and the augmentation stack
    # (DF_P_* env vars, reference dataset.rs:644-730 semantics)
    max_len_s = float(os.environ.get("DEMO_MAX_LEN_S", "3.0"))
    snrs = tuple(
        int(s) for s in os.environ.get("DEMO_SNRS", "-5,0,5,10,20,40").split(",")
    )
    batch_size = int(os.environ.get("DEMO_BATCH", "8"))
    cfgs = [Hdf5Cfg("clean.hdf5", 16), Hdf5Cfg("noise_flac.hdf5", 1)]
    # DEMO_EXTRA_CLEAN="fname:factor" appends another speech pool (e.g. a
    # VTLP pseudo-speaker pool from scripts/make_vtlp_pool.py — the
    # curriculum data-ceiling experiment, VERDICT r05 #5); DEMO_ASSETS
    # overrides the data dir (symlink the reference assets next to the
    # generated pool).
    extra_clean = os.environ.get("DEMO_EXTRA_CLEAN")
    if extra_clean:
        fn, fac = extra_clean.rsplit(":", 1)
        cfgs.insert(1, Hdf5Cfg(fn, float(fac)))
    assets_dir = os.environ.get("DEMO_ASSETS", "/root/reference/assets")
    td = TdDataset(assets_dir, cfgs, "train",
                   max_len_s=max_len_s, snrs=snrs, seed=1,
                   p_reverb=float(os.environ.get("DEMO_P_REVERB", "0")),
                   p_interfer_sp=float(os.environ.get("DEMO_P_INTERFER", "0")))
    fd = FdDataset(td)
    dl = DataLoader(fd, batch_size=batch_size, num_workers=6, drop_last=True)

    loss_obj = Loss(
        Stft(p.sr, p.fft_size, p.hop_size),
        erb_widths(p.sr, p.fft_size, p.nb_erb, p.min_nb_freqs),
        p.nb_df,
        (p.lsnr_min, p.lsnr_max),
    )
    opt = make_optimizer()
    from deepfilternet_tpu.train.trainer import trainable_filter

    step = jax.jit(make_train_step(module, cfg, loss_obj, opt,
                                   trainable=trainable_filter(mask_only, df_only)))
    ts = init_train_state(params, state, opt)

    ckpt_dir = os.path.join(model_dir, "checkpoints")
    step0 = 0
    payload = read_cp(ckpt_dir, "latest")
    if payload is not None:
        try:
            chex_ok = jax.tree.all(
                jax.tree.map(lambda a, b: a.shape == b.shape,
                             payload["params"], ts.params)
            )
        except ValueError:
            chex_ok = False
        if chex_ok:
            ts = ts._replace(params=payload["params"], model_state=payload["state"])
            if "opt_state" in payload:
                # a checkpoint written under a different optimizer build
                # (e.g. pre/post the torch-exact AdamW rework) has a
                # different opt_state pytree; restoring it would crash at
                # the first update. Warm-start params only in that case.
                restored = jax.tree.map(jnp.asarray, payload["opt_state"])
                if (jax.tree.structure(restored)
                        == jax.tree.structure(ts.opt_state)):
                    ts = ts._replace(opt_state=restored)
                else:
                    print("checkpoint opt_state does not match the current "
                          "optimizer; restarting optimizer state "
                          "(params warm-started)")
            step0 = payload["epoch"]
            print(f"resumed from step {step0}")
        else:
            print("checkpoint incompatible with current architecture; "
                  "training from scratch")

    lr_a = jnp.asarray(lr)
    wd_a = jnp.asarray(0.05)
    # fixture corpus is tiny; cycle over several *distinct* epoch pools
    # (fresh SNR/gain/augmentation/noise draws per epoch seed) so the demo
    # model generalizes to the golden asset instead of memorizing one mix
    n_pools = int(os.environ.get("DEMO_POOLS", "12"))
    # DEMO_POOL_OFFSET shifts the epoch-seed window: successive driver
    # rounds can train on *fresh* mix draws (new SNR/gain/noise/crop/
    # augmentation realizations) instead of re-cycling the same pools —
    # the fixture corpus's substitute for a large training set
    offset = int(os.environ.get("DEMO_POOL_OFFSET", "0"))
    t_pool = time.time()
    pool = list(dl.iter_epoch("train", offset))
    raw = []
    for ep in range(offset, offset + n_pools):
        for b in (pool if ep == offset else dl.iter_epoch("train", ep)):
            raw.append(batch_to_arrays(b))
    print(f"pool: {len(raw)} batches from {n_pools} epochs "
          f"in {time.time() - t_pool:.0f}s", flush=True)
    # pad every batch to one global [B, T, ...] shape: a single jit
    # signature for the train step (shape churn = minutes of recompiles)
    tmax = max(a["noisy"].shape[1] for a in raw)
    # DEMO_PAD_FRAMES pins the padded STFT-frame count (dim 1 of the
    # spectral arrays, ~100 frames/s — NOT samples) across rounds so the
    # persistent compilation cache (JAX_COMPILATION_CACHE_DIR) hits
    pad_frames = int(os.environ.get("DEMO_PAD_FRAMES", "0"))
    if pad_frames > 10 * tmax and not os.environ.get("DEMO_PAD_FRAMES_FORCE"):
        # loud heuristic guard: a sample count passed here pads ~GB per
        # batch. Legitimate large pinned pads (small debug pools) can set
        # DEMO_PAD_FRAMES_FORCE=1 to proceed.
        raise SystemExit(
            f"DEMO_PAD_FRAMES={pad_frames} is frames (got tmax={tmax}); "
            "passing a sample count here pads ~GB per batch "
            "(set DEMO_PAD_FRAMES_FORCE=1 to override)")
    if pad_frames:
        assert pad_frames >= tmax, (pad_frames, tmax)
        tmax = pad_frames
    t_h2d = time.time()
    arr_pool = []
    for a in raw:
        t = a["noisy"].shape[1]
        arr_pool.append({
            k: jnp.asarray(np.pad(v, [(0, 0), (0, tmax - t)]
                                  + [(0, 0)] * (v.ndim - 2)))
            for k, v in a.items()
        })
    jax.block_until_ready(arr_pool[-1])
    print(f"pad to {tmax} frames + H2D: {time.time() - t_h2d:.0f}s",
          flush=True)
    t0 = time.time()
    losses = []
    n = step0
    best = (float("inf"), ts, n)  # (avg loss, state, step)
    window = max(len(arr_pool), 8)
    t_rep = t0
    while time.time() - t0 < budget_s:
        for arrays in arr_pool:
            ts, m = step(ts, arrays, lr_a, wd_a)
            losses.append(float(m["loss"]))
            n += 1
            if n - step0 == 1:
                print(f"compile+step1: {time.time() - t0:.0f}s", flush=True)
            elif time.time() - t_rep > 60:
                t_rep = time.time()
                rate = (n - step0) / (t_rep - t0)
                print(f"step {n}: loss(avg {min(len(losses), window)}) "
                      f"{np.mean(losses[-window:]):.4f}  {rate:.1f} steps/s",
                      flush=True)
        if len(losses) >= window:
            avg = float(np.mean(losses[-window:]))
            if avg < best[0]:
                best = (avg, ts, n)
    if best[1] is not ts:
        print(f"final avg loss {np.mean(losses[-window:]):.4f} > best "
              f"{best[0]:.4f} at step {best[2]}; keeping best")
    _, ts_b, n_b = best
    write_cp(ckpt_dir, ts_b.params, ts_b.model_state, n_b,
             opt_state=ts_b.opt_state, keep_n=1, is_best=True)
    ts = ts_b
    print(f"steps {step0}->{n} (kept {n_b}), loss {np.mean(losses[:3]):.4f} "
          f"-> {best[0]:.4f}")

    stft_cfg = Stft(p.sr, p.fft_size, p.hop_size)

    @jax.jit
    def infer(params_, state_, noisy, fe, fs):
        (spec_e, _, _, _), _ = module.forward(params_, state_, cfg, noisy, fe, fs)
        return istft_ri(spec_e, stft_cfg)

    batch = pool[0]
    arrays = arr_pool[0]
    enh = np.asarray(infer(ts.params, ts.model_state, arrays["noisy"],
                           arrays["feat_erb"], arrays["feat_spec"]))
    se, sn = [], []
    d = p.fft_size - p.hop_size
    for i in range(enh.shape[0]):
        T = min(enh.shape[-1], batch.speech.shape[-1])
        se.append(si_sdr_np(enh[i, d:T], batch.speech[i, 0, : T - d]))
        sn.append(si_sdr_np(batch.noisy[i, 0, :T], batch.speech[i, 0, :T]))
    print(f"train-set si_sdr noisy={np.mean(sn):.2f} dB -> "
          f"enhanced={np.mean(se):.2f} dB")


if __name__ == "__main__":
    main(
        sys.argv[1],
        float(sys.argv[2]) if len(sys.argv) > 2 else 600.0,
        float(sys.argv[3]) if len(sys.argv) > 3 else 3e-4,
    )
