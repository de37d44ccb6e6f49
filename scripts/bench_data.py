"""Data-engine throughput benchmark (VERDICT r04 #2).

The reference's rayon data engine (libDF/src/dataloader.rs:60-482) is
perf-critical infrastructure; this measures whether our Python
process-pool + C++-decoder rebuild keeps a chip fed. Two experiments:

  1. loader throughput — TdDataset+FdDataset samples/s over the fixture
     corpus under REFERENCE-DEFAULT augmentation probabilities
     (p_reverb=0.2 per df/train.py:153; DF_P_* knobs at their dataset.rs
     defaults), swept over worker counts {1,2,4,8}.
  2. train starvation — the real DFN3 train step on the CHIP consuming
     batches streamed from the live DataLoader (no pre-pooling): per-step
     wall time split into data-wait (next(batch) + pad + H2D) vs step
     dispatch, and the % of wall-time the chip is data-blocked.

Writes bench_data.json at the repo root. Experiment 2 needs the chip;
run with BENCH_DATA_SKIP_TRAIN=1 to do the loader sweep CPU-only.

Usage: python scripts/bench_data.py [--workers 1,2,4,8] [--epochs 2]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS = "/root/reference/assets"


def build_loader(batch_size: int, num_workers: int, max_len_s: float = 5.0):
    from deepfilternet_tpu.data.dataloader import DataLoader
    from deepfilternet_tpu.data.dataset import FdDataset, Hdf5Cfg, TdDataset

    td = TdDataset(
        ASSETS,
        [Hdf5Cfg("clean.hdf5", 32), Hdf5Cfg("noise_flac.hdf5", 1)],
        "train",
        max_len_s=max_len_s,
        snrs=(-5, 0, 5, 10, 20, 40),
        seed=1,
        p_reverb=0.2,  # reference default, df/train.py:153
        p_interfer_sp=0.05,
    )
    fd = FdDataset(td)
    return DataLoader(fd, batch_size=batch_size, num_workers=num_workers,
                      drop_last=True)


def loader_throughput(workers, epochs: int, batch_size: int = 16):
    """Samples/s at steady state per worker count."""
    rows = {}
    for nw in workers:
        dl = build_loader(batch_size, nw)
        # warm epoch 0 (hdf5 key cache, codec buffers) then time epochs 1..N
        n_warm = 0
        for b in dl.iter_epoch("train", 0):
            n_warm += b.speech.shape[0]
        t0 = time.perf_counter()
        n = 0
        for ep in range(1, 1 + epochs):
            for b in dl.iter_epoch("train", ep):
                n += b.speech.shape[0]
        dt = time.perf_counter() - t0
        rows[str(nw)] = {
            "samples_per_s": round(n / dt, 1),
            "batches_per_s": round(n / batch_size / dt, 2),
            "samples": n,
            "wall_s": round(dt, 2),
        }
        print(f"workers={nw}: {rows[str(nw)]}", flush=True)
    return rows


def train_starvation(batch_sizes, steps: int = 60, max_len_s: float = 3.0):
    """% of train wall-time blocked on data, on the real device.

    Streams batches straight from the live DataLoader into the jitted
    train step. Batches are padded to one fixed frame count so there is
    exactly one jit signature (shape churn would measure the compiler,
    not the loader). Data-wait per step = time spent in next()+pad+H2D
    while the device is idle; because dispatch is async, the device is
    only truly idle when data-wait exceeds the device step time, so we
    also report the honest overlap-adjusted starvation:
        starved_ms = max(0, data_ms - step_device_ms) per step.
    """
    import jax
    import jax.numpy as jnp

    from deepfilternet_tpu.config import config
    from deepfilternet_tpu.models import init_model, model_module
    from deepfilternet_tpu.ops import Stft, erb_widths
    from deepfilternet_tpu.train.loss import Loss
    from deepfilternet_tpu.train.run import batch_to_arrays
    from deepfilternet_tpu.train.trainer import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    config.reset()
    for sec, k, v in (("SpectralLoss", "factor_magnitude", "100"),
                      ("SpectralLoss", "factor_complex", "100"),
                      ("SpectralLoss", "gamma", "0.6"),
                      ("MaskLoss", "factor", "1"),
                      ("LocalSnrLoss", "factor", "0.0005")):
        config.set(k, v, section=sec)

    params, state, cfg, module = init_model()
    _, _, mp_cls = model_module()
    p = mp_cls()
    loss_obj = Loss(Stft(p.sr, p.fft_size, p.hop_size),
                    erb_widths(p.sr, p.fft_size, p.nb_erb, p.min_nb_freqs),
                    p.nb_df, (p.lsnr_min, p.lsnr_max))
    opt = make_optimizer()
    step = jax.jit(make_train_step(module, cfg, loss_obj, opt))
    lr_a, wd_a = jnp.asarray(3e-4), jnp.asarray(0.05)

    pad_t = int(max_len_s * 100) + 3  # frames at 10 ms hop, + lookahead pad

    def to_padded_arrays(batch):
        a = batch_to_arrays(batch)
        t = a["noisy"].shape[1]
        assert t <= pad_t, (t, pad_t)
        return {k: jnp.asarray(np.pad(v, [(0, 0), (0, pad_t - t)]
                                      + [(0, 0)] * (v.ndim - 2)))
                for k, v in a.items()}

    rows = {}
    for bs in batch_sizes:
        dl = build_loader(bs, num_workers=6, max_len_s=max_len_s)
        ts = init_train_state(params, state, opt)

        def batches():
            ep = 0
            while True:
                for b in dl.iter_epoch("train", ep):
                    yield b
                ep += 1

        it = batches()
        # compile once
        arrays = to_padded_arrays(next(it))
        ts, m = step(ts, arrays, lr_a, wd_a)
        jax.block_until_ready(m["loss"])

        data_ms, step_ms, starved_ms = [], [], []
        t_all0 = time.perf_counter()
        for _ in range(steps):
            t0 = time.perf_counter()
            arrays = to_padded_arrays(next(it))
            t1 = time.perf_counter()
            ts, m = step(ts, arrays, lr_a, wd_a)
            jax.block_until_ready(m["loss"])
            t2 = time.perf_counter()
            data_ms.append((t1 - t0) * 1e3)
            step_ms.append((t2 - t1) * 1e3)
            starved_ms.append(max(0.0, (t1 - t0) * 1e3 - (t2 - t1) * 1e3))
        wall = time.perf_counter() - t_all0
        row = {
            "data_wait_ms_p50": round(float(np.median(data_ms)), 1),
            "step_ms_p50": round(float(np.median(step_ms)), 1),
            "data_blocked_pct": round(100.0 * sum(data_ms)
                                      / (sum(data_ms) + sum(step_ms)), 1),
            "starved_pct_overlap_adj": round(
                100.0 * sum(starved_ms) / (wall * 1e3), 1),
            "steps_per_s": round(steps / wall, 2),
            "steps": steps,
        }
        rows[str(bs)] = row
        print(f"batch={bs}: {row}", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", default="1,2,4,8")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--steps", type=int, default=60)
    args = ap.parse_args()

    out = {"assets": ASSETS, "p_reverb": 0.2, "p_interfer_sp": 0.05,
           "host_cpus": os.cpu_count()}
    out["loader"] = loader_throughput(
        [int(x) for x in args.workers.split(",")], args.epochs)

    if not os.environ.get("BENCH_DATA_SKIP_TRAIN"):
        import jax
        out["device"] = str(jax.devices()[0])
        out["train"] = train_starvation(
            [int(x) for x in args.batches.split(",")], args.steps)

    with open(os.path.join(REPO, "bench_data.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote bench_data.json", flush=True)


if __name__ == "__main__":
    main()
