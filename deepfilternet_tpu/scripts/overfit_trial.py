"""On-device overfit validation: train DFN3 on the bundled fixtures.

Validation tool proving the full train->inference stack on real hardware:
data engine -> features -> model -> loss stack -> AdamW -> enhancement.
Resumable via its checkpoint dir; run repeatedly to accumulate steps.

Measured on one TPU v5e (2026-08-16, this repo @ round 1):
    8,848 steps in 450 s (~20 steps/s incl. host data gen),
    loss 1.358 -> 0.016, training-set SI-SDR 11.9 dB -> 22.5 dB.

Usage: python -m deepfilternet_tpu.scripts.overfit_trial [seconds] [ckpt_dir]
"""

import os, sys, time, numpy as np
import jax, jax.numpy as jnp
from deepfilternet_tpu.config import config
config.reset()
config.set("factor_magnitude", "100", section="SpectralLoss")
config.set("factor_complex", "100", section="SpectralLoss")
config.set("gamma", "0.6", section="SpectralLoss")
config.set("factor", "1", section="MaskLoss")
config.set("factor", "0.0005", section="LocalSnrLoss")

from deepfilternet_tpu.data.dataset import Hdf5Cfg, TdDataset, FdDataset
from deepfilternet_tpu.data.dataloader import DataLoader
from deepfilternet_tpu.models import dfnet3
from deepfilternet_tpu.ops import Stft, erb_widths
from deepfilternet_tpu.ops.stft import istft_ri
from deepfilternet_tpu.train.loss import Loss
from deepfilternet_tpu.train.trainer import init_train_state, make_optimizer, make_train_step
from deepfilternet_tpu.train.run import batch_to_arrays
from deepfilternet_tpu.checkpoint import read_cp, write_cp
from deepfilternet_tpu.eval.evaluation import si_sdr_np

BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 400.0
CKPT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dfn3_trial_ckpt"

cfgs = [Hdf5Cfg("clean.hdf5", 16), Hdf5Cfg("noise_flac.hdf5", 1)]
td = TdDataset("/root/reference/assets", cfgs, "train", max_len_s=3.0, seed=1)
fd = FdDataset(td)
dl = DataLoader(fd, batch_size=8, num_workers=6, overfit=True, drop_last=True)

params, state, cfg = dfnet3.init_dfnet3(jax.random.PRNGKey(0))
loss_obj = Loss(Stft(48000,960,480), erb_widths(48000,960,32,2), 96, (-15,35))
opt = make_optimizer()
step = jax.jit(make_train_step(dfnet3, cfg, loss_obj, opt))
ts = init_train_state(params, state, opt)
payload = read_cp(CKPT, "latest")
step0 = 0
if payload is not None:
    ts = ts._replace(params=payload["params"], model_state=payload["state"])
    if "opt_state" in payload:
        import jax as _j
        ts = ts._replace(opt_state=_j.tree.map(jnp.asarray, payload["opt_state"]))
    step0 = payload["epoch"]
    print(f"resumed from step {step0}")

lr = jnp.asarray(3e-4); wd = jnp.asarray(0.05)
# pre-generate a fixed pool of batches (overfit) to avoid regen cost
pool = list(dl.iter_epoch("train", 0))
arr_pool = [{k: jnp.asarray(v) for k, v in batch_to_arrays(b).items()} for b in pool]
t0 = time.time()
losses = []
n = step0
while time.time() - t0 < BUDGET:
    for arrays in arr_pool:
        ts, m = step(ts, arrays, lr, wd)
        losses.append(float(m["loss"])); n += 1
write_cp(CKPT, ts.params, ts.model_state, n, opt_state=ts.opt_state, keep_n=1)
print(f"steps {step0}->{n}, loss {np.mean(losses[:3]):.3f} -> {np.mean(losses[-3:]):.3f}")

@jax.jit
def infer(params, state, noisy, fe, fs):
    (spec_e, mm, lsnr, _), _ = dfnet3.forward(params, state, cfg, noisy, fe, fs)
    return istft_ri(spec_e, Stft(48000,960,480))
batch = pool[0]; arrays = arr_pool[0]
enh = np.asarray(infer(ts.params, ts.model_state, arrays["noisy"], arrays["feat_erb"], arrays["feat_spec"]))
se, sn = [], []
for i in range(enh.shape[0]):
    T = min(enh.shape[-1], batch.speech.shape[-1])
    d = 480  # synthesis delay
    se.append(si_sdr_np(enh[i,d:T], batch.speech[i,0,:T-d]))
    sn.append(si_sdr_np(batch.noisy[i,0,:T], batch.speech[i,0,:T]))
print(f"si_sdr noisy={np.mean(sn):.2f} dB -> enhanced={np.mean(se):.2f} dB")
