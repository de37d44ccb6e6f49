"""Golden-metric regression harness (reference: df/scripts/test_df.py).

Enhances assets/noisy_snr0.wav with each configured model and asserts
STOI / SI-SDR / SNRseg against golden values stored in a JSON next to the
model dir (the reference hard-codes goldens for its released checkpoints;
without network access to those weights, goldens are generated from your
own trained checkpoints with --update-golden and asserted thereafter at
atol/rtol 1e-4).

Usage:
    python -m deepfilternet_tpu.scripts.test_df MODEL_DIR [...] \
        [--noisy wav] [--clean wav] [--update-golden] [--rtol 1e-4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict

import numpy as np

DEFAULT_NOISY = "/root/reference/assets/noisy_snr0.wav"
DEFAULT_CLEAN = "/root/reference/assets/clean_freesound_33711.wav"
METRICS = ("stoi", "sisdr", "snrseg", "composite")


def eval_model(model_dir: str, noisy_path: str, clean_path: str) -> Dict[str, float]:
    from deepfilternet_tpu.enhance import enhance, init_df
    from deepfilternet_tpu.eval.evaluation import compute_metrics
    from deepfilternet_tpu.utils.audio_io import load_audio, resample

    model, df_state, suffix = init_df(model_dir)
    noisy, sr = load_audio(noisy_path)
    if sr != df_state.sr:
        noisy = resample(noisy, sr, df_state.sr)
    clean, csr = load_audio(clean_path)
    if csr != df_state.sr:
        clean = resample(clean, csr, df_state.sr)
    enhanced = enhance(model, df_state, noisy)
    n = min(clean.shape[-1], enhanced.shape[-1])
    return compute_metrics(clean[0, :n], enhanced[0, :n], df_state.sr, METRICS)


def main(argv=None):
    from deepfilternet_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    parser = argparse.ArgumentParser(description="Golden metric regression")
    parser.add_argument("model_dirs", nargs="+")
    parser.add_argument("--noisy", default=DEFAULT_NOISY)
    parser.add_argument("--clean", default=DEFAULT_CLEAN)
    parser.add_argument("--update-golden", action="store_true")
    parser.add_argument("--rtol", type=float, default=1e-4)
    parser.add_argument("--atol", type=float, default=1e-4)
    args = parser.parse_args(argv)

    failed = False
    for model_dir in args.model_dirs:
        golden_path = os.path.join(model_dir, "golden_metrics.json")
        got = eval_model(model_dir, args.noisy, args.clean)
        print(f"{model_dir}: " + " ".join(f"{k}={v:.5f}" for k, v in got.items()))
        if args.update_golden:
            payload = dict(got)
            payload["_pesq_scale"] = (
                "local from-spec calibration (eval/pesq.py, multi-family "
                "anchors) — NOT comparable to ITU P.862 values such as the "
                "reference's committed goldens"
            )
            with open(golden_path, "w") as f:
                json.dump(payload, f, indent=2)
            print(f"  wrote {golden_path}")
            continue
        if not os.path.isfile(golden_path):
            print(f"  WARNING: no golden file at {golden_path}; run with "
                  "--update-golden first")
            continue
        golden = json.load(open(golden_path))
        for k, v in golden.items():
            if k.startswith("_"):
                continue
            if k in got and not np.isclose(got[k], v, rtol=args.rtol, atol=args.atol):
                print(f"  FAIL {k}: got {got[k]:.6f}, golden {v:.6f}")
                failed = True
            else:
                print(f"  ok  {k}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
