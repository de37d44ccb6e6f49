"""Grow a clean speech pool with VTLP-synthesized "new speakers".

VERDICT r05 #5 curriculum variant of the data-ceiling experiment: r04
applied heavy random augmentation to the WHOLE training distribution
(shifting it away from the clean golden eval); this instead grows the
CLEAN pool with deterministic vocal-tract-length-perturbed copies — each
warp factor is a consistent pseudo-speaker identity — while the mixing
pipeline and the golden eval stay clean.

    python scripts/make_vtlp_pool.py SRC.hdf5 OUT.hdf5 [--alphas 0.9,0.95,1.05,1.1]

Writes a PCM int16 HDF5 with key <orig>_vtlp<alpha> per (key, alpha).
"""

import argparse
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("out")
    ap.add_argument("--alphas", default="0.9,0.95,1.05,1.1")
    ap.add_argument("--include-original", action="store_true",
                    help="also copy the unwarped clips into OUT")
    args = ap.parse_args()

    from deepfilternet_tpu.data.augmentations import RandVTLP
    from deepfilternet_tpu.data.hdf5 import Hdf5Dataset

    alphas = [float(a) for a in args.alphas.split(",") if a]
    src = Hdf5Dataset(args.src)
    rng = np.random.default_rng(0)  # unused: alpha ranges are pinned
    with h5py.File(args.out, "w") as dst:
        dst.attrs["sr"] = src.sr
        dst.attrs["max_freq"] = src.max_freq
        dst.attrs["codec"] = "pcm"
        dst.attrs["dtype"] = "int16"
        dst.attrs["db_name"] = os.path.basename(args.out)
        n = 0
        for g in src.groups:
            grp = dst.require_group(g)
            for k in src.keys(g):
                audio = src.read(g, k)  # [C, T] float32
                variants = []
                if args.include_original:
                    variants.append(("", audio))
                for a in alphas:
                    warp = RandVTLP(prob=1.0, sr=src.sr,
                                    alpha_range=(a, a))
                    variants.append((f"_vtlp{a:g}", warp.apply(
                        audio.copy(), rng)))
                for suffix, y in variants:
                    pcm = np.clip(y * 32768.0, -32768, 32767).astype(np.int16)
                    d = grp.create_dataset(k + suffix, data=pcm)
                    d.attrs["n_samples"] = int(pcm.shape[-1])
                    d.attrs["n_channels"] = int(pcm.shape[0])
                    n += 1
        print(f"wrote {args.out}: {n} clips "
              f"({len(alphas)} warps{' + original' if args.include_original else ''})")


if __name__ == "__main__":
    main()
