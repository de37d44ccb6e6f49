"""HDF5 dataset utilities (reference: df/scripts hdf5 helpers + the
sample-hdf5/sample-dataset debug binaries).

Subcommands:
    list    out keys, lengths, attrs of a dataset file
    sample  decode one key (or a random one) to a wav for listening
    split   split a dataset's keys into train/valid/test HDF5 files
    trim    copy a dataset keeping only keys shorter than a max length
    fix     repair sr/max_freq/n_samples/n_channels attrs in place
            (reference: df/scripts/fix_n_samples_hdf5.py)

Usage:
    python -m deepfilternet_tpu.scripts.hdf5_tool list file.hdf5
    python -m deepfilternet_tpu.scripts.hdf5_tool sample file.hdf5 out.wav [--key K]
    python -m deepfilternet_tpu.scripts.hdf5_tool split file.hdf5 outdir --ratios 0.8,0.1,0.1
    python -m deepfilternet_tpu.scripts.hdf5_tool trim file.hdf5 out.hdf5 --max-len-s 30
"""

from __future__ import annotations

import argparse
import os

import h5py
import numpy as np

from deepfilternet_tpu.data.hdf5 import Hdf5Dataset
from deepfilternet_tpu.utils.audio_io import save_audio


def cmd_list(args):
    ds = Hdf5Dataset(args.file)
    print(f"{ds.name}: sr={ds.sr} max_freq={ds.max_freq} codec={ds.codec} "
          f"dtype={ds.dtype}")
    for g in ds.groups:
        keys = ds.keys(g)
        total = sum(ds.sample_len(g, k) for k in keys)
        print(f"  [{g}] {len(keys)} keys, {total / ds.sr / 3600:.2f} h")
        for k in keys[: args.max_keys]:
            print(f"    {k}: {ds.sample_len(g, k) / ds.sr:.2f}s")


def cmd_sample(args):
    ds = Hdf5Dataset(args.file)
    group = args.group or ds.groups[0]
    keys = ds.keys(group)
    key = args.key or keys[np.random.default_rng(args.seed).integers(0, len(keys))]
    audio = ds.read(group, key)
    save_audio(args.out, audio, ds.sr)
    print(f"Wrote {group}/{key} ({audio.shape[-1] / ds.sr:.2f}s) to {args.out}")


def _copy_attrs(src, dst):
    for k, v in src.attrs.items():
        dst.attrs[k] = v


def cmd_split(args):
    ratios = [float(r) for r in args.ratios.split(",")]
    assert abs(sum(ratios) - 1.0) < 1e-6 and len(ratios) == 3
    rng = np.random.default_rng(args.seed)
    with h5py.File(args.file, "r") as src:
        stem = os.path.splitext(os.path.basename(args.file))[0]
        outs = {}
        for split in ("train", "valid", "test"):
            path = os.path.join(args.outdir, f"{stem}_{split}.hdf5")
            outs[split] = h5py.File(path, "w")
            _copy_attrs(src, outs[split])
        for g in src:
            keys = sorted(src[g].keys())
            rng.shuffle(keys)
            n = len(keys)
            bounds = [0, int(n * ratios[0]), int(n * (ratios[0] + ratios[1])), n]
            for (split, out), lo, hi in zip(outs.items(), bounds[:-1], bounds[1:]):
                grp = out.require_group(g)
                for k in keys[lo:hi]:
                    src.copy(src[g][k], grp, name=k)
        for split, out in outs.items():
            counts = {g: len(out[g]) for g in out}
            print(f"{split}: {counts}")
            out.close()


def cmd_trim(args):
    with h5py.File(args.file, "r") as src, h5py.File(args.out, "w") as dst:
        _copy_attrs(src, dst)
        sr = int(src.attrs.get("sr", 48000))
        max_len = int(args.max_len_s * sr)
        kept = dropped = 0
        for g in src:
            grp = dst.require_group(g)
            for k in src[g]:
                ds = src[g][k]
                n = int(np.atleast_1d(ds.attrs.get("n_samples",
                                                   ds.shape[-1]))[0])
                if n <= max_len:
                    src.copy(ds, grp, name=k)
                    kept += 1
                else:
                    dropped += 1
        print(f"kept {kept}, dropped {dropped} (> {args.max_len_s}s)")


def cmd_fix(args):
    """Repair dataset attrs in place (reference: df/scripts/
    fix_n_samples_hdf5.py): ensure file-level sr/max_freq exist, decode
    every entry and rewrite its n_samples/n_channels attrs from the
    actual audio shape, and drop the legacy n_ch attr."""
    from deepfilternet_tpu.data.hdf5 import Hdf5Dataset

    ds = Hdf5Dataset(args.file)  # picks up sr/max_freq/codec defaults
    sr, max_freq, codec = ds.sr, ds.max_freq, ds.codec
    ds.close()
    if args.sr:
        sr = args.sr
    if args.max_freq:
        max_freq = args.max_freq
    fixed = 0
    with h5py.File(args.file, "r+") as h5f:
        h5f.attrs["sr"] = sr
        h5f.attrs["max_freq"] = max_freq
        reader = Hdf5Dataset(args.file)
        try:
            for g in h5f:
                for k, d in h5f[g].items():
                    audio = reader.read(g, k)  # [C, T] float
                    n_samples = int(audio.shape[-1])
                    n_channels = int(audio.shape[0]) if audio.ndim == 2 else 1
                    assert n_channels <= 16, (k, audio.shape)
                    old = d.attrs.get("n_samples", None)
                    if old is not None and int(np.atleast_1d(old)[0]) != n_samples:
                        print(f"  {g}/{k}: n_samples {old} -> {n_samples}")
                        fixed += 1
                    d.attrs["n_samples"] = n_samples
                    d.attrs["n_channels"] = n_channels
                    if "n_ch" in d.attrs:
                        del d.attrs["n_ch"]
        finally:
            reader.close()
    print(f"fixed {fixed} entries (sr={sr} max_freq={max_freq} codec={codec})")


def main(argv=None):
    parser = argparse.ArgumentParser(description="HDF5 dataset utilities")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("list")
    p.add_argument("file")
    p.add_argument("--max-keys", type=int, default=10)
    p = sub.add_parser("sample")
    p.add_argument("file")
    p.add_argument("out")
    p.add_argument("--key", default=None)
    p.add_argument("--group", default=None)
    p.add_argument("--seed", type=int, default=0)
    p = sub.add_parser("split")
    p.add_argument("file")
    p.add_argument("outdir")
    p.add_argument("--ratios", default="0.8,0.1,0.1")
    p.add_argument("--seed", type=int, default=0)
    p = sub.add_parser("trim")
    p.add_argument("file")
    p.add_argument("out")
    p.add_argument("--max-len-s", type=float, required=True)
    p = sub.add_parser("fix")
    p.add_argument("file")
    p.add_argument("--sr", type=int, default=None)
    p.add_argument("--max-freq", type=int, default=None)
    args = parser.parse_args(argv)
    {"list": cmd_list, "sample": cmd_sample, "split": cmd_split,
     "trim": cmd_trim, "fix": cmd_fix}[args.cmd](args)


if __name__ == "__main__":
    main()
