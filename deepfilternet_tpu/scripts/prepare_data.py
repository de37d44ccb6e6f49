"""Create training HDF5 datasets from audio files.

Reference: df/scripts/prepare_data.py (244 LoC): one HDF5 per corpus with
a group per content type (speech|noise|rir), root attrs sr/max_freq/codec/
dtype, one dataset per input file. This implementation writes PCM int16 or
float32 (vorbis/flac *reading* is supported by the data engine via the
native decoders; encoding is not vendored — store PCM).

Usage:
    python -m deepfilternet_tpu.scripts.prepare_data speech out.hdf5 \
        file1.wav file2.wav ... [--sr 48000] [--dtype int16]
    python -m deepfilternet_tpu.scripts.prepare_data noise out.hdf5 --glob 'dir/*.wav'
"""

from __future__ import annotations

import argparse
import glob as globmod
import os
import time

import h5py
import numpy as np

from deepfilternet_tpu.utils.audio_io import load_audio, resample


def sanitize_key(path: str) -> str:
    return path.strip("/").replace("/", "_").replace("\\", "_")


def prepare(
    content: str,
    output: str,
    files: list,
    sr: int = 48000,
    dtype: str = "int16",
    max_freq: int | None = None,
    mono: bool = False,
):
    assert content in ("speech", "noise", "rir")
    assert dtype in ("int16", "float32")
    with h5py.File(output, "a") as f:
        f.attrs["sr"] = sr
        f.attrs["max_freq"] = max_freq or sr // 2
        f.attrs["codec"] = "pcm"
        f.attrs["dtype"] = dtype
        f.attrs["db_name"] = os.path.basename(output)
        f.attrs["db_id"] = int(time.time())
        grp = f.require_group(content)
        n_written = 0
        for path in files:
            audio, fsr = load_audio(path)
            if fsr != sr:
                audio = resample(audio, fsr, sr)
            if mono and audio.shape[0] > 1:
                audio = audio.mean(axis=0, keepdims=True)
            if dtype == "int16":
                data = np.clip(audio * 32767.0, -32768, 32767).astype(np.int16)
            else:
                data = audio.astype(np.float32)
            key = sanitize_key(path)
            if key in grp:
                del grp[key]
            ds = grp.create_dataset(key, data=data, compression="gzip", compression_opts=2)
            ds.attrs["n_samples"] = np.array([audio.shape[-1]])
            n_written += 1
    print(f"Wrote {n_written} {content} samples to {output}")
    return n_written


def main(argv=None):
    parser = argparse.ArgumentParser(description="Create a DeepFilterNet HDF5 dataset")
    parser.add_argument("content", choices=["speech", "noise", "rir"])
    parser.add_argument("output")
    parser.add_argument("files", nargs="*")
    parser.add_argument("--glob", default=None)
    parser.add_argument("--sr", type=int, default=48000)
    parser.add_argument("--dtype", default="int16", choices=["int16", "float32"])
    parser.add_argument("--max-freq", type=int, default=None)
    parser.add_argument("--mono", action="store_true")
    args = parser.parse_args(argv)
    files = list(args.files)
    if args.glob:
        files += sorted(globmod.glob(args.glob))
    if not files:
        parser.error("no input files")
    prepare(args.content, args.output, files, sr=args.sr, dtype=args.dtype,
            max_freq=args.max_freq, mono=args.mono)


if __name__ == "__main__":
    main()
