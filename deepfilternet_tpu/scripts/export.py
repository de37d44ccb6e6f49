"""Export a trained model as a deployable artifact.

Reference: df/scripts/export.py packages ONNX graphs + config.ini into a
tar.gz consumed by the Rust tract runtime. The TPU-native equivalent
packages (a) the checkpoint, (b) config.ini, and (c) an ahead-of-time
StableHLO export of the offline forward and the streaming cell via
`jax.export` — portable compiled artifacts playable back on any JAX
runtime without the Python model code.

Usage:
    python -m deepfilternet_tpu.scripts.export base_dir out.tar.gz [--epoch best]
"""

from __future__ import annotations

import argparse
import io
import os
import tarfile

import numpy as np


def export_stablehlo(model, df_state, batch: int = 1, time: int = 10) -> dict:
    """Serialize offline forward + streaming cell to StableHLO bytes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    cfg = model.cfg
    module = model.module
    f = cfg["freq_bins"]
    e = cfg["nb_erb"]
    fp = cfg["nb_df"]

    def offline(spec, fe, fs):
        (spec_e, m, lsnr, _), _ = module.forward(
            model.params, model.state, cfg, spec, fe, fs, train=False
        )
        return spec_e, m, lsnr

    args_off = (
        jax.ShapeDtypeStruct((batch, time, f, 2), jnp.float32),
        jax.ShapeDtypeStruct((batch, time, e), jnp.float32),
        jax.ShapeDtypeStruct((batch, time, fp, 2), jnp.float32),
    )
    exported_off = jexport.export(jax.jit(offline))(*args_off)

    # streaming carries are NamedTuples; register them for serialization
    for mod_name in ("dfnet3", "dfnet2", "dfnet1"):
        try:
            import importlib

            m = importlib.import_module(f"deepfilternet_tpu.models.{mod_name}")
            for cls_name in ("StreamState", "StreamState1", "StreamState2"):
                if hasattr(m, cls_name):
                    try:
                        jexport.register_namedtuple_serialization(
                            getattr(m, cls_name),
                            serialized_name=f"{mod_name}.{cls_name}",
                        )
                    except ValueError:
                        pass  # already registered
        except ImportError:
            pass

    carry0 = module.streaming_init(batch, cfg)

    def cell(carry, spec, fe, fs):
        return module.streaming_cell(model.params, model.state, cfg, carry, spec, fe, fs)

    args_cell = (
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), carry0),
        jax.ShapeDtypeStruct((batch, f, 2), jnp.float32),
        jax.ShapeDtypeStruct((batch, e), jnp.float32),
        jax.ShapeDtypeStruct((batch, fp, 2), jnp.float32),
    )
    exported_cell = jexport.export(jax.jit(cell))(*args_cell)
    return {
        "offline.stablehlo": exported_off.serialize(),
        "streaming_cell.stablehlo": exported_cell.serialize(),
    }


def export_model(base_dir: str, output: str, epoch="best", skip_hlo: bool = False):
    from deepfilternet_tpu.enhance import init_df

    model, df_state, suffix = init_df(base_dir, epoch=epoch)
    artifacts = {}
    if not skip_hlo:
        artifacts = export_stablehlo(model, df_state)
    with tarfile.open(output, "w:gz") as tar:

        def add_bytes(name, data: bytes):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))

        cfg_path = os.path.join(base_dir, "config.ini")
        if os.path.isfile(cfg_path):
            tar.add(cfg_path, arcname="config.ini")
        ckpt_dir = os.path.join(base_dir, "checkpoints")
        if os.path.isdir(ckpt_dir):
            for name in os.listdir(ckpt_dir):
                if name.startswith("model_"):
                    tar.add(os.path.join(ckpt_dir, name),
                            arcname=f"checkpoints/{name}")
        for name, data in artifacts.items():
            add_bytes(name, data)
        add_bytes("version.txt", b"deepfilternet_tpu-0.1.0\n")
    print(f"Exported {suffix} to {output}")


def load_exported(path: str, name: str = "offline.stablehlo"):
    """Load a serialized StableHLO function back as a callable."""
    from jax import export as jexport

    with tarfile.open(path, "r:gz") as tar:
        data = tar.extractfile(name).read()
    return jexport.deserialize(data).call


def main(argv=None):
    from deepfilternet_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    parser = argparse.ArgumentParser(description="Export a model artifact")
    parser.add_argument("base_dir")
    parser.add_argument("output")
    parser.add_argument("--epoch", default="best")
    parser.add_argument("--skip-hlo", action="store_true")
    args = parser.parse_args(argv)
    export_model(args.base_dir, args.output, epoch=args.epoch, skip_hlo=args.skip_hlo)


if __name__ == "__main__":
    main()
