"""deepfilternet_tpu: TPU-native full-band speech enhancement framework.

A from-scratch JAX/XLA/Pallas rebuild of the DeepFilterNet capability set
(reference: Rikorose/DeepFilterNet): two-stage deep filtering (ERB-domain
gain mask + order-5 complex multi-frame filtering) at 48 kHz, the
DeepFilterNet 1/2/3 model family, streaming inference compiled to a single
XLA while-loop, a training stack, a data engine, and an evaluation suite.

Public API mirrors the reference's `df` package surface:
    from deepfilternet_tpu import init_df, enhance, df_features
"""

__version__ = "0.1.0"

__all__ = ["init_df", "enhance", "df_features", "__version__"]


def __getattr__(name):
    # Lazy to keep `import deepfilternet_tpu.ops` light and cycle-free.
    if name in ("init_df", "enhance", "df_features"):
        from deepfilternet_tpu import enhance as _enhance_mod

        return getattr(_enhance_mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
