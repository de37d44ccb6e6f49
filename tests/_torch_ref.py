"""Import helper for the REAL reference torch models under /root/reference.

The reference package imports loguru/torchaudio/libdf at module import
time; none of those is needed for building the models and running their
forward on CPU, so they are stubbed (libdf with our own drop-in
libdf_compat, which reproduces pyDF's exact ERB widths and norms).

Used by tests/test_convert_torch.py to prove the checkpoint converters
against the actual torch module composition rather than a self-built
state dict (VERDICT round-1 item 3).
"""

import os
import sys
import tempfile
import types

_REF = "/root/reference/DeepFilterNet"
_loaded = False


def reference_available() -> bool:
    return os.path.isdir(_REF)


def load_reference_df():
    """Make `import df.*` resolve to the reference package; returns the
    reference config object (already loaded with defaults)."""
    global _loaded
    if not _loaded:
        if _REF not in sys.path:
            sys.path.insert(0, _REF)

        def stub(name, **attrs):
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules.setdefault(name, m)
            return sys.modules[name]

        class _Level:
            no = 30

        class _Logger:
            def level(self, *a, **kw):
                return _Level()

            def __getattr__(self, k):
                return lambda *a, **kw: None

        stub("loguru", logger=_Logger())
        ta = stub("torchaudio")
        ta.functional = stub("torchaudio.functional", resample=lambda *a, **kw: None)
        stub("torchaudio.backend")
        stub("torchaudio.backend.common", AudioMetaData=object)
        import deepfilternet_tpu.libdf_compat as compat

        sys.modules.setdefault("libdf", compat)
        _loaded = True

    from df.config import config as ref_config

    if ref_config.parser is None:
        ini = tempfile.NamedTemporaryFile("w", suffix=".ini", delete=False)
        ini.write("[df]\n")
        ini.close()
        ref_config.load(ini.name)
    return ref_config
