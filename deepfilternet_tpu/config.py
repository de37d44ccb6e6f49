"""Layered INI + environment configuration system.

Behavioral parity with the reference config system
(/root/reference/DeepFilterNet/df/config.py:12-253): a process-global
`Config` backed by an INI file, where `config(option, default, cast,
section)` reads, in priority order, (1) an `OPTION`-named environment
variable, (2) the INI value, (3) the provided default (which is written
back into the config so a saved config.ini is self-documenting).
Legacy section names used by old reference checkpoints (`deepfilternet`
model sections named after old generations) are honored via
`section_fallbacks`.
"""

from __future__ import annotations

import configparser
import os
import string
from typing import Any, Callable, List, Optional, Type, Union

_CONFIG_TRUE = ("true", "yes", "y", "1", "on")
_CONFIG_FALSE = ("false", "no", "n", "0", "off")


class CsvType:
    """Cast a comma-separated string to a tuple of `inner` values."""

    def __init__(self, inner: Callable[[str], Any] = str):
        self.inner = inner

    def __call__(self, value: Union[str, tuple, list]) -> tuple:
        if isinstance(value, (tuple, list)):
            return tuple(self.inner(v) if isinstance(v, str) else v for v in value)
        items = [v.strip() for v in str(value).split(",") if v.strip() != ""]
        return tuple(self.inner(v) for v in items)

    def to_str(self, value) -> str:
        if isinstance(value, (tuple, list)):
            return ",".join(str(v) for v in value)
        return str(value)


# Alias matching the reference's public name (df/config.py:220-253).
Csv = CsvType


def _cast_bool(v: Union[str, bool]) -> bool:
    if isinstance(v, bool):
        return v
    vl = str(v).strip().lower()
    if vl in _CONFIG_TRUE:
        return True
    if vl in _CONFIG_FALSE:
        return False
    raise ValueError(f"Cannot interpret {v!r} as bool")


class Config:
    """Process-global configuration store.

    Mirrors the reference Config (df/config.py:42-217): INI sections with
    typed reads, environment-variable override, default write-back, and
    modified tracking so `save()` can persist a fully-populated file.
    """

    # Section renames applied when loading old config files; mirrors the
    # legacy migration in the reference (df/config.py:171-206).
    SECTION_RENAMES = {
        "deepfilternet": ("deepfilternet", "clc"),
        "df": ("df", "clc"),
        "train": ("train",),
        "optim": ("optim",),
    }

    def __init__(self):
        self.parser = configparser.ConfigParser(interpolation=None)
        self.path: Optional[str] = None
        self.modified = False
        self.allow_defaults = True

    # -- lifecycle -----------------------------------------------------------

    def load(self, path: Optional[str], allow_defaults: bool = True,
             allow_reload: bool = False):
        if self.path is not None and not allow_reload:
            raise ValueError("Config already loaded")
        self.parser = configparser.ConfigParser(interpolation=None)
        self.allow_defaults = allow_defaults
        if path is not None and os.path.isfile(path):
            self.parser.read(path)
            self._migrate_legacy_sections()
        self.path = path if path is not None else self.path

    def _migrate_legacy_sections(self):
        # Old reference configs used section [deepfilternet] spelled by model
        # generation or `clc`; fold known aliases into canonical names.
        aliases = {"clc": "deepfilternet"}
        for old, new in aliases.items():
            if self.parser.has_section(old) and not self.parser.has_section(new):
                self.parser.add_section(new)
                for k, v in self.parser.items(old):
                    self.parser.set(new, k, v)
                self.parser.remove_section(old)

    def use_defaults(self):
        self.load(path=None, allow_defaults=True, allow_reload=True)

    def reset(self):
        self.parser = configparser.ConfigParser(interpolation=None)
        self.path = None
        self.modified = False
        self.allow_defaults = True

    def save(self, path: Optional[str] = None):
        path = path or self.path
        if path is None:
            raise ValueError("No config path provided")
        with open(path, "w") as f:
            self.parser.write(f)
        self.modified = False

    # -- reads ---------------------------------------------------------------

    def get(
        self,
        option: str,
        default: Any = None,
        cast: Type = str,
        section: str = "DF",
        save: bool = True,
    ) -> Any:
        section_l = section.lower()
        option_l = option.lower()
        env = os.environ.get(option.upper())
        raw: Optional[str] = None
        if env is not None:
            raw = env
        else:
            for sec in self.parser.sections():
                if sec.lower() == section_l and self.parser.has_option(sec, option_l):
                    raw = self.parser.get(sec, option_l)
                    break
        if raw is None:
            if default is None and not self.allow_defaults:
                raise KeyError(f"Option {option} not found in section {section}")
            value = default
        else:
            value = self._cast(raw, cast)
        if save and raw is None and default is not None:
            self.set(option, value, cast=cast, section=section)
        return value

    def set(self, option: str, value: Any, cast: Type = str, section: str = "DF"):
        sec = None
        for s in self.parser.sections():
            if s.lower() == section.lower():
                sec = s
                break
        if sec is None:
            sec = section
            self.parser.add_section(sec)
        if isinstance(cast, CsvType):
            sval = cast.to_str(value)
        elif isinstance(value, bool):
            sval = str(value)
        else:
            sval = str(value)
        self.parser.set(sec, option.lower(), sval)
        self.modified = True

    @staticmethod
    def _cast(raw: str, cast) -> Any:
        if cast is bool:
            return _cast_bool(raw)
        if isinstance(cast, CsvType):
            return cast(raw)
        return cast(raw)

    def sections(self) -> List[str]:
        return list(self.parser.sections())

    def tostr(self) -> str:
        import io

        buf = io.StringIO()
        self.parser.write(buf)
        return buf.getvalue()


_config = Config()


def config(
    option: str,
    default: Any = None,
    cast: Type = str,
    section: str = "DF",
    save: bool = True,
) -> Any:
    """Module-level accessor mirroring `df.config.config`."""
    return _config.get(option, default=default, cast=cast, section=section, save=save)


# expose loader/saver on the function object like the reference does
config.load = _config.load  # type: ignore[attr-defined]
config.save = _config.save  # type: ignore[attr-defined]
config.use_defaults = _config.use_defaults  # type: ignore[attr-defined]
config.reset = _config.reset  # type: ignore[attr-defined]
config.set = _config.set  # type: ignore[attr-defined]
config.obj = _config  # type: ignore[attr-defined]


class DfParams:
    """Base DSP/model hyperparameters.

    Defaults mirror /root/reference/DeepFilterNet/df/config.py:12-39.
    """

    section = "DF"

    def __init__(self):
        self.sr: int = config("SR", cast=int, default=48_000, section="DF")
        self.fft_size: int = config("FFT_SIZE", cast=int, default=960, section="DF")
        self.hop_size: int = config("HOP_SIZE", cast=int, default=480, section="DF")
        self.nb_erb: int = config("NB_ERB", cast=int, default=32, section="DF")
        self.nb_df: int = config("NB_DF", cast=int, default=96, section="DF")
        self.norm_tau: float = config("NORM_TAU", 1, float, section="DF")
        self.lsnr_max: int = config("LSNR_MAX", 35, int, section="DF")
        self.lsnr_min: int = config("LSNR_MIN", -15, int, section="DF")
        self.min_nb_freqs: int = config("MIN_NB_ERB_FREQS", 2, int, section="DF")
        self.df_order: int = config("DF_ORDER", cast=int, default=5, section="DF")
        self.df_lookahead: int = config("DF_LOOKAHEAD", cast=int, default=0, section="DF")
        self.pad_mode: str = config("PAD_MODE", default="input", section="DF")


def random_name(n: int = 6) -> str:
    import random

    return "".join(random.choices(string.ascii_lowercase, k=n))
