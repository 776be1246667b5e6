"""Global configuration for henbun_tpu.

INI-file driven settings with stack-based temporary overrides, mirroring the
reference behavior (`/root/reference/Henbun/_settings.py:26-149`): the config
file ``henbunrc`` / ``.henbunrc`` is searched in the current directory, then
``$HOME``, then the package directory; values parse into nested
attribute-accessible mutable namespaces; ``settings.temp_settings(cfg)`` gives a
scoped override.

TPU-native differences:
  * dtype strings map to ``jnp`` dtypes (not ``tf``); ``settings.dtypes.float_type``
    is a ``jnp.dtype``.
  * a new ``[tpu]`` section controls matmul precision used inside numerically
    sensitive kernels (Cholesky / square-dist paths) — TPU MXU defaults to
    bfloat16 accumulation which is not enough for Cholesky at float32.
  * the ``[profiling]`` keys, which are dead config in the reference
    (`Henbun/henbunrc:17-19` has no consuming code), are honored for real here by
    :mod:`henbun_tpu.utils.profiling`.
"""
from __future__ import annotations

import copy
import os
from collections import OrderedDict
from configparser import ConfigParser

import jax.numpy as jnp
import numpy as np


class SettingsContextManager:
    def __init__(self, manager, tmp_settings):
        self._manager = manager
        self._tmp_settings = tmp_settings

    def __enter__(self):
        self._manager.push(self._tmp_settings)
        return self._tmp_settings

    def __exit__(self, exc_type, exc_val, exc_tb):
        self._manager.pop()


class SettingsManager:
    """Holds the current settings plus a stack for temporary overrides."""

    def __init__(self, cur):
        self._cur_settings = cur
        self._settings_stack = []

    def __getattr__(self, name):
        try:
            return self._cur_settings[name]
        except KeyError:
            raise AttributeError("Unknown setting: %r" % name)

    def push(self, settings):
        self._settings_stack.append(self._cur_settings)
        self._cur_settings = settings

    def pop(self):
        rem = self._cur_settings
        self._cur_settings = self._settings_stack.pop()
        return rem

    def temp_settings(self, tmp_settings):
        return SettingsContextManager(self, tmp_settings)

    def get_settings(self):
        return copy.deepcopy(self._cur_settings)


class MutableNamedTuple(OrderedDict):
    """A dict usable via attribute access, so ``settings.numerics.jitter_level``
    works and can be re-set inside ``temp_settings`` blocks."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._initialised = True

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        if not hasattr(self, "_initialised"):
            super().__setattr__(name, value)
        else:
            super().__setitem__(name, value)


_DTYPE_STRINGS = {
    "float64": jnp.float64,
    "float32": jnp.float32,
    "float16": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "int64": jnp.int64,
    "int32": jnp.int32,
    "int16": jnp.int16,
}


def parse(string):
    """Parse an INI value string into bool / dtype / number / str."""
    if not isinstance(string, str):
        raise ValueError("%r is not a string" % (string,))
    if string in ("true", "True"):
        return True
    if string in ("false", "False"):
        return False
    if string in _DTYPE_STRINGS:
        return jnp.dtype(_DTYPE_STRINGS[string])
    if any(string.count(s) for s in ".eE"):
        try:
            return float(string)
        except ValueError:
            return string
    try:
        return int(string)
    except ValueError:
        return string


def namedtuplify(mapping):
    if isinstance(mapping, dict):
        for key, value in list(mapping.items()):
            mapping[key] = namedtuplify(value)
        mapping.pop("__name__", None)
        return MutableNamedTuple(mapping)
    return parse(mapping)


def read_config_file(path=None):
    c = ConfigParser()
    if path is None:
        locations = map(
            os.path.abspath,
            [os.curdir, os.path.expanduser("~"), os.path.dirname(os.path.realpath(__file__))],
        )
        for loc in locations:
            # prefer non-hidden over hidden files, as the reference does
            if c.read(os.path.join(loc, "henbunrc")):
                break
            if c.read(os.path.join(loc, ".henbunrc")):
                break
    else:
        if not c.read(path):
            raise IOError("config file %s not found" % path)
    return c


_c = read_config_file()
_loaded = namedtuplify({k: dict(v) for k, v in _c.items() if k != "DEFAULT"})
settings = SettingsManager(_loaded)


def np_float(dtype=None):
    """numpy analog of the configured float type (bfloat16 maps to float32 on host)."""
    dtype = dtype or settings.dtypes.float_type
    if dtype == jnp.dtype(jnp.bfloat16):
        return np.float32
    return np.dtype(dtype).type
