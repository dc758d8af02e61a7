# -*- coding: utf-8 -*-
"""Lazy, race-safe build of the native CRF epoch kernel — same
mechanism as :mod:`._ctok_build` (atomic temp-compile + rename so the
local-mode workers can race the driver harmlessly; ``None`` fallback
keeps the pure-Python loop, which remains the differential oracle).
Set ``WEBSTRUCT_SPARK_NO_CCRF`` to force the Python path."""
from __future__ import annotations

import importlib
import os
import subprocess
import sysconfig
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_crf_native.c")
_OUT = os.path.join(_HERE, "_crf_native.so")


def _compile() -> bool:
    include = sysconfig.get_paths()["include"]
    cc = os.environ.get("CC", "gcc")
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
    os.close(fd)
    try:
        subprocess.run(
            [cc, "-O2", "-fPIC", "-shared", "-I", include, _SRC, "-o", tmp],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.rename(tmp, _OUT)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def load():
    """Import the native kernel, building it first if needed.

    Returns the module or ``None``.
    """
    if os.environ.get("WEBSTRUCT_SPARK_NO_CCRF"):
        return None
    fresh = (
        os.path.exists(_OUT)
        and os.path.exists(_SRC)
        and os.path.getmtime(_OUT) >= os.path.getmtime(_SRC)
    )
    if fresh:
        try:
            return importlib.import_module(
                "webstruct_spark.kernel._crf_native"
            )
        except ImportError:
            pass
    if not os.path.exists(_SRC) or not _compile():
        return None
    try:
        return importlib.import_module("webstruct_spark.kernel._crf_native")
    except ImportError:
        return None
