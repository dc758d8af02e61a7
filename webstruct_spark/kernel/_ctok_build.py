# -*- coding: utf-8 -*-
"""Lazy, race-safe build of the native tokenizer kernel.

Compiles ``_ctok.c`` next to this file into ``_ctok.so`` with the
system C compiler (the container ships gcc; no packages installed).
The build is atomic (compile to a temp name, ``os.rename``) so the 32
local-mode Python workers can race the driver harmlessly; normally the
driver triggers the build once at plan time and workers import the
finished ``.so``.

Falls back to ``None`` (callers keep the pure-Python kernel) when no
compiler is available or compilation fails — the engine stays
functional, just slower.
"""
from __future__ import annotations

import importlib
import os
import subprocess
import sysconfig
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_ctok.c")
_OUT = os.path.join(_HERE, "_ctok.so")


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
    if os.environ.get("WEBSTRUCT_SPARK_NO_CTOK"):
        return None
    fresh = (
        os.path.exists(_OUT)
        and os.path.exists(_SRC)
        and os.path.getmtime(_OUT) >= os.path.getmtime(_SRC)
    )
    if fresh:
        try:
            return importlib.import_module("webstruct_spark.kernel._ctok")
        except ImportError:
            pass
    # never built, stale, or broken -> (re)build
    if not os.path.exists(_SRC) or not _compile():
        return None
    try:
        return importlib.import_module("webstruct_spark.kernel._ctok")
    except ImportError:
        return None
