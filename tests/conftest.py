# -*- coding: utf-8 -*-
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from webstruct_spark.session import get_spark

    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


def arm_fs_tripwire(monkeypatch, marker="TRIPWIRE_OUT_DIR"):
    """Arm Python-side local-FS entry points to raise on any path
    containing ``marker``.  Catches driver-local access to a path
    that, on a real deployment, only the Hadoop FS can reach.  Tests
    that must first STAGE data under the marked path call this
    directly after staging; the ``fs_tripwire`` fixture arms it
    before the test body."""

    def guard(fn):
        def wrapped(path, *a, **kw):
            if marker in str(path):
                raise AssertionError(
                    "driver-local fs call %s(%r) on a cluster-only "
                    "path" % (getattr(fn, "__name__", fn), path)
                )
            return fn(path, *a, **kw)

        return wrapped

    import builtins

    for mod, name in (
        (builtins, "open"),
        (os, "listdir"),
        (os, "makedirs"),
        (os, "replace"),
        (os, "remove"),
        (os, "rename"),
        (os.path, "exists"),
        (os.path, "isfile"),
        (os.path, "isdir"),
        (os.path, "getsize"),
        (os.path, "getmtime"),
    ):
        monkeypatch.setattr(mod, name, guard(getattr(mod, name)))
    return marker


@pytest.fixture()
def fs_tripwire(monkeypatch):
    return arm_fs_tripwire(monkeypatch)


@pytest.fixture(scope="session")
def corpus_dir():
    """sf0.001 synthetic corpus + gold tables (generated once)."""
    from webstruct_spark.sources.goldbuild import build_gold
    from webstruct_spark.sources.transcripts import ensure_corpus_for_sf

    d = ensure_corpus_for_sf(0.001)
    build_gold(d)
    return d
