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


@pytest.fixture(scope="session")
def corpus_dir():
    """sf0.001 synthetic corpus + gold tables (generated once)."""
    from webstruct_spark.sources.goldbuild import build_gold
    from webstruct_spark.sources.transcripts import ensure_corpus_for_sf

    d = ensure_corpus_for_sf(0.001)
    build_gold(d)
    return d
