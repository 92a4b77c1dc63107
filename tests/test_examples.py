"""Smoke-run every example pipeline against sf0.001 so an API rename
can never rot them silently (r4 verdict: examples were runnable but
not CI-exercised).  Each example's own get_session() resolves to the
test session via getOrCreate, so this shares one JVM."""

from __future__ import annotations

import importlib
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tests.conftest import SF_DIR

_TAKES_SF = {
    "corpus_pipeline",
    "shuffle_doctor",
    "sketch_shelf",
    "tpch_battery",
    "vector_search",
}
_EXAMPLES = sorted(_TAKES_SF | {"custom_connector_pipeline"})


@pytest.mark.parametrize("name", _EXAMPLES)
def test_example_runs_and_prints(name, spark, capsys):
    mod = importlib.import_module(f"examples.{name}")
    if name in _TAKES_SF:
        mod.main(SF_DIR)
    else:
        mod.main()
    out = capsys.readouterr().out
    assert len(out.strip()) > 0, f"{name} produced no output"
