"""bench.py contract guards (no Spark): the headline list must stay a
subset of the catalog (a stale name would crash the driver's per-round
bench run), and every catalog entry keeps the driver's dual contract."""

from __future__ import annotations

import importlib.util
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_headline_names_exist_in_catalog():
    from sparkcrawler.analytics import CATALOG

    bench = _load_bench()
    missing = [n for n in bench.HEADLINE if n not in CATALOG]
    assert not missing, missing


def test_catalog_specs_are_well_formed():
    from sparkcrawler.analytics import CATALOG

    for name, spec in CATALOG.items():
        assert callable(spec.spark), name
        # SQL oracles must be non-empty strings when present
        assert spec.sql is None or (
            isinstance(spec.sql, str) and spec.sql.strip()
        ), name
