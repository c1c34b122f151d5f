"""CLI entry point (reference cli.py parity: seed url, --max-pages,
--retries; sitemap priming by default with seed fallback)."""

from __future__ import annotations

import json
import shutil
import tempfile

from sparkcrawler import cli


def test_cli_crawl(spark, capsys):
    out = tempfile.mkdtemp(prefix="sc_cli_")
    try:
        rc = cli.main(
            ["https://host1.example/p/0", "--synth", "120", "--hosts", "5",
             "--max-pages", "8", "--out", out, "--no-sitemap"]
        )
        assert rc == 0
        payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert payload["visited"] == 8
        assert payload["rounds"] >= 2
        assert all("wall" in st for st in payload["round_stats"])
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_cli_requires_corpus_or_synth(spark, capsys):
    out = tempfile.mkdtemp(prefix="sc_cli2_")
    try:
        rc = cli.main(["https://x.example/", "--out", out])
        assert rc == 2
    finally:
        shutil.rmtree(out, ignore_errors=True)
