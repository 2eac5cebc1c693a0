"""Config INI parsing (S6 parity) — validation asserts included."""

from __future__ import annotations

import pytest

from spacetime_crawler4py_spark.config import load_config

GOOD = """
[IDENTIFICATION]
USERAGENT = IR US23 12345678

[CONNECTION]
HOST = unused.example
PORT = 9000

[CRAWLER]
SEEDURL = https://www.ics.uci.edu,https://www.cs.uci.edu
POLITENESS = 0.5

[LOCAL PROPERTIES]
SAVE = frontier_state
THREADCOUNT = 1

[SPARK]
PAGES = /data/pages.parquet
WINDOWMS = 64000
ORDER = fifo_per_host
"""


def test_load_good(tmp_path):
    p = tmp_path / "config.ini"
    p.write_text(GOOD)
    cfg = load_config(str(p))
    assert cfg.user_agent == "IR US23 12345678"
    assert cfg.seed_urls == [
        "https://www.ics.uci.edu",
        "https://www.cs.uci.edu",
    ]
    assert cfg.time_delay == 0.5 and cfg.delay_ms == 500
    assert cfg.threads_count == 1
    assert cfg.save_file == "frontier_state"
    assert cfg.pages_path == "/data/pages.parquet"
    assert cfg.window_ms == 64000
    assert cfg.order == "fifo_per_host"


def test_user_agent_validation(tmp_path):
    # utils/config.py:8-9 asserts, verbatim semantics
    p = tmp_path / "config.ini"
    p.write_text(GOOD.replace("IR US23 12345678", "DEFAULT AGENT"))
    with pytest.raises(AssertionError):
        load_config(str(p))
    p.write_text(GOOD.replace("IR US23 12345678", "bad!agent@"))
    with pytest.raises(AssertionError):
        load_config(str(p))


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        load_config("/nonexistent/config.ini")
