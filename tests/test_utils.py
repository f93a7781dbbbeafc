"""Utility tests: stage timer, compilation cache, model bundle store."""

import json
import os
import time

import numpy as np

from ukbb_cardiac_tpu.utils import StageTimer
from ukbb_cardiac_tpu.utils.cache import enable_compilation_cache


def test_stage_timer_spans(tmp_path):
    timer = StageTimer()
    with timer.span("outer"):
        with timer.span("inner"):
            time.sleep(0.01)
    timer.record("manual", 0.5)
    s = timer.summary()
    assert "outer" in s and "outer/inner" in s
    assert s["outer/inner"]["total_s"] >= 0.01
    assert s["manual"]["mean_s"] == 0.5
    p = tmp_path / "t.json"
    timer.dump(str(p))
    assert "outer" in json.load(open(p))
    assert "outer" in timer.report()


def test_compilation_cache_enable(tmp_path):
    assert enable_compilation_cache(str(tmp_path / "cache")) in (True, False)
