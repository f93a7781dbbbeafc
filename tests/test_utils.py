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


def test_stage_timer_thread_safe_spans():
    """Concurrent spans on different threads must not interleave their
    hierarchical names (the fleet drives subjects from a thread pool)."""
    import threading

    from ukbb_cardiac_tpu.utils.timing import StageTimer

    timer = StageTimer()
    stop = threading.Barrier(4)

    def work(tag):
        stop.wait()
        for _ in range(200):
            with timer.span(tag):
                with timer.span("inner"):
                    pass

    threads = [threading.Thread(target=work, args=(f"t{i}",))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    keys = set(timer.summary())
    expected = set()
    for i in range(4):
        expected |= {f"t{i}", f"t{i}/inner"}
    assert keys == expected, keys


def test_stage_timer_summary_concurrent_with_new_spans():
    """summary() must tolerate worker threads opening NEW span names
    concurrently (snapshot under the lock, ADVICE r2)."""
    import threading

    from ukbb_cardiac_tpu.utils.timing import StageTimer

    timer = StageTimer()
    stop = threading.Event()

    def writer():
        i = 0
        while not stop.is_set() and i < 20000:
            timer.record(f"span{i}", 0.001)
            i += 1

    t = threading.Thread(target=writer)
    t.start()
    try:
        for _ in range(50):
            timer.summary()
    finally:
        stop.set()
        t.join()
