"""Utils + profiling tests."""

import json
import time

from biseqt_tpu.utils import with_dumpfile, ProgressIndicator, Timer
from biseqt_tpu import profiling


def test_with_dumpfile(tmp_path):
    calls = []

    @with_dumpfile
    def compute(x):
        calls.append(x)
        return x * 2

    p = str(tmp_path / "r.pkl")
    assert compute(21, dumpfile=p) == 42
    assert compute(21, dumpfile=p) == 42  # cached, no second call
    assert calls == [21]
    assert compute(21, dumpfile=p, ignore_existing=True) == 42
    assert calls == [21, 21]


def test_timer_and_phase():
    with Timer() as t:
        time.sleep(0.01)
    assert t.elapsed >= 0.01
    with profiling.Phase("unit-test", cells=10**9):
        time.sleep(0.005)
    rep = profiling.report(reset=True)
    row = json.loads(rep.splitlines()[-1])
    assert row["phase"] == "unit-test"
    assert row["gcups"] > 0
