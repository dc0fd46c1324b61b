"""Bench isolation guard (round-8 verdict item 8): a bench run that
detects a live sibling Spark workload must refuse to append to
BENCH_HISTORY — contaminated records poison every later regression diff
(two were scrubbed from the ledger in round 7)."""

from __future__ import annotations

import importlib.util
import os
import socket


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_lockfile_held_by_live_pid_flags(tmp_path):
    b = _bench()
    b._release_bench_lock()
    lock = os.path.join(os.path.dirname(os.path.abspath(b.__file__)),
                        ".bench.lock")
    try:
        with open(lock, "w") as f:
            f.write(str(os.getpid()))  # a live pid that isn't the checker's
        reason = b._contamination_reason(ports=())
        assert reason and "lockfile" in reason, reason
    finally:
        b._release_bench_lock()


def test_stale_lock_is_reclaimed_and_port_scan_runs(tmp_path):
    b = _bench()
    b._release_bench_lock()
    lock = os.path.join(os.path.dirname(os.path.abspath(b.__file__)),
                        ".bench.lock")
    with open(lock, "w") as f:
        f.write("999999999")  # dead pid: must be reclaimed, not flagged
    try:
        assert b._contamination_reason(ports=()) is None
        assert os.path.exists(lock)  # now held by us
    finally:
        b._release_bench_lock()


def test_live_spark_ui_port_flags_and_releases_lock():
    b = _bench()
    b._release_bench_lock()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    lock = os.path.join(os.path.dirname(os.path.abspath(b.__file__)),
                        ".bench.lock")
    try:
        reason = b._contamination_reason(ports=(port,))
        assert reason and str(port) in reason, reason
        assert not os.path.exists(lock)  # refused runs hold no lock
    finally:
        srv.close()
        b._release_bench_lock()


def test_refused_record_shape_is_documented_in_main():
    """main() must key the refusal as history_append_refused and skip
    _append_history — pin the wiring textually (running a full bench in
    a unit test is out of budget)."""
    import inspect

    b = _bench()
    src = inspect.getsource(b.main)
    assert 'record["history_append_refused"] = contaminated' in src
    assert "if contaminated is None:" in src
    idx_guard = src.index("if contaminated is None:")
    assert src.index("_append_history(record)") > idx_guard
