"""The bench supervisor's retry gate: only the known Ray-core crash
signatures may trigger a re-run — deterministic failures fail fast."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _is_ray_core_crash


def test_signal_kill_retries():
    assert _is_ray_core_crash(-6, "")      # SIGABRT
    assert _is_ray_core_crash(-9, "")      # SIGKILL (oom)


def test_ray_check_failure_retries():
    assert _is_ray_core_crash(
        1, "task_manager.cc:930 Check failed: Tried to complete task "
           "that was not pending")
    assert _is_ray_core_crash(1, "... Check failed: x ...")
    assert _is_ray_core_crash(1, "the raylet process has died")


def test_deterministic_failure_does_not_retry():
    assert not _is_ray_core_crash(1, "AssertionError: rows mismatch")
    assert not _is_ray_core_crash(2, "KeyError: 'missing_column'")
    assert not _is_ray_core_crash(1, "")
    # 'raylet' mentioned without a death is not a crash signature
    assert not _is_ray_core_crash(1, "raylet logs at /tmp/ray")
