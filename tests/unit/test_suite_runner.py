"""scripts/run_tests.py — the one-command full-suite runner (VERDICT r4 #4).

Pins the crash-retry contract: a tier process dying on a signal (the
image's known XLA:CPU compile SIGSEGV/SIGABRT, CLAUDE.md) is retried;
an ordinary red test is NOT retried; a green tier passes first try.
"""

import importlib.util
import os
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_runner():
    path = os.path.join(REPO, "scripts", "run_tests.py")
    spec = importlib.util.spec_from_file_location("run_tests", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_crash_retry_then_pass(tmp_path):
    """A tier that SIGSEGVs once (sentinel protocol) must be retried and
    then pass — the mechanical form of 'on a crash, rerun the tier'."""
    runner = _load_runner()
    sentinel = tmp_path / "crashed_once"
    test_file = tmp_path / "test_flaky_compile.py"
    test_file.write_text(textwrap.dedent(f"""
        import os, signal

        def test_crashes_first_time():
            s = {str(sentinel)!r}
            if not os.path.exists(s):
                open(s, "w").close()
                os.kill(os.getpid(), signal.SIGSEGV)  # the XLA:CPU crash
    """))
    ok = runner.run_tier("fake", [str(test_file)], ["-p", "no:cacheprovider"],
                         retries=2)
    assert ok
    assert sentinel.exists()


def test_real_failure_not_retried(tmp_path):
    """A red test is a FAILURE, not flakiness: exactly one attempt."""
    runner = _load_runner()
    counter = tmp_path / "attempts"
    test_file = tmp_path / "test_red.py"
    test_file.write_text(textwrap.dedent(f"""
        def test_always_red():
            with open({str(counter)!r}, "a") as f:
                f.write("x")
            assert False
    """))
    ok = runner.run_tier("fake", [str(test_file)], ["-p", "no:cacheprovider"],
                         retries=2)
    assert not ok
    assert counter.read_text() == "x"  # ran once, no retry


def test_crash_rc_classification():
    runner = _load_runner()
    assert -11 in runner.CRASH_RCS  # SIGSEGV via subprocess
    assert -6 in runner.CRASH_RCS   # SIGABRT
    assert 139 in runner.CRASH_RCS  # 128+11 shell form
    assert 1 not in runner.CRASH_RCS
    assert 5 not in runner.CRASH_RCS  # no-tests-collected is NOT a crash
