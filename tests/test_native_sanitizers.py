"""Race/memory sanitizer harness for the native components.

The reference had nothing to sanitize (pure Python, single-threaded
training — SURVEY.md §5 "race detection: none"). This framework's native
batch producer ring (native/batch_assembler.cpp) and threaded Harvest band
analysis (native/harvest.cpp) are real concurrency, so the suite runs the
standalone C++ stress driver (native/sanitize_driver.cpp) under
ThreadSanitizer and AddressSanitizer+UBSan. The driver also verifies batch
contents by value, so torn slot writes fail even without a sanitizer hit.
"""

import os
import shutil
import subprocess

import pytest

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def _sanitizer_available(flag: str) -> bool:
    if shutil.which("g++") is None or shutil.which("make") is None:
        return False
    probe = "int main(){return 0;}"
    try:
        r = subprocess.run(
            ["g++", "-x", "c++", f"-fsanitize={flag}", "-", "-o", "/dev/null"],
            input=probe, capture_output=True, text=True, timeout=60,
        )
        return r.returncode == 0
    except Exception:
        return False


@pytest.mark.parametrize(
    "target,env_opts,flag",
    [
        ("sanitize_tsan", {"TSAN_OPTIONS": "halt_on_error=1"}, "thread"),
        ("sanitize_asan", {"ASAN_OPTIONS": "detect_leaks=1"}, "address"),
    ],
)
def test_sanitizer_clean(target, env_opts, flag):
    if not _sanitizer_available(flag):
        pytest.skip(f"-fsanitize={flag} not supported in this toolchain")
    build = subprocess.run(
        ["make", "-C", NATIVE_DIR, target],
        capture_output=True, text=True, timeout=300,
    )
    assert build.returncode == 0, build.stderr[-2000:]
    env = dict(os.environ, **env_opts)
    run = subprocess.run(
        [os.path.join(NATIVE_DIR, target)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert run.returncode == 0, (run.stdout + run.stderr)[-4000:]
    assert "all scenarios passed" in run.stderr
