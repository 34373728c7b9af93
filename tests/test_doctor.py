"""tools/doctor.py: always returns, and reports the right structure.

In this environment the registered non-CPU platform may be unreachable, so
the probes run with a tiny timeout — the point under test is that doctor
never hangs and classifies the outcome; accelerator health itself is
environment-dependent.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_doctor_returns_and_reports():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "doctor.py"),
         "--quick", "--probe-timeout", "5"],
        capture_output=True, text=True, timeout=240)
    report = json.loads(proc.stdout)
    assert "jax" in report["versions"]
    assert report["virtual_cpu_mesh"]["ok"], report["virtual_cpu_mesh"]
    assert report["native_lib"]["ok"]
    assert "verdict" in report
    # exit code encodes accelerator health and must match the report
    assert proc.returncode == (0 if report["device_enumeration"]["ok"] else 1)
