"""Doc <-> code parity for the honest-unsupported matrix (VERDICT r4
#4): COVERAGE.md's generated block must match the actual capability-gap
raise sites exactly."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_coverage_matrix_matches_raise_sites():
    sys.path.insert(0, str(REPO / "tools"))
    import unsupported_matrix

    assert unsupported_matrix.check(), (
        "COVERAGE.md unsupported matrix is stale - run "
        "tools/unsupported_matrix.py --write")


def test_generator_cli_check_passes():
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "unsupported_matrix.py"),
         "--check"], capture_output=True, text=True)
    assert res.returncode == 0, res.stdout + res.stderr
