"""Opt-in bit-exactness test against the actual reference receiver.

Runs only when GYPSUM_REFERENCE_ORACLE=1 (it synthesizes a capture and runs
the pure-numpy reference for ~40 s of signal — several minutes of wall
clock) and /root/reference is mounted. The fast path for this check is
``python tools/compare_vs_reference.py`` (see its module docstring)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

_REPO = Path(__file__).parent.parent
_REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    os.environ.get("GYPSUM_REFERENCE_ORACLE") != "1" or not _REFERENCE.exists(),
    reason="set GYPSUM_REFERENCE_ORACLE=1 (and mount /root/reference) to run "
    "the multi-minute reference-oracle comparison",
)


def test_nav_decode_bit_exact_vs_reference(tmp_path):
    cap = tmp_path / "oracle_cap.bin"
    synth = subprocess.run(
        [sys.executable, "-m", "gypsum_tpu", "synth", "--out", str(cap),
         "--duration", "40", "--noise", "0.3"],
        cwd=_REPO, capture_output=True, text=True, timeout=600,
    )
    assert synth.returncode == 0, synth.stderr[-2000:]
    cmp_run = subprocess.run(
        [sys.executable, str(_REPO / "tools" / "compare_vs_reference.py"), str(cap), "40"],
        cwd=_REPO, capture_output=True, text=True, timeout=900,
    )
    assert cmp_run.returncode == 0, (cmp_run.stdout + cmp_run.stderr)[-3000:]
    assert ("ALL MATCHED FIELDS BIT-EXACT" in cmp_run.stdout
            or "OUR DECODE IS BIT-EXACT TO TRUTH" in cmp_run.stdout), cmp_run.stdout[-3000:]
    # rc==0 already implies the fix criterion passed when the reference
    # reached a fix; assert the comparison actually ran (BASELINE contract
    # is decode AND fix).
    assert "FIX COMPARISON" in cmp_run.stdout, cmp_run.stdout[-3000:]
