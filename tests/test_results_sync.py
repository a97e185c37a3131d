"""RESULTS.md table hygiene: every script-generated table must match its
committed JSON artifact (round-3 verdict item 8 — the crown table slipped
through hand transcription; this makes that class of error a test failure)."""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_results_tables_in_sync():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, 'scripts/gen_results_tables.py'),
         '--check'], capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
