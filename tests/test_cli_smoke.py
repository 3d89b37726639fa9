"""End-to-end CLI smoke: the installed entry surface, as a user runs it.

Runs ``python -m cald_tpu.cli.main`` in a clean subprocess (forced-CPU so it
works on any box) against a synthetic VOC tree with the tiny config, and
checks the per-cycle JSON summary on stdout. Complements the API-level AL-loop
tests — this is the only test that exercises argv -> config -> driver ->
printed history as one artifact.
"""

import json
import os
import subprocess
import sys

import pytest

from tests.fixtures import make_voc


@pytest.mark.slow
def test_cli_main_end_to_end(tmp_path):
    root = make_voc(tmp_path / "voc", num_images=8, seed=5)
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.update(JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "cald_tpu.cli.main",
         "--dataset", "voc2007", "--data-path", str(root),
         "--model", "faster", "--strategy", "cald", "--tiny",
         "--norm", "group", "--cycles", "2", "--epochs", "1",
         "-b", "2", "--init-num", "4", "--budget-num", "3",
         "--score-batch-size", "2", "-j", "2", "--min-size", "96",
         "--max-size", "128", "--max-boxes", "8",
         "--aspect-ratio-group-factor", "0"],
        env=env, capture_output=True, timeout=900)
    assert out.returncode == 0, out.stderr.decode()[-3000:]
    text = out.stdout.decode()
    start = text.index("[\n")
    history = json.loads(text[start:])
    assert [h["labeled"] for h in history] == [7, 7]
    assert "mAP" in history[0]["eval"]
