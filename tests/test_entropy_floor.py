"""The entropy-floor job must report a coherent triple: the engine's
measured density can never beat the order-0 floor by more than the frame
format's small-chunk overhead allows, and on the Zipf bench corpus it
should sit within ~15% of that floor (it measures 1.046x at bench scale;
tiny corpora carry proportionally more header overhead)."""
import os
import subprocess
import sys
import json

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def small_tokens(tmp_path_factory):
    sys.path.insert(0, REPO)
    from embulk_input_parquet_hadoop_spark.sources import datagen
    d = str(tmp_path_factory.mktemp("efloor"))
    datagen.generate(d, n_docs=5000, seed=7, n_files=1)
    return d


def test_entropy_floor_job(small_tokens):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "entropy_floor.py"),
         small_tokens],
        capture_output=True, text=True, check=True)
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["n_tokens"] > 0
    assert 0 < rep["h0_bytes_per_token"] < 8
    # engine density within [0.98x, 1.25x] of the order-0 floor: below
    # ~0.98 would mean the measurement is broken (order-0 codecs cannot
    # beat H0), far above 1.25 would mean the cascade regressed
    assert 0.98 <= rep["overhead_vs_h0"] <= 1.25
