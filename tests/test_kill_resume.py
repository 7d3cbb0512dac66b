"""Kill-and-resume: SIGKILL a build_kg run mid-flight, resume, and verify the
final output equals a clean run's (SURVEY.md §7.2-6)."""

import glob
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq
import pytest

CORPUS = "/tmp/kill_resume_corpus"
OUT_KILLED = "/tmp/kill_resume_out"
OUT_CLEAN = "/tmp/kill_resume_clean"

BUILD_SNIPPET = """
import sys, ray
sys.path.insert(0, "/root/repo")
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from dygiepp_ray.pipelines.kg import build_kg
res = build_kg({corpus!r}, {out!r}, n_buckets=8, concurrency=(1, 2))
print("DONE", res["written_buckets"], res["skipped_buckets"])
ray.shutdown()
"""


def _run_build(out_dir: str, kill_after: float | None = None) -> bool:
    """Run build_kg in a subprocess; optionally SIGKILL it. Returns True if
    the process completed."""
    code = BUILD_SNIPPET.format(corpus=CORPUS, out=out_dir)
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True)
    if kill_after is None:
        proc.wait(timeout=300)
        return proc.returncode == 0
    time.sleep(kill_after)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
        return False
    return proc.returncode == 0


def _rows(out_dir: str) -> int:
    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(out_dir, "bucket=*", "*.parquet"))
    )


def test_kill_mid_build_then_resume_matches_clean():
    import shutil

    from dygiepp_ray.corpus import write_corpus

    for d in (CORPUS, OUT_KILLED, OUT_CLEAN):
        shutil.rmtree(d, ignore_errors=True)
    write_corpus(CORPUS, n_files=400, seed=11, n_shards=8)

    # clean reference run
    assert _run_build(OUT_CLEAN)
    clean_rows = _rows(OUT_CLEAN)
    assert clean_rows > 0

    # killed run: SIGKILL while the pipeline is (very likely) mid-flight
    completed = _run_build(OUT_KILLED, kill_after=6.0)
    # resume (possibly several times — idempotent either way) until done
    for _ in range(3):
        if _run_build(OUT_KILLED):
            break
    else:
        pytest.fail("resume never completed")

    assert _rows(OUT_KILLED) == clean_rows
    # manifests cover all buckets exactly once
    manifests = glob.glob(os.path.join(OUT_KILLED, "_manifests", "bucket-*.json"))
    assert len(manifests) == 8
    # a second resume is a full no-op
    assert _run_build(OUT_KILLED)
    assert _rows(OUT_KILLED) == clean_rows
