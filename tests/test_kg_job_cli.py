"""Smoke test for scripts/kg_job.py — the `ray job submit` entrypoint.

Runs the CLI in a subprocess on a tiny generated corpus (the script owns
its own ray session, so it must NOT run inside the test fixture session)
and asserts the one-line JSON report + idempotent resume."""

import json
import os
import subprocess
import sys


def test_kg_job_cli_runs_and_resumes(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "kg_out")

    gen = (
        "import sys; sys.path.insert(0, %r); "
        "from dygiepp_ray.corpus import write_corpus; "
        "write_corpus(%r, n_files=200, seed=7)" % (repo, corpus)
    )
    subprocess.run([sys.executable, "-c", gen], check=True, timeout=120)

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # the CLI owns a fresh local session

    def run():
        p = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "kg_job.py"),
             "--input", corpus, "--output", out,
             "--buckets", "4", "--concurrency", "2"],
            capture_output=True, text=True, timeout=300, env=env, cwd=repo)
        assert p.returncode == 0, p.stderr[-2000:]
        line = [l for l in p.stdout.strip().splitlines()
                if l.startswith("{")][-1]
        return json.loads(line)

    first = run()
    assert first["written_buckets"] == 4
    assert first["skipped_buckets"] == 0

    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/**/*.parquet')"
    ).fetchone()[0]
    assert n > 0

    second = run()  # idempotent: all buckets skip, rows unchanged
    assert second["written_buckets"] == 0
    assert second["skipped_buckets"] == 4
    assert second["fingerprint"] == first["fingerprint"]
    n2 = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/**/*.parquet')"
    ).fetchone()[0]
    assert n2 == n
