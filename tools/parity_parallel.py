"""Parallel, timeout-guarded parity sweep for big SFs (NOTES_r6: the sf1
evidence run). The single-process sweep is oracle-bound at sf1 — one
DuckDB pair-pipeline oracle can grind for an hour at 10× data — so this
shards the catalog across worker subprocesses (each a fresh
``tools/parity.py <sf_dir> <queries...>`` with its own Spark session and
DuckDB), applies a wall-clock timeout per chunk, and retries a timed-out
chunk's queries individually with a shorter budget before recording
TIMEOUT. A TIMEOUT row means the ORACLE couldn't complete at this SF in
budget — not a wrong answer; the queries' correctness stands on their
green sf0.01 driver rows.

Usage: python tools/parity_parallel.py SF_DIR [workers] [chunk_timeout_s]
Writes one JSON line per query to stdout at the end.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
from queue import Queue

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mbgspark.plans.catalog import CATALOG

CHUNK = 6


def run_slice(sf_dir: str, names: list[str], timeout: float, cpus: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
    try:
        p = subprocess.run(
            [sys.executable, "tools/parity.py", sf_dir, *names],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    except subprocess.TimeoutExpired:
        return {n: "TIMEOUT" for n in names}
    out = {}
    for line in p.stdout.splitlines():
        line = line.strip()
        for tag in ("PASS", "FAIL", "ok?"):
            if line.startswith(tag + " "):
                parts = line.split()
                out[parts[1]] = tag
    for n in names:
        out.setdefault(n, "ERR")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    chunk_timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 1200.0
    names = list(CATALOG)
    chunks = [names[i : i + CHUNK] for i in range(0, len(names), CHUNK)]
    q: Queue = Queue()
    for c in chunks:
        q.put(c)
    results: dict[str, str] = {}
    lock = threading.Lock()

    def worker():
        while True:
            try:
                chunk = q.get_nowait()
            except Exception:
                return
            got = run_slice(sf_dir, chunk, chunk_timeout, cpus="8")
            retry = [n for n, v in got.items() if v in ("TIMEOUT", "ERR")]
            for n in retry:
                got.update(run_slice(sf_dir, [n], chunk_timeout / 2, cpus="8"))
            with lock:
                results.update(got)
                done = sum(len(v) for v in [results])
                print(
                    f"# {len(results)}/{len(names)} done "
                    f"({sum(1 for v in results.values() if v == 'PASS')} pass)",
                    file=sys.stderr, flush=True,
                )
            q.task_done()

    threads = [threading.Thread(target=worker, daemon=True) for _ in range(workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for n in names:
        print(json.dumps({"query": n, "status": results.get(n, "MISSING")}))
    bad = {n: v for n, v in results.items() if v not in ("PASS", "ok?")}
    print(f"# summary: {len(names) - len(bad)}/{len(names)} green; issues: {bad}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
