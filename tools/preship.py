"""Pre-snapshot gate — the process pin from VERDICT r12 item 2.

Round 12's end-of-round snapshot commit shipped a plan rewrite AFTER the
last recorded full-suite run, so the recorded "343 passed at HEAD" was
false at actual HEAD. This tool makes that impossible to do silently:

1. records the EXACT tree being tested: ``git rev-parse HEAD`` plus an
   md5 of ``git diff HEAD`` (empty diff = the commit itself was tested;
   non-empty = the stamp names the uncommitted delta it covered);
2. runs the full pytest suite;
3. optionally runs ``tools/parity.py`` on named touched rows;
4. writes ``PRESHIP.json`` with the tree identity and results.

Discipline: commit all work, run ``python tools/preship.py [row ...]``,
then commit PRESHIP.json as the final stamp-only commit. A later judge
can check the stamp's ``head`` is the parent of the stamp commit and
``diff_md5`` is empty — i.e. nothing changed after the suite ran. Any
code change after the stamp invalidates it by construction.

Exit 0 only if the suite (and any parity rows) passed.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], timeout: int | None = None) -> tuple[int, str]:
    p = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
    )
    return p.returncode, p.stdout + p.stderr


def main() -> int:
    rows = sys.argv[1:]
    _, head = _run(["git", "rev-parse", "HEAD"])
    _, diff = _run(["git", "diff", "HEAD"])
    stamp = {
        "head": head.strip(),
        "diff_md5": hashlib.md5(diff.encode()).hexdigest() if diff else "",
        "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    if diff:
        print("preship: WARNING — uncommitted changes; stamp covers them "
              "only if nothing else changes before the snapshot commit")

    t0 = time.time()
    code, out = _run([sys.executable, "-m", "pytest", "tests/", "-q",
                      "-p", "no:cacheprovider"])
    tail = "\n".join(out.strip().splitlines()[-3:])
    stamp["pytest"] = {"exit": code, "tail": tail,
                       "sec": round(time.time() - t0, 1)}
    print(tail)
    ok = code == 0

    if rows and ok:
        t0 = time.time()
        code, out = _run(
            [sys.executable, "tools/parity.py", "/root/testdata/sf0.01", *rows]
        )
        tail = "\n".join(out.strip().splitlines()[-2:])
        stamp["parity"] = {"exit": code, "rows": rows, "tail": tail,
                           "sec": round(time.time() - t0, 1)}
        print(tail)
        ok = code == 0

    stamp["ok"] = ok
    with open(os.path.join(REPO, "PRESHIP.json"), "w") as fh:
        json.dump(stamp, fh, indent=1)
    print(f"preship: {'OK' if ok else 'FAILED'} — stamp written for "
          f"{stamp['head'][:12]} (diff_md5={stamp['diff_md5'] or 'clean'})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
