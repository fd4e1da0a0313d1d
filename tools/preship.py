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


def _tree_state() -> tuple[str, list[str]]:
    """(diff_md5, untracked). ADVICE r13: ``git diff HEAD`` misses
    untracked files, so a stamp could read 'clean' while a new untracked
    test/conftest/tool changed what the suite actually ran against. The
    digest therefore covers the tracked diff PLUS the name+content of
    every untracked non-ignored file; the untracked list is recorded in
    the stamp so a judge sees exactly what the 'diff' was."""
    _, diff = _run(["git", "diff", "HEAD"])
    _, status = _run(["git", "status", "--porcelain"])
    untracked = sorted(
        line[3:] for line in status.splitlines() if line.startswith("?? ")
    )
    h = hashlib.md5(diff.encode())
    for path in untracked:
        h.update(path.encode())
        full = os.path.join(REPO, path)
        try:
            if os.path.isdir(full):
                for root, _dirs, files in os.walk(full):
                    for f in sorted(files):
                        with open(os.path.join(root, f), "rb") as fh:
                            h.update(fh.read())
            else:
                with open(full, "rb") as fh:
                    h.update(fh.read())
        except OSError:
            h.update(b"<unreadable>")
    dirty = bool(diff) or bool(untracked)
    return (h.hexdigest() if dirty else "", untracked)


def main() -> int:
    rows = sys.argv[1:]
    _, head = _run(["git", "rev-parse", "HEAD"])
    diff_md5, untracked = _tree_state()
    stamp = {
        "head": head.strip(),
        "diff_md5": diff_md5,
        "untracked": untracked,
        "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    if diff_md5:
        print("preship: WARNING — uncommitted/untracked changes "
              f"({len(untracked)} untracked); stamp covers them only if "
              "nothing else changes before the snapshot commit")

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
