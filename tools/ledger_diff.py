"""Diff two shuffle ledgers — the standing bench adjudicator.

BENCH_r11 landed +66% on pure neighbor load while the shuffle ledger was
bit-identical; the judge settled it with three instruments (VERDICT r11).
This tool makes that adjudication one command: diff the committed ledger
of record (LEDGER_r{N}_sf0.1.jsonl) against a fresh run. The contract:

- ``shuffleRecordsWritten`` is the REGRESSION KEY: exactly reproducible
  for a given (plan, data) pair, so ANY movement means the plan really
  does different work — a finding, never load.
- ``shuffleBytesWritten`` is a 1% sanity band: stable modulo compression
  framing. Movement beyond the band with flat records is worth a look
  (payload width changed) but is reported as a warning, not a failure.
- ``spillSize`` must stay 0 suite-wide (the zero-spill invariant);
  a row that starts spilling fails the diff.
- ``peakMemory`` / ``out_rows`` are carried for context only (peak is
  sized by partition count; out_rows mismatches already fail parity).

Adjudication rule (also in the verify skill): bench seconds moved +
ledger records flat = load — cite the ledger and move on. Records moved
= a real plan change — find the commit.

Usage: python tools/ledger_diff.py [--subset] OLD.jsonl NEW.jsonl
Prints one line per moved row and a summary; exit 1 if any row's
records moved, spill appeared, or the query sets differ. ``--subset``
(VERDICT r12 #7) adjudicates a TARGETED re-run: the NEW ledger may
cover only some of OLD's rows (rows missing from NEW are reported as
skipped, not failed) — rows present only in NEW still fail, since a
row the committed ledger never saw has no baseline to diff against.
"""

from __future__ import annotations

import json
import sys

BYTES_BAND = 0.01  # compression-framing tolerance on shuffleBytesWritten


def load_ledger(path: str) -> dict[str, dict]:
    rows: dict[str, dict] = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            if row.get("query") == "__total__":
                continue
            rows[row["query"]] = row
    if not rows:
        raise ValueError(f"ledger_diff: no query rows in {path}")
    return rows


def diff_ledgers(
    old: dict[str, dict], new: dict[str, dict], subset: bool = False
) -> tuple[list[str], list[str]]:
    """Returns (failures, warnings). Empty failures = the plans do the
    same work; seconds deltas between the two runs are load. With
    ``subset``, NEW covering only part of OLD is the documented
    targeted-re-run workflow, not a failure."""
    failures: list[str] = []
    warnings: list[str] = []
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        if subset:
            warnings.append(
                f"{len(only_old)} OLD row(s) not re-run (subset mode)"
            )
        else:
            failures.append(f"rows only in OLD ledger: {only_old}")
    if only_new:
        failures.append(f"rows only in NEW ledger: {only_new}")
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        if o["shuffleRecordsWritten"] != n["shuffleRecordsWritten"]:
            failures.append(
                f"{name}: records {o['shuffleRecordsWritten']} -> "
                f"{n['shuffleRecordsWritten']} (plan does different work)"
            )
        if n.get("spillSize", 0):
            failures.append(f"{name}: SPILLS ({n['spillSize']} bytes)")
        ob, nb = o["shuffleBytesWritten"], n["shuffleBytesWritten"]
        band = max(BYTES_BAND * max(ob, nb), 64)  # floor for tiny rows
        if abs(ob - nb) > band:
            warnings.append(
                f"{name}: bytes {ob} -> {nb} "
                f"({(nb - ob) / max(ob, 1):+.1%}, records "
                f"{'flat' if o['shuffleRecordsWritten'] == n['shuffleRecordsWritten'] else 'MOVED'})"
            )
        if o.get("out_rows") != n.get("out_rows"):
            warnings.append(
                f"{name}: out_rows {o.get('out_rows')} -> {n.get('out_rows')}"
                " (parity will adjudicate)"
            )
    return failures, warnings


def main() -> int:
    args = sys.argv[1:]
    subset = "--subset" in args
    if subset:
        args.remove("--subset")
    if len(args) != 2:
        sys.exit("usage: ledger_diff.py [--subset] OLD.jsonl NEW.jsonl")
    old = load_ledger(args[0])
    new = load_ledger(args[1])
    failures, warnings = diff_ledgers(old, new, subset=subset)
    for f in failures:
        print(f"MOVED {f}")
    for w in warnings:
        print(f"warn  {w}")
    if failures:
        print(f"ledger_diff: {len(failures)} row(s) moved — real plan change")
        return 1
    print(
        f"ledger_diff: {len(new)} rows, records identical"
        + (f", {len(warnings)} byte-band warning(s)" if warnings else "")
        + " — any seconds delta between these runs is load"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
