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


class DiffResult:
    """Row-level diff outcome (VERDICT r13 #3). Unpacks as the legacy
    ``(failures, warnings)`` 2-tuple; the extra attributes give main()
    exact ROW counts so the summary can't conflate a 3-row additive
    group with one moved row, and report additive rows (only in NEW —
    adjudicate as HEADLINE growth) distinctly from record movement."""

    def __init__(self) -> None:
        self.failures: list[str] = []
        self.warnings: list[str] = []
        self.moved_rows: list[str] = []  # records moved — real plan change
        self.spilled_rows: list[str] = []  # zero-spill invariant broken
        self.only_old: list[str] = []  # missing from NEW (set drift)
        self.only_new: list[str] = []  # additive — no baseline to diff

    def __iter__(self):
        return iter((self.failures, self.warnings))


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
) -> DiffResult:
    """Returns a DiffResult (unpacks as the legacy ``(failures,
    warnings)``). Empty failures = the plans do the same work; seconds
    deltas between the two runs are load. With ``subset``, NEW covering
    only part of OLD is the documented targeted-re-run workflow, not a
    failure."""
    res = DiffResult()
    res.only_old = sorted(set(old) - set(new))
    res.only_new = sorted(set(new) - set(old))
    if res.only_old:
        if subset:
            res.warnings.append(
                f"{len(res.only_old)} OLD row(s) not re-run (subset mode)"
            )
        else:
            res.failures.append(f"rows only in OLD ledger: {res.only_old}")
    if res.only_new:
        res.failures.append(
            f"rows only in NEW ledger: {res.only_new} "
            "(no baseline — adjudicate as HEADLINE growth if intentional)"
        )
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        if o["shuffleRecordsWritten"] != n["shuffleRecordsWritten"]:
            res.moved_rows.append(name)
            res.failures.append(
                f"{name}: records {o['shuffleRecordsWritten']} -> "
                f"{n['shuffleRecordsWritten']} (plan does different work)"
            )
        if n.get("spillSize", 0):
            res.spilled_rows.append(name)
            res.failures.append(f"{name}: SPILLS ({n['spillSize']} bytes)")
        ob, nb = o["shuffleBytesWritten"], n["shuffleBytesWritten"]
        band = max(BYTES_BAND * max(ob, nb), 64)  # floor for tiny rows
        if abs(ob - nb) > band:
            res.warnings.append(
                f"{name}: bytes {ob} -> {nb} "
                f"({(nb - ob) / max(ob, 1):+.1%}, records "
                f"{'flat' if o['shuffleRecordsWritten'] == n['shuffleRecordsWritten'] else 'MOVED'})"
            )
        if o.get("out_rows") != n.get("out_rows"):
            res.warnings.append(
                f"{name}: out_rows {o.get('out_rows')} -> {n.get('out_rows')}"
                " (parity will adjudicate)"
            )
        # peakMemory is context-only, but its drift must be ADJUDICATED,
        # not silently skipped (VERDICT r14 item 5: the 26 MB -> 1.29 GB
        # dup_components move was the r14 capture-mode switch —
        # isolated/AQE-off runs every consumer at the full declared
        # partition count and peak sums fixed per-task reservations).
        # Rows now record their capture mode; cross-mode peaks are NOT
        # comparable and say so, same-mode peaks get a wide 2x band.
        om, nm = o.get("capture"), n.get("capture")
        op, np_ = o.get("peakMemory", 0), n.get("peakMemory", 0)
        if om is not None and nm is not None and om != nm:
            res.warnings.append(
                f"{name}: capture mode {om} -> {nm} — peakMemory/bytes "
                "not comparable across modes"
            )
        elif (om == nm or om is None) and max(op, np_) > 0:
            if max(op, np_) > 2 * max(min(op, np_), 1):
                res.warnings.append(
                    f"{name}: peakMemory {op} -> {np_} "
                    f"(same capture mode{'' if om else ' assumed'}; "
                    "task-count/operator change — context only)"
                )
    return res


def summary_line(res: DiffResult, n_new_rows: int) -> str:
    """One honest line, counting ROWS per category (VERDICT r13 #3) —
    never failure-string groups, and never 'moved' for rows that are
    merely additive or missing."""
    if not res.failures:
        return (
            f"ledger_diff: {n_new_rows} rows, records identical"
            + (
                f", {len(res.warnings)} byte-band warning(s)"
                if res.warnings
                else ""
            )
            + " — any seconds delta between these runs is load"
        )
    parts = []
    if res.moved_rows:
        parts.append(f"{len(res.moved_rows)} row(s) moved — real plan change")
    if res.spilled_rows:
        parts.append(f"{len(res.spilled_rows)} row(s) spilling")
    if res.only_new:
        parts.append(
            f"{len(res.only_new)} row(s) only in NEW "
            "(additive — adjudicate as HEADLINE growth)"
        )
    if res.only_old and any("only in OLD" in f for f in res.failures):
        parts.append(f"{len(res.only_old)} row(s) only in OLD (set drift)")
    return "ledger_diff: " + "; ".join(parts)


def main() -> int:
    args = sys.argv[1:]
    subset = "--subset" in args
    if subset:
        args.remove("--subset")
    if len(args) != 2:
        sys.exit("usage: ledger_diff.py [--subset] OLD.jsonl NEW.jsonl")
    old = load_ledger(args[0])
    new = load_ledger(args[1])
    res = diff_ledgers(old, new, subset=subset)
    for f in res.failures:
        tag = "ADDED" if "only in NEW" in f else "MOVED"
        print(f"{tag} {f}")
    for w in res.warnings:
        print(f"warn  {w}")
    print(summary_line(res, len(new)))
    return 1 if res.failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
