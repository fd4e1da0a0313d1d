"""Smoke pin for tools/shuffle_ledger.py — the load-independent
regression instrument (SCALE.md r11). Guards the jvmseam-style metric
walk against PySpark renames and pins the two properties the protocol
relies on: records are exactly reproducible, and the bench-SF suite
never spills."""
import sys

sys.path.insert(0, "/root/repo/tools")


def test_ledger_deterministic_and_spill_free(spark):
    from shuffle_ledger import KEYS, ledger_for

    from mbgspark.plans.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    a = ledger_for(CATALOG["q12"][0](spark, sf))
    b = ledger_for(CATALOG["q12"][0](spark, sf))
    for k in KEYS:
        assert k in a
    # a join+projection MUST shuffle something, exactly the same twice
    assert a["shuffleRecordsWritten"] > 0
    assert a["shuffleRecordsWritten"] == b["shuffleRecordsWritten"]
    # bytes are compression-framed: task packing can shift them a few
    # dozen bytes between in-session reruns (observed 21 B on 33 kB);
    # RECORDS are the exact regression key, bytes the ~1% sanity band
    assert abs(a["shuffleBytesWritten"] - b["shuffleBytesWritten"]) <= max(
        64, a["shuffleBytesWritten"] // 100
    )
    assert a["spillSize"] == 0
    assert a["out_rows"] == b["out_rows"] > 0

    # a pure scan→projection row shuffles NOTHING (the q1 shape)
    z = ledger_for(CATALOG["q1"][0](spark, sf))
    assert z["shuffleRecordsWritten"] == 0 and z["spillSize"] == 0
