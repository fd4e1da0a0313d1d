"""DuckDB-only oracle hygiene gate — no Spark session needed, runs in
seconds, and pins the bug class that cost rounds 1 AND 2 a red driver row:
an oracle emitting a type Spark cannot represent (DuckDB integer ``sum()``
returns HUGEINT/int128 while Spark returns BIGINT — identical values,
different driver hash). Every oracle must DESCRIBE cleanly and carry only
Spark-representable output types."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_all_oracles_have_spark_representable_types():
    from tools.parity import lint_oracles

    assert lint_oracles("/root/testdata/sf0.001", set()) == 0
