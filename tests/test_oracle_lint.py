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


def test_money_sums_are_decimal_exact():
    """Money sums must run in DECIMAL, not DOUBLE (catalog_core._money_sum).

    A double sum is order-dependent: at sf1 a per-nation revenue sum
    crossed the round(,2) half-cent boundary and flipped one cent vs the
    single-threaded oracle (region_nation_revenue). Lint every oracle's
    SQL for sum() applied directly to a raw money column — new queries
    must cast to DECIMAL(12,2) inside the sum on BOTH engines."""
    import re

    from mbgspark.plans.catalog import CATALOG

    money_cols = (
        "l_extendedprice|l_discount|l_tax|o_totalprice|c_acctbal|s_acctbal|value"
    )
    # sum( <money col or product of money cols> ... ) with no CAST inside
    pat = re.compile(rf"sum\(\s*({money_cols})\b", re.IGNORECASE)
    offenders = []
    for name, (_, sql) in CATALOG.items():
        if sql is None:
            continue
        for m in pat.finditer(sql):
            # allow sums the query feeds through an exact integer
            # micro-unit encoding (CAST(floor(x * 10^k + 0.5) AS BIGINT))
            prefix = sql[max(0, m.start() - 60) : m.start()]
            if "floor(" in prefix or "CAST(floor" in sql[m.start() : m.end() + 80]:
                continue
            offenders.append((name, m.group(0)))
    assert not offenders, (
        "oracle sums a raw double money column (order-dependent at scale); "
        f"cast to DECIMAL(12,2) inside the sum: {offenders}"
    )
