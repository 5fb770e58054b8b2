"""Driver-gate serialization contract (the r3 kg12 lesson).

The driver's correctness gate canonicalizes each query's result rows with
pandas sort/factorize, which raises on array/map/struct cells. kg12 shipped
red in r3 because only the lenient local gate (str(v)) ran before the
driver. This test builds every registered query's DataFrame at sf0.001 and
asserts no complex top-level column survives — schema analysis alone is
enough to catch the violation, and it runs in the normal pytest sweep, so
the divergence between the two gates can't ship again
(plans/registry.py docstring = the contract; VERDICT r3 item 3).
"""

from __future__ import annotations

import btc_blockchain_scanner_spark.plans as plans
from btc_blockchain_scanner_spark.plans.registry import complex_toplevel_columns


def test_no_complex_toplevel_columns(spark, sf_dir):
    bad: dict[str, list[str]] = {}
    for name, fn in plans.queries().items():
        df = fn(spark, sf_dir)
        cols = complex_toplevel_columns(df.schema)
        if cols:
            bad[name] = cols
    assert not bad, (
        f"queries emit driver-unhashable complex top-level columns: {bad} — "
        "serialize with concat_ws/to_json (see plans/registry.py)"
    )
