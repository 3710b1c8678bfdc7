"""Contract-ordering guarantees (VERDICT r1 "Next round" §2).

The external driver walks ``queries()`` in dict-insertion order and its
correctness window may be capped (round 1: first 50 entries only).
These tests pin that the 97 SURVEY §2 operators are the head of the
registry, so any capped driver run covers the binding contract first.
"""

from __future__ import annotations

import datalakecrawler_spark as dlc
from datalakecrawler_spark.contract import CONTRACT

# §2 rows where the inventory designates a weaker rows-only check.
# Round 3 emptied the set: the three approx-sketch ops carry
# exact-value + within-tolerance content oracles (VERDICT r2
# Next-round §3) and json_schema_infer hashes its neutralized schema,
# so all 97 contract operators are oracle-backed.
ROWS_ONLY_OK: set[str] = set()


def test_contract_is_97():
    assert len(CONTRACT) == 97
    assert len(set(CONTRACT)) == 97


def test_contract_names_all_registered():
    registered = set(dlc.registry.all_queries())
    missing = [n for n in CONTRACT if n not in registered]
    assert not missing, f"contract operators not registered: {missing}"


def test_contract_registers_first_in_inventory_order():
    head = list(dlc.registry.all_queries())[: len(CONTRACT)]
    assert head == list(CONTRACT), (
        "registry head is not the SURVEY §2 contract in inventory order; "
        f"first divergence at index "
        f"{next(i for i, (a, b) in enumerate(zip(head, CONTRACT)) if a != b)}"
    )


def test_entry_exports_match_registry_order():
    """__spark_entry__.queries() must present the same contract-first
    order the registry pins (dicts preserve insertion order)."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    assert names[: len(CONTRACT)] == list(CONTRACT)


def test_contract_oracle_coverage():
    """Every contract op has an oracle unless §2 designates rows-only."""
    qs = dlc.registry.all_queries()
    missing_oracle = [
        n for n in CONTRACT if qs[n].oracle is None and n not in ROWS_ONLY_OK
    ]
    assert not missing_oracle, missing_oracle
