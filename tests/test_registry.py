"""Registry invariants for the driver's correctness gate.

The driver checks exactly ``queries()[:50]`` (verified by the round-2
judge), so every oracle-backed query MUST occupy a position < 50 and
rows-only queries must not displace one.
"""

import __spark_entry__ as entry_mod


def test_every_oracled_query_inside_driver_window():
    names = list(entry_mod.queries())
    oracled = set(entry_mod.oracle_sql())
    beyond = [n for n in names[50:] if n in oracled]
    assert not beyond, f"oracle-backed queries outside the window: {beyond}"


def test_oracle_keys_subset_of_queries():
    names = set(entry_mod.queries())
    missing = set(entry_mod.oracle_sql()) - names
    assert not missing, f"oracle_sql keys with no queries() entry: {missing}"


def test_rows_only_tail():
    """Rows-only entries come after every oracled entry (no wasted
    window slots), except none should precede an oracled one."""
    names = list(entry_mod.queries())
    oracled = set(entry_mod.oracle_sql())
    last_oracled = max(i for i, n in enumerate(names) if n in oracled)
    rows_before = [n for n in names[:last_oracled] if n not in oracled]
    assert not rows_before, (
        f"rows-only queries displace oracled ones in the window: "
        f"{rows_before}")
