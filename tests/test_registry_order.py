"""Driver-adjudication-order contract (VERDICT.md round 1, Next round #2).

The driver hash-checks registry entries in iteration order and round 1
stopped after the first 50 — so the 50 oracle-checked SURVEY §2B keys must
occupy slots 1-50 exactly, and every §2B key must sit within the first 58.
"""

from omnidata_etl_spark.registry import _PRIORITY, all_specs


def test_priority_names_all_registered():
    specs = all_specs()
    assert all(n in specs for n in _PRIORITY)


def test_first_50_slots_are_oracle_checked_2b():
    specs = all_specs()
    first_50 = list(specs)[:50]
    assert first_50 == list(_PRIORITY[:50])
    for name in first_50:
        assert specs[name].oracle is not None, f"{name} lost its oracle"


def test_rows_only_2b_keys_in_slots_51_58():
    specs = all_specs()
    tail_8 = list(specs)[50:58]
    assert tail_8 == list(_PRIORITY[50:58])
    for name in tail_8:
        assert specs[name].oracle is None, (
            f"{name} gained an oracle — move it into the first-50 block"
        )


def test_oracle_checked_queries_precede_rows_only_after_priority():
    specs = all_specs()
    rest = list(specs)[58:]
    seen_rows_only = False
    for name in rest:
        if specs[name].oracle is None:
            seen_rows_only = True
        else:
            assert not seen_rows_only, (
                f"oracle-checked {name} sits after a rows-only query"
            )
