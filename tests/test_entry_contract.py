"""Driver-contract shape guards (no Spark session): the external
harness consumes `__spark_entry__.{entry, queries, oracle_sql}` and
`bench.py` — drift between those surfaces (a query without an oracle,
a bench row without a query) silently weakens the correctness gate,
so pin the relationships here."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
import bench  # noqa: E402


def test_every_query_has_an_oracle():
    qs, oracles = E.queries(), E.oracle_sql()
    assert qs, "queries() empty"
    assert set(oracles) == set(qs), (
        "queries() and oracle_sql() keys diverged: "
        f"only-query={sorted(set(qs) - set(oracles))} "
        f"only-oracle={sorted(set(oracles) - set(qs))}"
    )
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip().upper().startswith(
            ("WITH", "SELECT")
        ), name


def test_bench_subset_is_a_subset_of_queries():
    qs = set(E.queries())
    missing = [n for n in bench.QUERY_SUBSET if n not in qs]
    assert not missing, f"bench rows without queries(): {missing}"


def test_entry_is_exported():
    assert callable(E.entry)
