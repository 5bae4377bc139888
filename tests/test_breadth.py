"""Generator determinism for the breadth sweep (tools/breadth_check.py,
the analogue of the reference's 113-query JOB validation,
test_job_queries.sh:256).

The committed BREADTH artifact is reproducible evidence only if the
generated statement list is a pure function of the fixed seed — these
tests pin the subset census and the seeded SQL text, no Spark needed.
"""

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from breadth_check import build_query, connected_subsets  # noqa: E402


def test_subset_census():
    subs = connected_subsets()
    # 12 connected table subsets x nation/region path expansions = 40
    assert len(subs) == 40
    assert ["lineitem"] in subs
    # both nation paths present => alias self-join shape is generated
    assert any("n1" in s and "n2" in s for s in subs)
    # customer never appears without orders (its only path to lineitem)
    assert all("orders" in s for s in subs if "customer" in s)


def test_generator_deterministic():
    subs = connected_subsets()
    qs1 = [build_query(t, random.Random(7)) for t in subs]
    qs2 = [build_query(t, random.Random(7)) for t in subs]
    assert qs1 == qs2
    for t, q in zip(subs, qs1):
        assert q.startswith("SELECT ")
        assert "FROM lineitem" in q
        # every non-lineitem instance contributes exactly one equi-join
        # conjunct => the graph is join-complete, never a cross product
        assert q.count(" = ") >= len(t) - 1
    # the self-join variants actually alias nation twice
    both = [q for t, q in zip(subs, qs1) if "n1" in t and "n2" in t]
    assert both and all("nation n1" in q and "nation n2" in q
                        for q in both)
