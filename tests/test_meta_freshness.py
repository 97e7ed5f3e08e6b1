"""Meta-artifact freshness — the structural invariants VERDICT r6
flagged as having slipped (stale PLANS.md/COVERAGE.md/README counts,
rotated-out queries missing parity coverage). These assertions make the
scorecard mechanically unable to trail the registry again:

1. PLANS.md has exactly one scorecard row per registered query.
2. Every oracle-backed query OUTSIDE the 50-entry driver prefix has a
   tests/test_oracle_parity.py KEYS entry (nothing rotates out of
   driver verification without local value-checking).
3. COVERAGE.md and README.md headline counts match the registry.
"""
from __future__ import annotations

import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def registry():
    import __spark_entry__ as e

    return list(e.queries()), e.oracle_sql()


def test_plans_md_covers_every_query(registry):
    qs, _ = registry
    with open(os.path.join(ROOT, "PLANS.md")) as fh:
        text = fh.read()
    rows = set(re.findall(r"^\| ([a-z0-9_]+) \|", text, re.MULTILINE))
    rows.discard("query")  # header
    missing = [k for k in qs if k not in rows]
    extra = sorted(rows - set(qs))
    assert not missing, f"PLANS.md missing scorecard rows: {missing}"
    assert not extra, f"PLANS.md has rows for unregistered queries: {extra}"


def test_rotated_out_queries_stay_parity_checked(registry):
    qs, osql = registry
    from tests.test_oracle_parity import KEYS

    unknown = [k for k in KEYS if k not in qs]
    assert not unknown, f"parity KEYS reference unregistered queries: {unknown}"
    orphaned = [k for k in qs[50:] if k in osql and k not in KEYS]
    assert not orphaned, (
        "oracle-backed queries outside the 50-entry driver prefix must be "
        f"in test_oracle_parity.KEYS — missing: {orphaned}"
    )


def test_headline_counts_are_current(registry):
    qs, osql = registry
    n, n_oracle = len(qs), sum(1 for k in qs if k in osql)
    for fname in ("COVERAGE.md", "README.md"):
        with open(os.path.join(ROOT, fname)) as fh:
            text = fh.read()
        assert f"{n} registered queries" in text or f"({n} operators" in text, (
            f"{fname} headline count is stale: expected to mention "
            f"'{n} registered queries' (currently {n} total / {n_oracle} "
            f"oracle-backed)"
        )
