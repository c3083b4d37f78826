"""PLANS.md staleness guard: the committed plan audit must cover
exactly the current queries() set (minus the documented streaming
skip). Catches the add-a-query-forget-to-re-audit failure mode without
needing a SparkSession."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plans_md_covers_every_query():
    import __spark_entry__ as entry
    from scripts.audit_plans import SKIP

    with open(os.path.join(ROOT, "PLANS.md")) as fh:
        md = fh.read()
    audited = set(re.findall(r"^\| (q\d+\w+) \|", md, re.MULTILINE))
    expected = set(entry.queries()) - SKIP
    missing = expected - audited
    stale = audited - expected
    assert not missing, f"PLANS.md missing queries (rerun audit): {missing}"
    assert not stale, f"PLANS.md lists removed queries: {stale}"


def test_plans_md_has_no_red_flags():
    with open(os.path.join(ROOT, "PLANS.md")) as fh:
        md = fh.read()
    flags = md.split("## Red flags", 1)[1].split("##", 1)[0]
    assert "(none)" in flags, f"plan audit red flags present:\n{flags}"
