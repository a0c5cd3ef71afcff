"""C7 depends_on / dynamic rules: a dependent rule runs only if its parent
fired somewhere in the run (two-pass semantics)."""

from __future__ import annotations

from sagan_spark.engine import pipeline
from sagan_spark.rules.model import ContentSpec, Rule, RuleSet


def _rs(parent_roles) -> RuleSet:
    return RuleSet(
        (
            Rule(
                sid=10,
                msg="parent",
                sink="fast",
                roles=parent_roles,
                contents=(ContentSpec("error"),),
            ),
            Rule(
                sid=11,
                msg="child (enabled only if parent fired)",
                sink="eve",
                contents=(ContentSpec("retry"),),
                depends_on=10,
            ),
        )
    )


def test_dependent_enabled_when_parent_fires(spark, tiny_path):
    res = pipeline.run_dynamic(spark, tiny_path, _rs(("assistant",)))
    assert res.sid_counts.get(10, 0) > 0
    assert res.sid_counts.get(11, 0) > 0


def test_dependent_disabled_when_parent_never_fires(spark, tiny_path):
    # parent restricted to a role that doesn't exist → child must not run,
    # even though 'retry' texts are plentiful
    res = pipeline.run_dynamic(spark, tiny_path, _rs(("nonexistent-role",)))
    assert res.sid_counts == {}
