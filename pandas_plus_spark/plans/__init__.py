"""Physical-plan introspection and scale linting.

The repo's design contract is that every operator compiles to a plan that
survives a 100× scale-up (PLANS.md is the hand-audited evidence). This
package turns that audit into an API: :func:`plan_stats` summarizes the
physical plan's scale-relevant features, :func:`lint` flags the known
scale anti-patterns, and :func:`assert_scalable` makes the check a
one-line test/CI gate.
"""

from .lint import (  # noqa: F401
    Finding,
    assert_scalable,
    explain_report,
    lint,
    plan_stats,
    plan_text,
)

__all__ = [
    "Finding",
    "assert_scalable",
    "explain_report",
    "lint",
    "plan_stats",
    "plan_text",
]
