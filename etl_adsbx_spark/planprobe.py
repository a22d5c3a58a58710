"""Step-plan probe for checkpoint-truncated iterative operators.

``localCheckpoint`` cuts lineage, so the executed plan of an iterative
operator (pagerank, HITS, MMR, the CC fixpoint) reads as a handful of
post-checkpoint scans — the loop body's joins and aggregations are
invisible to the PLANS.md plan lint (round-8 verdict, What's-wrong #2:
``domain_pagerank`` showed "0 exchanges" purely because the lint read
the post-checkpoint plan). Iterative operators therefore announce each
step's DataFrame here BEFORE checkpointing; when a collector is
installed (scripts/dump_plans.py's per-step table, the
tests/test_scale_techniques.py step lint) the step plan is captured,
otherwise the call is a zero-cost no-op — production runs never plan or
execute anything extra.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_hook: Callable[[str, str, Any], None] | None = None


def set_step_plan_hook(
    fn: Callable[[str, str, Any], None] | None,
) -> Callable[[str, str, Any], None] | None:
    """Install (or clear, with None) the step collector. The callable
    receives ``(operator, step, df)`` per iteration — e.g.
    ``("pagerank", "iter3", <rank frame before checkpoint>)``. Returns
    the previously installed hook so callers can restore it."""
    global _hook
    prev, _hook = _hook, fn
    return prev


def probe_step(op: str, step: str, df: Any) -> None:
    """Called by iterative operators with each step's pre-checkpoint
    DataFrame. No-op unless a collector is installed."""
    if _hook is not None:
        _hook(op, step, df)


def pin(op: str, step: str, df: Any) -> Any:
    """Announce a shared frame's pre-checkpoint plan to the probe, then
    pin it with a LAZY ``localCheckpoint`` — the shared-subtree
    materialization idiom (an expensive frame consumed by N plan
    references is computed once and every consumer reads blocks instead
    of re-expanding the subtree). Routing every such pin through here
    keeps the checkpoint-hidden subtree visible to PLANS.md and the
    plan lints (round-8 verdict: truncated plans must stay auditable);
    with no collector installed the probe is a zero-cost no-op and this
    is exactly ``df.localCheckpoint(eager=False)``."""
    probe_step(op, step, df)
    return df.localCheckpoint(eager=False)


def physical_plan(df: Any) -> str:
    """The planned physical tree of an un-executed DataFrame (AQE initial
    plan — shape counts are what the lint reads; runtime re-plans only
    tighten them)."""
    return df._jdf.queryExecution().executedPlan().toString()
