"""Dump formatted physical plans of the headline queries into PLANS.md.

Evidence artifact: shows PushedFilters / ReadSchema pruning / broadcast
joins / exchange placement for the plans the engine actually produces.

Usage: python tools/explain_all.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import re

_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")


def audit_single_partition(plan: str) -> tuple[int, int, list[str]]:
    """Count ``Exchange SinglePartition`` nodes in a formatted plan and
    classify each as BENIGN (the unavoidable final merge of a keyless
    global aggregate — its consumer is a ``*Aggregate`` with ``Keys: []``,
    moving a handful of partial-agg rows to one task) or NEEDS-REVIEW
    (anything else: a global sort/window funneling real data through one
    partition is the scale trap this audit exists to catch).

    Returns ``(total, benign, review_descriptions)``. VERDICT r11 flagged
    that the old audit printed only a boolean-ish claim ("zero
    single-partition exchanges") while PLANS.md carried 10 such nodes —
    all benign on manual inspection, but the wording overclaimed. This
    prints both numbers so it can't.

    The consumer is resolved by node id from the plan's tree-art header,
    not by positional adjacency of the detail blocks: when an Exchange
    is the last node of a join's left subtree, the next detail block is
    the right subtree's leaf, and positional adjacency would misreport a
    benign keyless-aggregate merge on that branch as NEEDS REVIEW
    (ADVICE r12)."""
    parents = _parent_map(plan)
    blocks = re.split(r"\n\n+", plan)
    by_id: dict[int, str] = {}
    for b in blocks:
        m = re.match(r"^\((\d+)\) ", b)
        if m:
            by_id[int(m.group(1))] = b
    total = benign = 0
    review: list[str] = []
    for b in blocks:
        m = re.search(r"^\((\d+)\) Exchange", b, re.M)
        if not m:
            continue
        if "Arguments: SinglePartition" not in b:
            continue
        total += 1
        pid = parents.get(int(m.group(1)))
        if pid is not None and pid in by_id:
            nxt = by_id[pid]
            head = nxt.splitlines()[0]
            if any(a in head for a in _AGG_NODES) and re.search(
                r"^Keys: \[\]", nxt, re.M
            ):
                benign += 1
            else:
                review.append(head.strip())
        else:
            # Consumer unresolvable from the tree header (node id missing
            # a detail block, or an operator name outside the tree-line
            # regex charset): NEVER silently fall back to positional
            # adjacency — that is the exact misclassification heuristic
            # this resolver replaced (ADVICE r13). Flag for human review.
            review.append(
                f"<unresolved consumer of Exchange({m.group(1)}) — "
                "NEEDS REVIEW (tree header unparsable)>"
            )
    return total, benign, review


def _parent_map(plan: str) -> dict[int, int]:
    """``node id -> consumer (parent) node id``, parsed from the
    tree-art header(s) of a formatted explain. A node's parent is the
    nearest preceding tree line drawn at a shallower indent; every
    tree's root sits at indent 0, so a new section (main plan, each
    subquery) naturally clears the stack."""
    parents: dict[int, int] = {}
    stack: list[tuple[int, int]] = []  # (indent, node id)
    for line in plan.splitlines():
        m = re.match(r"^([ :+\-]*)(?:\* )?[A-Za-z][\w .\-]*\((\d+)\)\s*$", line)
        if m is None:
            continue
        depth, nid = len(m.group(1)), int(m.group(2))
        while stack and stack[-1][0] >= depth:
            stack.pop()
        if stack:
            parents[nid] = stack[-1][1]
        stack.append((depth, nid))
    return parents


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from bench import HEADLINE
    from dataflow_pubsub_message_encryption_spark.operators import registry
    from dataflow_pubsub_message_encryption_spark.plans import formatted_plan
    from dataflow_pubsub_message_encryption_spark.session import get_session

    queries, _ = registry()
    spark = get_session("explain", cpus=8)

    body: list[str] = []
    total_sp = total_benign = 0
    all_review: list[str] = []
    per_plan: list[str] = []
    for label, key in HEADLINE:
        plan = formatted_plan(queries[key](spark, sf_dir))
        t, b, review = audit_single_partition(plan)
        total_sp += t
        total_benign += b
        all_review += [f"{label}: {r}" for r in review]
        if t:
            per_plan.append(
                f"{label} {t} ({'all keyless-agg merges' if b == t else f'{b} benign, {t - b} NEEDS REVIEW'})"
            )
        body += [f"## {label} (`{key}`)", "", "```", plan.rstrip(), "```", ""]

    summary = (
        f"SinglePartition exchange audit: {total_sp} total, "
        f"{total_benign} benign keyless-aggregate final merges "
        f"(few partial-agg rows -> 1 row; the unavoidable, scale-safe "
        f"pattern), {total_sp - total_benign} needing review"
        + (f" — {'; '.join(all_review)}" if all_review else "")
        + ". Per plan: "
        + ("; ".join(per_plan) if per_plan else "none")
        + "."
    )
    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        f"Generated by `python tools/explain_all.py {sf_dir}` "
        "(AQE on; initial plans shown — AQE may further coalesce at runtime).",
        "",
        summary,
        "",
    ] + body
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINE)} plans)")
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()
