#!/usr/bin/env python
"""Round-5 registry rotation (CHANGELOG_r04.md handoff step 1),
mechanized: reorder `queries()` / `oracle_sql()` in __spark_entry__.py
so the entries never hard-graded by a driver artifact (everything the
ledger marks "r05 (scheduled)") occupy positions 1-N, then — standing
re-grade policy — the window's slack slots are filled oldest-green-
first (earliest first-green round wins; the load-bearing changeset
core breaks ties) so long-unattested queries are periodically
re-attested. Already-graded queries fill the tail in the same
oldest-first order. Dry-run by default; --write applies the edit in
place and then re-parses the rewritten file, asserting the query /
oracle key sets are exactly preserved (fails loudly on any drop).

Once every query has a green row (the post-r05 steady state), the
never-graded set is empty and the whole 50-slot window becomes re-grade
slack: running `--write` each round then cycles the window through the
registry oldest-attestation-first, so a regression in any query is
caught within ceil(145/50) = 3 rounds. `--regrade N` previews/forces a
window with at least N re-grade slots even while never-graded queries
remain (they keep absolute priority for the other slots).

Usage:
  python scripts/rotate_registry.py              # show the planned order
  python scripts/rotate_registry.py --write      # rewrite __spark_entry__.py
  python scripts/rotate_registry.py --regrade 10 # reserve >=10 re-grade slots
"""

from __future__ import annotations

import json
import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENTRY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py")

HDR = """    # ORDER IS THE GRADING WINDOW: the driver grades exactly the first
    # 50 entries. Round 5 leads with every query that has never had a
    # hard driver-graded row (see GRADING_LEDGER.md), then the window
    # slack re-grades the oldest-green load-bearing queries (standing
    # policy: oldest first-green round first), then everything already
    # green in a prior CORRECTNESS_r{N} artifact, oldest-green first.
"""

# Tie-break within the oldest green round: the changeset core carries
# the most downstream weight, so it re-attests first (VERDICT r04 #2).
LOAD_BEARING = [
    "diff_changeset", "apply_roundtrip", "rebase_final", "concat_apply",
    "minhash_lsh",
]


def first_green_round() -> dict[str, int]:
    """Map query -> earliest round whose driver artifact has it green."""
    first: dict[str, int] = {}
    base = os.path.dirname(ENTRY)
    for n in range(1, 10):
        p = os.path.join(base, f"CORRECTNESS_r0{n}.json")
        if not os.path.exists(p):
            continue
        with open(p) as f:
            art = json.load(f)
        for k, v in art.items():
            if (isinstance(v, dict) and not v.get("err")
                    and v.get("rows_match") and v.get("hash_match", True)):
                first.setdefault(k, n)
    return first


def extract(src: str, fn: str):
    m = re.search(
        rf"def {fn}\(\)[^\n]*\n(?:    #[^\n]*\n)*    return \{{\n(.*?)\n    \}}",
        src, re.S,
    )
    ents = dict(re.findall(r'"([a-z0-9_]+)": ([^\n]+?),\n', m.group(1) + "\n"))
    # Guard against the single-line-regex failure mode: every line in
    # the body must be a matched entry, or we refuse to proceed (a
    # multi-line or comment-interleaved entry would otherwise be
    # silently dropped by the rewrite).
    body_lines = [ln for ln in m.group(1).split("\n") if ln.strip()]
    if len(body_lines) != len(ents):
        raise SystemExit(
            f"{fn}(): {len(body_lines)} body lines but only {len(ents)} "
            "single-line entries parsed — a multi-line/comment entry would "
            "be dropped; normalize the registry body before rotating."
        )
    return m, ents


def main() -> None:
    src = open(ENTRY).read()
    qm, qents = extract(src, "queries")
    om, oents = extract(src, "oracle_sql")
    first = first_green_round()
    rank = {k: i for i, k in enumerate(LOAD_BEARING)}
    never = [k for k in qents if k not in first]
    graded = sorted(
        (k for k in qents if k in first),
        key=lambda k: (first[k], rank.get(k, len(LOAD_BEARING)),
                       list(qents).index(k)),
    )
    # --regrade N: reserve at least N window slots for re-grades by
    # truncating the never-graded block (never below what fits anyway).
    n_regrade = 0
    deferred: list[str] = []
    if "--regrade" in sys.argv:
        n_regrade = int(sys.argv[sys.argv.index("--regrade") + 1])
        keep = min(len(never), max(0, 50 - n_regrade))
        never, deferred = never[:keep], never[keep:]
    # window = truncated never-graded block, then re-grades fill to 50;
    # deferred never-graded queries sit right after the window so the
    # next rotation re-leads with them.
    fill = max(0, 50 - len(never))
    order = never + graded[:fill] + deferred + graded[fill:]
    print(f"{len(order)} queries; {len(never)} never-hard-graded lead the "
          f"window; window slack after them: {max(0, 50 - len(never))}"
          + (f" (>= {n_regrade} re-grade slots forced)" if n_regrade else ""))
    for i, k in enumerate(order[:50], 1):
        tag = "" if k not in first else f"  (re-grade; first green r0{first[k]})"
        print(f"  {i:2d}. {k}{tag}")
    if "--write" not in sys.argv:
        print("(dry run — pass --write to apply)")
        return
    qbody = "\n".join(f'        "{k}": {qents[k]},' for k in order)
    obody = "\n".join(f'        "{k}": {oents[k]},' for k in order if k in oents)
    out = (
        src[: qm.start()]
        + "def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:\n"
        + HDR + f"    return {{\n{qbody}\n    }}" + src[qm.end():]
    )
    om2 = re.search(
        r"def oracle_sql\(\)[^\n]*\n(?:    #[^\n]*\n)*    return \{\n(.*?)\n    \}",
        out, re.S,
    )
    out = (
        out[: om2.start()]
        + "def oracle_sql() -> dict[str, str]:\n"
        + "    # same order as queries() — see the grading-window note there.\n"
        + f"    return {{\n{obody}\n    }}" + out[om2.end():]
    )
    # ADVICE r04: assert the rewrite preserved both key sets exactly
    # before touching disk — any dropped or mutated entry fails loudly.
    _, q2 = extract(out, "queries")
    _, o2 = extract(out, "oracle_sql")
    assert set(q2) == set(qents), (
        f"queries() keys changed: -{set(qents) - set(q2)} +{set(q2) - set(qents)}")
    assert set(o2) == set(oents), (
        f"oracle_sql() keys changed: -{set(oents) - set(o2)} +{set(o2) - set(oents)}")
    assert set(o2) <= set(q2), f"oracles without queries: {set(o2) - set(q2)}"
    assert q2 == {k: qents[k] for k in q2}, "a queries() value was mutated"
    assert o2 == {k: oents[k] for k in o2}, "an oracle_sql() value was mutated"
    open(ENTRY, "w").write(out)
    print(f"rewritten; key sets verified ({len(q2)} queries, {len(o2)} "
          "oracles); re-run tests/test_entry_oracle.py before committing")


if __name__ == "__main__":
    main()
