"""Property tests for the distributed insert-collision allocator.

`_insert_mapping_df` (operators/rebase.py) replaces the reference's
sequential counter (_find_mapping_for_new_changeset,
geodiffrebase.cpp:242-350) with a closed-form window-rank scheme. The
subtle piece is the cascade inequality: candidate u_j (j-th ascending
non-colliding fid > mx) is remapped iff u_j <= mx + k + j - 1. These
tests pin that closed form to a straight Python transcription of the
sequential algorithm:

  phase A: colliding fids (ours ∩ theirs), ascending, map to
           mx+1, mx+2, ... (k allocations);
  phase B: remaining fids ascending; remap iff the fid equals an
           already-allocated id, allocating the next counter value
           (usedNewPkeys grows as we go — geodiffrebase.cpp:323-350).

The hypothesis sweep (hundreds of cases) runs against a pure-Python
replica of the closed form; a seeded randomized batch then runs the
real DataFrame implementation, so the math and the Spark plumbing are
each pinned where they're cheap to pin.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# sequential reference model (transcribed from geodiffrebase.cpp:242-350)
# --------------------------------------------------------------------------

def seq_mapping(ours: set[int], theirs: set[int]) -> dict[int, int]:
    if not theirs:
        return {}
    free = max(theirs) + 1
    mapping: dict[int, int] = {}
    unmapped: list[int] = []
    for pk in sorted(set(ours)):
        if pk in theirs:
            mapping[pk] = free
            free += 1
        else:
            unmapped.append(pk)
    used_new = set(mapping.values())
    for pk in unmapped:  # std::set iterates ascending
        if pk in used_new:
            mapping[pk] = free
            used_new.add(free)
            free += 1
    return mapping


# --------------------------------------------------------------------------
# pure-Python replica of the closed form used by _insert_mapping_df
# --------------------------------------------------------------------------

def closed_form_mapping(ours: set[int], theirs: set[int]) -> dict[int, int]:
    if not theirs:
        return {}
    mx = max(theirs)
    coll = sorted(set(ours) & set(theirs))
    k = len(coll)
    mapping = {fid: mx + i for i, fid in enumerate(coll, start=1)}
    cascade = sorted(f for f in set(ours) - set(theirs) if f > mx)
    for j, u in enumerate(cascade, start=1):
        if u <= mx + k + j - 1:
            mapping[u] = mx + k + j
    return mapping


FIDS = st.sets(st.integers(min_value=1, max_value=60), max_size=25)


@settings(max_examples=400, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ours=FIDS, theirs=FIDS)
def test_closed_form_equals_sequential(ours, theirs):
    assert closed_form_mapping(ours, theirs) == seq_mapping(ours, theirs)


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ours=FIDS, theirs=FIDS)
def test_mapping_invariants(ours, theirs):
    """Contract invariants regardless of model: collision-free results,
    every allocated id above max(theirs), no allocated id reused."""
    m = seq_mapping(ours, theirs)
    if not theirs:
        assert m == {}
        return
    mx = max(theirs)
    final_ids = [m.get(f, f) for f in sorted(ours)]
    assert len(final_ids) == len(set(final_ids))  # collision-free
    assert not (set(final_ids) & set(theirs))  # never lands on theirs
    assert all(v > mx for v in m.values())
    assert len(set(m.values())) == len(m)


# --------------------------------------------------------------------------
# the real DataFrame allocator vs the sequential model (seeded batch)
# --------------------------------------------------------------------------

def _df_mapping(spark, ours, theirs):
    from geodiff_spark.operators.rebase import _insert_mapping_df

    mk = lambda s: spark.createDataFrame(
        [(int(v),) for v in sorted(s)] or [(None,)], "fid long"
    ).filter(F.col("fid").isNotNull())
    out = _insert_mapping_df(mk(ours), mk(theirs)).collect()
    return {r["fid"]: r["_remap_fid"] for r in out}


CASES = []
_rng = random.Random(0xC0FFEE)
for trial in range(10):
    n = _rng.randint(0, 30)
    theirs = set(_rng.sample(range(1, 50), _rng.randint(0, 20)))
    ours = set(_rng.sample(range(1, 50), n))
    CASES.append((ours, theirs))
# adversarial shapes: full overlap (backfill race), dense cascade chain,
# cascade blocked by a gap, empty sides
CASES += [
    (set(range(1, 21)), set(range(1, 21))),          # all collide
    (set(range(10, 30)), set(range(1, 11))),         # long cascade chain
    ({11, 13, 40}, {1, 10}),                         # gap stops cascade
    ({5}, set()),                                    # no theirs inserts
    (set(), {3, 4}),                                 # no our inserts
    ({1, 2, 3, 11, 12, 13}, {3, 10, 11}),            # mixed
]


@pytest.mark.parametrize("ours,theirs", CASES)
def test_insert_mapping_df_matches_sequential(spark, ours, theirs):
    assert _df_mapping(spark, ours, theirs) == seq_mapping(ours, theirs)
