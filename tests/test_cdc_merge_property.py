"""Property test for the CDC upsert merge SEMANTICS (streaming/jobs
_cdc_merge_batch): the per-user fold (argmax by (ts, event_id) +
count sum) is associative and commutative, so ANY partition of the
event log into ordered micro-batches must yield the same final
state as the one-shot batch computation. The restart pytest pins
the Spark implementation across a crash; this pins the algebra on
adversarial batch boundaries — pure Python, hypothesis-driven.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _merge(state: dict, batch: list) -> dict:
    """Python mirror of _cdc_merge_batch's relational merge: batch
    reduces to one row per user (latest by (ts, eid) + count), then
    full-outer argmax+sum into state."""
    partial: dict = {}
    for user, eid, etype, ts in batch:
        n, key, _ = partial.get(user, (0, (-1, -1), None))
        cand = (ts, eid)
        if cand > key:
            partial[user] = (n + 1, cand, etype)
        else:
            partial[user] = (n + 1, key, partial[user][2])
    out = dict(state)
    for user, (n, key, etype) in partial.items():
        if user in out:
            on, okey, otype = out[user]
            out[user] = (on + n, max(okey, key),
                         etype if key > okey else otype)
        else:
            out[user] = (n, key, etype)
    return out


@st.composite
def _logs(draw):
    n = draw(st.integers(1, 30))
    events = []
    for eid in range(n):  # unique event ids, like the fixture
        user = draw(st.integers(0, 4))
        etype = draw(st.sampled_from(["view", "click", "buy"]))
        ts = draw(st.integers(0, 9))  # coarse: force (ts, eid) ties
        events.append((user, eid, etype, ts))
    # random batch boundaries (possibly empty batches)
    cuts = draw(st.lists(st.integers(0, n), max_size=4))
    bounds = sorted(set(cuts) | {0, n})
    batches = [events[a:b] for a, b in zip(bounds, bounds[1:])]
    return events, batches


@settings(max_examples=300, deadline=None)
@given(_logs())
def test_cdc_merge_is_batch_boundary_invariant(log):
    events, batches = log
    folded: dict = {}
    for b in batches:
        folded = _merge(folded, b)
    oneshot = _merge({}, events)
    assert folded == oneshot


@settings(max_examples=200, deadline=None)
@given(_logs())
def test_cdc_merge_replay_is_idempotent(log):
    """Replaying the LAST batch against the state that already
    merged it must be detectable as the predecessor-read discipline:
    merging batch k into the state BEFORE k always lands the same
    result, however many times it is retried."""
    events, batches = log
    if not batches:
        return
    pre = {}
    for b in batches[:-1]:
        pre = _merge(pre, b)
    once = _merge(pre, batches[-1])
    again = _merge(pre, batches[-1])  # retry reads the PREDECESSOR
    assert once == again
