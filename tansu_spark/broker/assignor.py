"""Consumer-group partition assignment.

The engine itself never rebalances — one streaming query owns every
partition and its checkpoint is the group cursor (SURVEY §2.9 T5). The
assignor exists for API parity: external consumers coordinating through
`commit_offsets`/`fetch_offsets` can split topics the same way the
reference's leader does (RangeAssignor,
nisshi-sans-io/src/consumer/assignor/range.rs:31-120; roundrobin /
uniform / cooperative-sticky are unimplemented there too, plan.md).

Semantics (Kafka's RangeAssignor, re-derived from the public contract):
per topic, members subscribed to it are ordered by member id and the
topic's sorted partitions are split into contiguous ranges — the first
`total % n` members receive one extra partition. Contiguous ranges keep
co-partitioned topics aligned on the same member (the reason range is
Kafka's default over round-robin).
"""

from __future__ import annotations


def range_assign(
    subscriptions: dict[str, list[str]],
    partitions: dict[str, int],
) -> dict[str, dict[str, list[int]]]:
    """subscriptions: member id → subscribed topics; partitions: topic →
    partition count. Returns member → topic → assigned partition list
    (empty dict entries for members that receive nothing)."""
    members = sorted(subscriptions)
    out: dict[str, dict[str, list[int]]] = {m: {} for m in members}
    for topic in sorted(partitions):
        subscribed = [m for m in members if topic in subscriptions[m]]
        if not subscribed:
            continue
        total = partitions[topic]
        alloc, rem = divmod(total, len(subscribed))
        offset = 0
        for j, member in enumerate(subscribed):
            count = alloc + (1 if j < rem else 0)
            if count == 0:
                continue
            out[member][topic] = list(range(offset, offset + count))
            offset += count
    return out
