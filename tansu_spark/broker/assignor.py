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


def roundrobin_assign(
    subscriptions: dict[str, list[str]],
    partitions: dict[str, int],
) -> dict[str, dict[str, list[int]]]:
    """Kafka's RoundRobinAssignor (public contract; the reference's
    plan.md roadmap item): ALL (topic, partition) pairs are ordered
    (topic name, then partition) and dealt one at a time over the
    member-id-sorted ring, skipping members not subscribed to the pair's
    topic. Balances total load across members at the cost of
    co-partitioned-topic alignment (range keeps alignment instead)."""
    members = sorted(subscriptions)
    out: dict[str, dict[str, list[int]]] = {m: {} for m in members}
    pairs = [
        (topic, p) for topic in sorted(partitions) for p in range(partitions[topic])
    ]
    i = 0
    for topic, p in pairs:
        # advance the ring to the next member subscribed to this topic
        for _ in range(len(members)):
            m = members[i % len(members)]
            i += 1
            if topic in subscriptions[m]:
                out[m].setdefault(topic, []).append(p)
                break
    return out


def cooperative_sticky_assign(
    subscriptions: dict[str, list[str]],
    partitions: dict[str, int],
    current: dict[str, dict[str, list[int]]] | None = None,
) -> dict[str, dict[str, list[int]]]:
    """Kafka's CooperativeStickyAssignor semantics (public contract):

    1. STICKINESS — a partition stays with its current owner whenever
       that owner is still present and subscribed, minimizing state
       movement across rebalances.
    2. BALANCE — unowned partitions (new topics, departed members) go to
       the least-loaded subscribed members (ties: member id).
    3. COOPERATIVE HANDOFF — when the ownership graph is imbalanced
       (a member owns more than ceil(total/n)), the excess partitions
       are REVOKED and land in the returned assignment's new owner; the
       two-phase protocol (revoke in one rebalance, grant in the next)
       collapses here to its fixed point, which is what the stateless
       caller needs.

    ``current``: member → topic → owned partitions from the previous
    generation (None/absent = fresh group, degenerates to balanced
    assignment)."""
    members = sorted(subscriptions)
    current = current or {}
    out: dict[str, dict[str, list[int]]] = {m: {} for m in members}
    loads = {m: 0 for m in members}

    for topic in sorted(partitions):
        subscribed = [m for m in members if topic in subscriptions[m]]
        if not subscribed:
            continue
        total = partitions[topic]
        cap = -(-total // len(subscribed))  # ceil: max fair share per topic
        owned: dict[int, str] = {}
        for m in subscribed:
            for p in current.get(m, {}).get(topic, []):
                if 0 <= p < total and p not in owned:
                    owned[p] = m

        # sticky keeps, capped at the fair share (excess is revoked)
        kept: dict[str, list[int]] = {m: [] for m in subscribed}
        for p in sorted(owned):
            m = owned[p]
            if len(kept[m]) < cap:
                kept[m].append(p)

        unassigned = [p for p in range(total) if not any(p in ps for ps in kept.values())]
        for p in unassigned:
            m = min(subscribed, key=lambda m: (len(kept[m]), m))
            kept[m].append(p)
        for m in subscribed:
            if kept[m]:
                out[m][topic] = sorted(kept[m])
                loads[m] += len(kept[m])
    return out


def uniform_assign(
    subscriptions: dict[str, list[str]],
    partitions: dict[str, int],
    current: dict[str, dict[str, list[int]]] | None = None,
) -> dict[str, dict[str, list[int]]]:
    """The reference's `uniform` protocol (a tansu-specific alias,
    plan.md "Uniform (Sticky)"): round-robin-balanced on first
    assignment, sticky across rebalances — exactly the
    cooperative-sticky algorithm without the two-phase revocation
    framing."""
    return cooperative_sticky_assign(subscriptions, partitions, current)


#: Protocol-name registry, mirroring GroupConsumer::ASSIGNORS
#: (consumer.rs Assignor enum: range/roundrobin/uniform/cooperative-sticky).
ASSIGNORS = {
    "range": range_assign,
    "roundrobin": roundrobin_assign,
    "uniform": uniform_assign,
    "cooperative-sticky": cooperative_sticky_assign,
}
