"""Group-coordinator rebalance protocol tests — the full Kafka group
dance against administrator.rs semantics: two-step join, leader
election, sync-completes-rebalance, generation fencing, heartbeat
eviction, static membership, leave, and offset-commit fences."""

from __future__ import annotations

import pytest

from tansu_spark.broker import Broker
from tansu_spark.broker.coordinator import ErrorCode, GroupCoordinator


@pytest.fixture()
def coord(spark, tmp_path):
    broker = Broker(spark, str(tmp_path / "store"))
    broker.create_topic("t", partitions=4)
    return GroupCoordinator(broker)


PROTOS = [("range", b"meta-t")]


def _full_join(coord, gid="g", client="c", protos=PROTOS, now=0.0):
    """The two-step dynamic join: empty member id → MEMBER_ID_REQUIRED
    with a fresh id → re-join with it."""
    first = coord.join(gid, protocols=protos, client_id=client, now=now)
    assert first["error"] is ErrorCode.MEMBER_ID_REQUIRED
    assert first["member_id"].startswith(f"{client}-")
    assert first["generation_id"] == -1
    return coord.join(gid, member_id=first["member_id"], protocols=protos, now=now)


def test_join_two_step_and_leader_election(coord):
    r1 = _full_join(coord, client="a")
    assert r1["error"] is ErrorCode.NONE
    assert r1["leader"] == r1["member_id"]  # first member leads
    assert [m["member_id"] for m in r1["members"]] == [r1["member_id"]]

    r2 = _full_join(coord, client="b")
    assert r2["error"] is ErrorCode.NONE
    assert r2["leader"] == r1["member_id"]
    assert r2["members"] == []  # only the leader sees the roster


def test_join_protocol_negotiation(coord):
    r1 = _full_join(coord)
    assert r1["protocol_type"] == "consumer" and r1["protocol_name"] == "range"
    # a joiner that cannot speak the chosen protocol is rejected
    bad = coord.join("g", member_id="x", protocols=[("sticky", b"")], now=0.0)
    assert bad["error"] is ErrorCode.INCONSISTENT_GROUP_PROTOCOL
    # no protocols at all is invalid
    assert coord.join("g", member_id="x", protocols=None)["error"] is ErrorCode.INVALID_REQUEST


def test_sync_completes_rebalance(coord):
    lead = _full_join(coord, client="a")
    foll = _full_join(coord, client="b")
    gen = coord.describe("g")["generation_id"]
    lid, fid = lead["member_id"], foll["member_id"]

    # follower syncs early: parked with REBALANCE_IN_PROGRESS
    assert coord.sync("g", gen, fid)["error"] is ErrorCode.REBALANCE_IN_PROGRESS
    # leader must cover EXACTLY the member set
    partial = coord.sync("g", gen, lid, {lid: b"p0"})
    assert partial["error"] is ErrorCode.REBALANCE_IN_PROGRESS
    done = coord.sync("g", gen, lid, {lid: b"p01", fid: b"p23"})
    assert done["error"] is ErrorCode.NONE and done["assignment"] == b"p01"
    assert coord.describe("g")["state"] == "Formed"
    # follower now receives its assignment
    got = coord.sync("g", gen, fid)
    assert got["error"] is ErrorCode.NONE and got["assignment"] == b"p23"

    # fencing on the formed group
    assert coord.sync("g", gen + 1, fid)["error"] is ErrorCode.ILLEGAL_GENERATION
    assert coord.sync("g", gen - 1, fid)["error"] is ErrorCode.REBALANCE_IN_PROGRESS
    assert coord.sync("g", gen, "stranger")["error"] is ErrorCode.UNKNOWN_MEMBER_ID


def _form(coord, gid="g", n=2, now=0.0):
    joins = [_full_join(coord, gid, client=f"m{i}", now=now) for i in range(n)]
    gen = coord.describe(gid)["generation_id"]
    lid = joins[0]["member_id"]
    assignments = {j["member_id"]: f"a{i}".encode() for i, j in enumerate(joins)}
    assert coord.sync(gid, gen, lid, assignments, now=now)["error"] is ErrorCode.NONE
    return [j["member_id"] for j in joins], gen


def test_new_member_triggers_rebalance_generation_bump(coord):
    members, gen = _form(coord)
    # steady state: heartbeats are clean
    for m in members:
        assert coord.heartbeat("g", gen, m, now=1.0) is ErrorCode.NONE

    # a new member joins → group re-forms at gen+1
    j = _full_join(coord, client="new", now=1.0)
    assert j["error"] is ErrorCode.NONE
    d = coord.describe("g")
    assert d["state"] == "Forming" and d["generation_id"] == gen + 1
    # old-generation heartbeats now see the rebalance
    assert coord.heartbeat("g", gen, members[0], now=1.0) is ErrorCode.REBALANCE_IN_PROGRESS
    # re-join of a known member with SAME metadata while formed would not
    # have bumped: check on a fresh group
    m2, gen2 = _form(coord, "g2")
    again = coord.join("g2", member_id=m2[0], protocols=PROTOS, now=0.0)
    assert again["error"] is ErrorCode.NONE
    assert coord.describe("g2") == {
        "state": "Formed",
        "generation_id": gen2,
        "protocol_type": "consumer",
        "protocol_name": "range",
        "leader": m2[0],
        "members": sorted(m2),
    }


def test_heartbeat_eviction_reforms_group(coord):
    members, gen = _form(coord, now=0.0)
    # member 1 goes silent past the 45 s session timeout; member 0's
    # heartbeat at t=50 triggers the eviction sweep
    rc = coord.heartbeat("g", gen, members[0], now=50.0)
    assert rc is ErrorCode.REBALANCE_IN_PROGRESS
    d = coord.describe("g")
    assert d["state"] == "Forming" and d["generation_id"] == gen + 1
    assert d["members"] == [members[0]]
    assert coord.heartbeat("g", gen, members[1], now=51.0) is ErrorCode.UNKNOWN_MEMBER_ID


def test_leave_bumps_generation_and_clears_leader(coord):
    members, gen = _form(coord)
    out = coord.leave("g", member_id=members[0])  # the leader leaves
    assert out == [(members[0], ErrorCode.NONE)]
    d = coord.describe("g")
    assert d["state"] == "Forming" and d["generation_id"] == gen + 1
    assert d["leader"] is None
    assert coord.leave("g", member_id="ghost") == [("ghost", ErrorCode.UNKNOWN_MEMBER_ID)]
    # next joiner becomes the new leader
    j = _full_join(coord, client="next")
    assert j["leader"] == j["member_id"]


def test_static_membership(coord):
    # instance id joins without a member id and keeps a stable identity
    a1 = coord.join("g", protocols=PROTOS, group_instance_id="host-1", now=0.0)
    assert a1["error"] is ErrorCode.NONE
    a2 = coord.join("g", protocols=PROTOS, group_instance_id="host-1", now=1.0)
    assert a2["member_id"] == a1["member_id"]  # mapped back, no two-step

    # form the group, then a static metadata update must NOT bump the
    # generation (soft update) though it does re-form
    gen = coord.describe("g")["generation_id"]
    assert (
        coord.sync("g", gen, a1["member_id"], {a1["member_id"]: b"all"}, now=1.0)["error"]
        is ErrorCode.NONE
    )
    coord.join(
        "g", protocols=[("range", b"meta-v2")], group_instance_id="host-1", now=2.0
    )
    d = coord.describe("g")
    assert d["generation_id"] == gen and d["state"] == "Forming"


def test_offset_commit_fencing(coord):
    # simple-consumer commit (no generation, no member) works only while
    # the group has no members
    assert (
        coord.offset_commit("simple", {("t", 0): 5}) is ErrorCode.NONE
    )
    assert coord.offset_fetch("simple", "t") == {0: 5}

    members, gen = _form(coord)
    assert coord.offset_commit("g", {("t", 0): 1}) is ErrorCode.UNKNOWN_MEMBER_ID
    assert (
        coord.offset_commit("g", {("t", 0): 1}, gen, "stranger")
        is ErrorCode.UNKNOWN_MEMBER_ID
    )
    # formed: generation must match EXACTLY
    assert (
        coord.offset_commit("g", {("t", 0): 1}, gen + 1, members[0])
        is ErrorCode.ILLEGAL_GENERATION
    )
    assert (
        coord.offset_commit("g", {("t", 0): 1}, gen - 1, members[0])
        is ErrorCode.ILLEGAL_GENERATION
    )
    assert coord.offset_commit("g", {("t", 0): 7}, gen, members[0]) is ErrorCode.NONE
    assert coord.offset_fetch("g", "t") == {0: 7}

    # while forming (new member joined), an OLDER generation may commit
    # (revoked partitions are committed mid-rebalance)
    _full_join(coord, client="late")
    assert coord.offset_commit("g", {("t", 1): 3}, gen, members[0]) is ErrorCode.NONE
    assert coord.offset_fetch("g", "t") == {0: 7, 1: 3}
    # but never a FUTURE generation
    cur = coord.describe("g")["generation_id"]
    assert (
        coord.offset_commit("g", {("t", 2): 9}, cur + 5, members[0])
        is ErrorCode.ILLEGAL_GENERATION
    )


def test_coordinator_state_survives_restart(spark, tmp_path):
    broker = Broker(spark, str(tmp_path / "store"))
    broker.create_topic("t", partitions=2)
    c1 = GroupCoordinator(broker)
    j = c1.join("g", protocols=PROTOS, client_id="a", now=0.0)
    r = c1.join("g", member_id=j["member_id"], protocols=PROTOS, now=0.0)
    gen = c1.describe("g")["generation_id"]
    assert (
        c1.sync("g", gen, r["member_id"], {r["member_id"]: b"x"}, now=0.0)["error"]
        is ErrorCode.NONE
    )

    c2 = GroupCoordinator(broker)  # fresh coordinator over the same root
    d = c2.describe("g")
    assert d["state"] == "Formed" and d["generation_id"] == gen
    assert d["leader"] == r["member_id"]
    got = c2.sync("g", gen, r["member_id"], now=1.0)
    assert got["error"] is ErrorCode.NONE and got["assignment"] == b"x"


def test_list_groups_and_assignor_registry(coord):
    from tansu_spark.broker.assignor import ASSIGNORS

    _form(coord, "g1")
    coord.join("g2", protocols=PROTOS, client_id="x", now=0.0)
    got = coord.list_groups()
    assert [g["group_id"] for g in got] == ["g1", "g2"]
    assert got[0]["state"] == "Formed" and got[1]["state"] == "Forming"
    assert got[0]["protocol_type"] == "consumer"

    # the uniform protocol is the sticky algorithm under its tansu name
    assert set(ASSIGNORS) == {"range", "roundrobin", "uniform", "cooperative-sticky"}
    assert ASSIGNORS["uniform"]({"a": ["t"]}, {"t": 2}) == {"a": {"t": [0, 1]}}


def test_run_rebalance_full_dance(spark, tmp_path):
    """End-to-end: three consumers with mixed subscriptions rebalance
    through the real Join/Sync protocol; the leader runs the negotiated
    assignor; the union of assignments covers every partition exactly
    once per topic."""
    broker = Broker(spark, str(tmp_path / "store"))
    broker.create_topic("x", partitions=5)
    broker.create_topic("y", partitions=2)
    coord = GroupCoordinator(broker)

    subs = {"c1": ["x", "y"], "c2": ["x", "y"], "c3": ["x"]}
    got = coord.run_rebalance("g", subs, protocol="roundrobin", now=0.0)

    for topic, total in (("x", 5), ("y", 2)):
        owned = [
            (p, c)
            for c, a in got.items()
            for p in a.get(topic, [])
        ]
        assert sorted(p for p, _ in owned) == list(range(total)), topic
    assert not got["c3"].get("y")  # c3 never subscribed to y
    assert coord.describe("g")["state"] == "Formed"

    # cooperative-sticky across a membership change keeps prior owners
    got2 = coord.run_rebalance(
        "g2", {"a": ["x"], "b": ["x"]}, protocol="cooperative-sticky", now=0.0
    )
    assert sorted(got2["a"].get("x", []) + got2["b"].get("x", [])) == list(range(5))


def test_coordinator_requests_counter(coord):
    """COORDINATOR_REQUESTS parity (administrator.rs:823+): every
    protocol request increments the labelled counter by method."""
    from tansu_spark import metrics as M

    M.reset()
    _form(coord, "gm")
    members = coord.describe("gm")["members"]
    gen = coord.describe("gm")["generation_id"]
    coord.heartbeat("gm", gen, members[0], now=1.0)
    coord.offset_commit("gm", {("t", 0): 1}, gen, members[0], now=1.0)
    coord.leave("gm", member_id=members[0])

    got = M.counters()["coordinator_requests"]
    assert got["method=join"] >= 4  # two members x two-step join
    assert got["method=sync"] >= 1
    assert got["method=heartbeat"] == 1
    assert got["method=offset_commit"] == 1
    assert got["method=leave"] == 1


def test_delete_groups_contract(coord):
    """DeleteGroups: unknown → GROUP_ID_NOT_FOUND; live members →
    NON_EMPTY_GROUP; after leave the group and its offsets delete."""
    members, gen = _form(coord, "dg")
    coord.offset_commit("dg", {("t", 0): 3}, gen, members[0])
    assert coord.delete_groups(["missing"]) == [("missing", ErrorCode.GROUP_ID_NOT_FOUND)]
    assert coord.delete_groups(["dg"]) == [("dg", ErrorCode.NON_EMPTY_GROUP)]
    coord.leave("dg", members=members)
    assert coord.delete_groups(["dg"]) == [("dg", ErrorCode.NONE)]
    assert "dg" not in [g["group_id"] for g in coord.list_groups()]
    assert coord.offset_fetch("dg", "t") == {}  # cursor gone too


def test_concurrent_joins_converge(spark, tmp_path):
    """Threaded two-step joins against one coordinator: the store lock
    serializes mutations — every member registers exactly once, one
    leader emerges, and the leader's roster covers all members."""
    import threading

    broker = Broker(spark, str(tmp_path / "store"))
    broker.create_topic("t", partitions=8)
    coord = GroupCoordinator(broker)
    results, errors = {}, []

    def worker(i):
        try:
            first = coord.join("g", protocols=PROTOS, client_id=f"c{i}", now=0.0)
            assert first["error"] is ErrorCode.MEMBER_ID_REQUIRED
            r = coord.join("g", member_id=first["member_id"], protocols=PROTOS, now=0.0)
            results[i] = r
        except Exception as ex:  # pragma: no cover
            errors.append(ex)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert all(r["error"] is ErrorCode.NONE for r in results.values())
    leaders = {r["leader"] for r in results.values() if r["leader"]}
    d = coord.describe("g")
    assert d["leader"] in leaders
    assert len(d["members"]) == 6
    # the leader (whoever re-joins last sees the full roster) can finish
    roster = coord.join("g", member_id=d["leader"], protocols=PROTOS, now=0.0)
    assert {m["member_id"] for m in roster["members"]} == set(d["members"])
