"""Command-line interface — the nisshi-cli / nisshi-cat / nisshi-topic
surface (reference crates: nisshi-topic/src/{create,delete,list}.rs,
nisshi-cat/src/{produce,consume}.rs) over the Spark-backed broker:

    python -m tansu_spark topic create NAME [--partitions N] [--config k=v]...
    python -m tansu_spark topic delete NAME
    python -m tansu_spark topic list
    python -m tansu_spark topic describe NAME
    python -m tansu_spark produce TOPIC [--file F]     # JSON lines on stdin
    python -m tansu_spark consume TOPIC [--partition P] [--offset N]
                                        [--max-records M] [--isolation LEVEL]
    python -m tansu_spark offsets TOPIC
    python -m tansu_spark lag GROUP TOPIC
    python -m tansu_spark groups
    python -m tansu_spark maintain

The store root comes from --store / $TANSU_SPARK_STORE. Produce reads
one JSON object per line: {"key": ..., "value": ...} (the nisshi-cat
contract — values are encoded per the topic's schema by the registry on
the way in); consume prints the same shape with offsets. Everything is
driver-side control-plane plus ordinary Spark jobs — no wire protocol,
per SURVEY §7's scope decision."""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any


def _broker(args):
    from tansu_spark.broker import Broker
    from tansu_spark.registry import SchemaRegistry
    from tansu_spark.session import get_spark

    spark = get_spark(app_name="tansu-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    registry = None
    if args.schemas and os.path.isdir(args.schemas):
        registry = SchemaRegistry(args.schemas)
    return Broker(spark, args.store, registry=registry)


def _emit(obj: Any, out) -> None:
    print(json.dumps(obj, default=str, sort_keys=True), file=out)


def _cmd_topic(args, out) -> int:
    b = _broker(args)
    if args.action == "create":
        config = dict(kv.split("=", 1) for kv in args.config or [])
        b.create_topic(args.name, partitions=args.partitions, config=config)
        _emit({"created": args.name, "partitions": args.partitions}, out)
    elif args.action == "delete":
        b.delete_topic(args.name)
        _emit({"deleted": args.name}, out)
    elif args.action == "list":
        for t in b.topics():
            cfg = b.describe_topic(t)
            _emit({"name": t, "partitions": cfg.partitions}, out)
    elif args.action == "describe":
        cfg = b.describe_topic(args.name)
        _emit(
            {
                "name": args.name,
                "partitions": cfg.partitions,
                "configs": b.describe_configs(args.name),
            },
            out,
        )
    return 0


def _cmd_produce(args, out) -> int:
    b = _broker(args)
    if args.file:
        text = open(args.file).read().strip()
        # nisshi-cat accepts a JSON ARRAY file (etc/data/trips.json) or
        # JSON lines
        docs = (
            json.loads(text)
            if text.startswith("[")
            else [json.loads(line) for line in text.splitlines() if line.strip()]
        )
    else:
        docs = [json.loads(line) for line in sys.stdin if line.strip()]

    wire = b.describe_topic(args.topic).config.get("tansu.schema.wire", "json")
    rows = []
    for doc in docs:
        key, value = doc.get("key"), doc.get("value", doc if "key" not in doc else None)
        if b.registry is not None:
            # the `cat produce` contract: JSON in, topic's wire format out
            k, v = b.registry.encode_record(args.topic, key, value, wire=wire)
        else:
            k = key.encode() if isinstance(key, str) else key
            v = (
                value
                if isinstance(value, (bytes, type(None)))
                else (value if isinstance(value, str) else json.dumps(value)).encode()
            )
        rows.append({"key": k, "value": v})
    # Multi-batch inputs take the double-buffered path: batch N+1's
    # Arrow transfer overlaps batch N's parquet commit (1.57x at
    # 100k rows — bench_broker.py). base_offsets merges the MINIMUM
    # offset per partition across all committed batches, so a partition
    # first touched in a later batch still appears; `batches` discloses
    # that a multi-batch produce is a sequence of commits, not one
    # atomic commit.
    per_batch = b.produce_rows_pipelined(args.topic, rows)
    offsets: dict[int, int] = {}
    for batch in per_batch:
        for p, o in batch.items():
            offsets[p] = min(offsets.get(p, o), o)
    _emit(
        {
            "produced": len(rows),
            "base_offsets": {str(k): v for k, v in sorted(offsets.items())},
            "batches": len(per_batch),
        },
        out,
    )
    return 0


def _cmd_consume(args, out) -> int:
    b = _broker(args)
    df = b.fetch(
        args.topic,
        partition=args.partition,
        offset=args.offset,
        isolation=args.isolation,
    )
    it = df.orderBy("partition", "offset").toLocalIterator()
    n = 0
    for r in it:
        if args.max_records is not None and n >= args.max_records:
            break
        _emit(
            {
                "partition": r["partition"],
                "offset": r["offset"],
                "timestamp": r["timestamp"],
                "key": bytes(r["key"]).decode("utf-8", "replace") if r["key"] is not None else None,
                "value": bytes(r["value"]).decode("utf-8", "replace") if r["value"] is not None else None,
            },
            out,
        )
        n += 1
    return 0


def _cmd_offsets(args, out) -> int:
    b = _broker(args)
    _emit(
        {
            "topic": args.topic,
            "earliest": {str(k): v for k, v in b.list_offsets(args.topic, "earliest").items()},
            "latest": {str(k): v for k, v in b.list_offsets(args.topic, "latest").items()},
        },
        out,
    )
    return 0


def _cmd_lag(args, out) -> int:
    b = _broker(args)
    _emit(
        {
            "group": args.group,
            "topic": args.topic,
            "partitions": {str(k): v for k, v in b.consumer_lag(args.group, args.topic).items()},
        },
        out,
    )
    return 0


def _cmd_groups(args, out) -> int:
    b = _broker(args)
    from tansu_spark.broker.coordinator import GroupCoordinator

    for g in GroupCoordinator(b).list_groups():
        _emit(g, out)
    return 0


def _cmd_maintain(args, out) -> int:
    b = _broker(args)
    from tansu_spark.lake.maintain import Maintainer

    report = Maintainer(b).tick()
    _emit({"maintained": report}, out)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tansu-spark")
    p.add_argument(
        "--store",
        default=os.environ.get("TANSU_SPARK_STORE", "./tansu-store"),
        help="broker store root (or $TANSU_SPARK_STORE)",
    )
    p.add_argument(
        "--schemas",
        default=os.environ.get("TANSU_SPARK_SCHEMAS"),
        help="schema registry directory ({topic}.avsc/.json/.proto)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("topic", help="topic admin (nisshi-topic)")
    t.add_argument("action", choices=["create", "delete", "list", "describe"])
    t.add_argument("name", nargs="?")
    t.add_argument("--partitions", type=int, default=1)
    t.add_argument("--config", action="append", metavar="K=V")
    t.set_defaults(fn=_cmd_topic)

    pr = sub.add_parser(
        "produce",
        help="produce JSON lines (nisshi-cat)",
        description="Produce JSON lines to a topic. Inputs over 10k rows "
        "commit as a SEQUENCE of pipelined batches (the `batches` output "
        "field), not one atomic commit; base_offsets reports the minimum "
        "offset per touched partition across all batches.",
    )
    pr.add_argument("topic")
    pr.add_argument("--file", help="read from file instead of stdin")
    pr.set_defaults(fn=_cmd_produce)

    co = sub.add_parser("consume", help="consume records (nisshi-cat)")
    co.add_argument("topic")
    co.add_argument("--partition", type=int)
    co.add_argument("--offset", type=int, default=0)
    co.add_argument("--max-records", type=int)
    co.add_argument(
        "--isolation",
        choices=["read_uncommitted", "read_committed"],
        default="read_uncommitted",
    )
    co.set_defaults(fn=_cmd_consume)

    of = sub.add_parser("offsets", help="per-partition offset frontier")
    of.add_argument("topic")
    of.set_defaults(fn=_cmd_offsets)

    lg = sub.add_parser("lag", help="consumer-group lag")
    lg.add_argument("group")
    lg.add_argument("topic")
    lg.set_defaults(fn=_cmd_lag)

    gr = sub.add_parser("groups", help="list consumer groups")
    gr.set_defaults(fn=_cmd_groups)

    mt = sub.add_parser("maintain", help="one maintenance sweep")
    mt.set_defaults(fn=_cmd_maintain)
    return p


def main(argv: list[str] | None = None, out=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args, out or sys.stdout)


if __name__ == "__main__":
    raise SystemExit(main())
