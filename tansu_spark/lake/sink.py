"""Config-driven lakehouse materialization of schema-backed topics.

Reference parity (SURVEY §2.1 S4-S6, §2.8 X1-X3, §1.4):
- one lake table per topic, named `{database}.{topic}`  (lake/delta.rs:293-295)
- `tansu.lake.partition`      → partition columns       (delta.rs:339-340)
- `tansu.lake.generate.<col>` → SQL generated columns   (delta.rs:236-272,385-485)
- `tansu.lake.normalize`(+`.separator`) → struct flattening (delta.rs:274-290)
- `tansu.lake.sink=false`     → rows stored, not materialized
- add-only schema migration   (Delta::migrate_schema, delta.rs:624-667)
- incremental store: only offsets above the last materialized watermark
  are appended per call (the reference stores per produced batch)

Spark-first: the "DataFusion pass" for generated columns is just
``withColumn(name, expr(sql))`` — Catalyst IS the expression engine; the
format is plain partitioned parquet (the reference's raw-Parquet sink,
lake/quet.rs), with Delta/Iceberg as drop-in upgrades where those
runtimes exist (import-gated, not assumed).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from tansu_spark.broker.state import file_lock, read_json, write_json_atomic


class LakeRuntimeUnavailable(RuntimeError):
    """A `tansu.lake.format` names a table runtime this environment does
    not ship. The message lists exactly what would activate it — the
    machine-checked form of the S4/S5 'partial' status (SURVEY §2.1)."""


# What each non-parquet lake format needs before store() may use it.
# Checked at write time (and by tests/test_lake.py's gate report) so the
# Delta/Iceberg story is an explicit, testable environment gate instead
# of prose: drop the jars + packages in, and the same topic config turns
# the sink into a native Delta/Iceberg writer.
_LAKE_RUNTIME_REQUIREMENTS: dict[str, list[str]] = {
    "delta": [
        "python package delta-spark (importable as `delta`)",
        "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension",
        "spark.sql.catalog.spark_catalog="
        "org.apache.spark.sql.delta.catalog.DeltaCatalog",
    ],
    "iceberg": [
        "org.apache.iceberg:iceberg-spark-runtime jar on the classpath",
        "an Iceberg catalog (spark.sql.catalog.<name>="
        "org.apache.iceberg.spark.SparkCatalog)",
    ],
}


def lake_runtime_status(spark, fmt: str) -> tuple[bool, list[str]]:
    """(available, missing-requirements) for a lake format. Parquet is
    always available (Spark-native); delta/iceberg probe the actual
    runtime, never assume it."""
    if fmt == "parquet":
        return True, []
    if fmt not in _LAKE_RUNTIME_REQUIREMENTS:
        return False, [f"unknown lake format {fmt!r} (parquet|delta|iceberg)"]
    reqs = _LAKE_RUNTIME_REQUIREMENTS[fmt]
    missing: list[str] = []
    if fmt == "delta":
        try:
            import delta  # noqa: F401
        except ImportError:
            missing.append(reqs[0])
        ext = spark.conf.get("spark.sql.extensions", "") or ""
        if "io.delta.sql.DeltaSparkSessionExtension" not in ext:
            missing.append(reqs[1])
        cat = spark.conf.get("spark.sql.catalog.spark_catalog", "") or ""
        if "DeltaCatalog" not in cat:
            missing.append(reqs[2])
    elif fmt == "iceberg":
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog"
            )
        except Exception:
            missing.append(reqs[0])
        jconf = spark.sparkContext._jsc.sc().conf().getAll()
        has_catalog = any(
            str(kv._1()).startswith("spark.sql.catalog.")
            and "iceberg" in str(kv._2()).lower()
            for kv in jconf
        )
        if not has_catalog:
            missing.append(reqs[1])
    return (not missing), missing


def require_lake_runtime(spark, fmt: str) -> None:
    """Raise LakeRuntimeUnavailable naming every missing piece, or return
    silently when the format is usable in this session."""
    ok, missing = lake_runtime_status(spark, fmt)
    if not ok:
        raise LakeRuntimeUnavailable(
            f"lake format {fmt!r} needs: " + "; ".join(missing)
        )


def flatten_structs(df: DataFrame, separator: str = ".") -> DataFrame:
    """Normalize: recursively expand struct columns to top-level columns
    named parent<sep>child (Arrow RecordBatch::normalize equivalent)."""
    cols = []

    def walk(prefix: str, schema: StructType, path: str):
        for f in schema.fields:
            name = f"{prefix}{separator}{f.name}" if prefix else f.name
            ref = f"{path}.{f.name}" if path else f.name
            if isinstance(f.dataType, StructType):
                walk(name, f.dataType, ref)
            else:
                cols.append(F.col(f"`{ref}`" if "." not in ref else ref).alias(name))

    walk("", df.schema, "")
    return df.select(*cols)


def _split_specs(raw: str) -> list[str]:
    """Split a comma-separated partition spec list, keeping commas inside
    transform parens intact: "bucket(8, key), day(ts), region" →
    ["bucket(8, key)", "day(ts)", "region"]."""
    out: list[str] = []
    depth = 0
    cur = ""
    for ch in raw:
        if ch == "," and depth == 0:
            if cur.strip():
                out.append(cur.strip())
            cur = ""
            continue
        depth += ch == "("
        depth -= ch == ")"
        cur += ch
    if cur.strip():
        out.append(cur.strip())
    return out


class LakeSink:
    def __init__(self, broker, lake_root: str, database: str = "tansu"):
        self.broker = broker
        self.spark = broker.spark
        self.root = lake_root
        self.database = database
        os.makedirs(self.root, exist_ok=True)

    # -------------------------------------------------------------- locations
    def table_dir(self, topic: str) -> str:
        return os.path.join(self.root, self.database, topic)

    def _state_path(self) -> str:
        return os.path.join(self.root, f"{self.database}.state.json")

    # ----------------------------------------------------------------- config
    def _lake_config(self, topic: str) -> dict[str, Any]:
        cfg = self.broker.describe_topic(topic).config
        generated = {
            k[len("tansu.lake.generate.") :]: v
            for k, v in cfg.items()
            if k.startswith("tansu.lake.generate.")
        }
        return {
            "sink": cfg.get("tansu.lake.sink", "true") != "false",
            "format": cfg.get("tansu.lake.format", "parquet"),
            "partition": _split_specs(cfg.get("tansu.lake.partition", "")),
            "generate": generated,
            "normalize": cfg.get("tansu.lake.normalize", "false") == "true",
            "separator": cfg.get("tansu.lake.normalize.separator", "."),
            "z_order": [
                c.strip()
                for c in cfg.get("tansu.lake.z_order", "").split(",")
                if c.strip()
            ],
            # Parquet-format topics only: ALSO materialize each snapshot
            # commit as a spec-format _delta_log/ (lake/delta_log.py), so
            # the table is adoptable by external Delta readers without a
            # Delta runtime — the reference's delta sink always commits
            # through the log (delta.rs flush_and_commit); this is the
            # parquet-native equivalent, incremental per store tick.
            "delta_log": cfg.get("tansu.lake.delta_log", "false") == "true",
        }

    # ------------------------------------------------------------- transforms
    @staticmethod
    def partition_transform(spec: str, df: DataFrame):
        """Iceberg-style hidden-partitioning transforms (Iceberg spec
        "partition transforms"; the reference's Iceberg sink gets these
        from the table metadata — here they live in the topic config):

        - ``bucket(n, col)``  → deterministic n-way hash bucket. For
          integer-typed columns (the types Iceberg hashes as an 8-byte
          little-endian long: int/long/date/timestamp) this is the EXACT
          Iceberg spec bucket — murmur3_x86_32 expressed as straight-line
          32-bit column algebra (functions/iceberg_hash.py, pinned to the
          spec's Appendix B vectors) that a DuckDB reader replays
          bit-identically, so the r1-r9 "md5 instead of murmur3"
          divergence is CLOSED for these types. Strings keep the md5
          discipline (variable-length murmur needs a per-byte loop
          neither engine expresses as plain columns; documented
          divergence, engine-portable either way).
        - ``truncate(w, col)`` → Iceberg truncate: numbers floor to a
          width-w band (`v - ((v % w + w) % w)`, exact for negatives),
          strings take the first w characters.
        - ``year(col)/month(col)/day(col)/hour(col)`` → calendar parts.

        Returns (column, default_alias) or None when ``spec`` is not a
        transform (plain column / SQL expr).

        Perf note: the murmur3 bucket here is the single-Column fold form
        (aggregate lambdas are CodegenFallback — interpreted JVM, still
        no Python). For bulk backfills where routing dominates, pre-append
        the hash with functions/iceberg_hash.with_murmur3[_str] (the
        withColumn chain form, full whole-stage codegen) and partition on
        a plain column instead."""
        import re as _re

        m = _re.fullmatch(r"\s*bucket\s*\(\s*(\d+)\s*,\s*([\w.]+)\s*\)\s*", spec)
        if m:
            n, col = int(m.group(1)), m.group(2)
            alias = f"{col.replace('.', '_')}_bucket"
            dtype = dict(df.dtypes).get(col, "")
            if dtype in ("bigint", "int", "smallint", "tinyint"):
                from tansu_spark.functions.iceberg_hash import iceberg_bucket_col

                return iceberg_bucket_col(col, n), alias
            if dtype == "date":
                # Iceberg hashes dates as epoch DAYS (int, widened to long)
                from tansu_spark.functions.iceberg_hash import iceberg_bucket_col

                return (
                    iceberg_bucket_col(f"datediff({col}, DATE '1970-01-01')", n),
                    alias,
                )
            if dtype.startswith("timestamp"):
                # Iceberg hashes timestamps as epoch MICROS
                from tansu_spark.functions.iceberg_hash import iceberg_bucket_col

                return (
                    iceberg_bucket_col(f"unix_micros({col})", n),
                    alias,
                )
            if dtype == "string":
                # Iceberg hashes strings as murmur3 of their UTF-8 bytes
                from tansu_spark.functions.iceberg_hash import (
                    iceberg_bucket_str_col,
                )

                return iceberg_bucket_str_col(col, n), alias
            # remaining types (decimal/double/binary) keep the documented
            # engine-portable md5 route
            from tansu_spark.functions.sampling import hash_bucket

            nib8 = F.substring(hash_bucket(col, seed=0), 1, 8)
            return (
                (F.conv(nib8, 16, 10).cast("long") % n).cast("int"),
                alias,
            )
        m = _re.fullmatch(r"\s*truncate\s*\(\s*(\d+)\s*,\s*([\w.]+)\s*\)\s*", spec)
        if m:
            w, col = int(m.group(1)), m.group(2)
            dtype = dict(df.dtypes).get(col, "")
            if dtype in ("string",):
                c = F.substring(F.col(col), 1, w)
            else:
                v = F.col(col)
                c = v - ((v % w + w) % w)
            return c, f"{col.replace('.', '_')}_trunc"
        m = _re.fullmatch(r"\s*(year|month|day|hour)\s*\(\s*([\w.]+)\s*\)\s*", spec)
        if m:
            fn, col = m.group(1), m.group(2)
            c = {
                "year": F.year,
                "month": F.month,
                "day": F.dayofmonth,
                "hour": F.hour,
            }[fn](F.col(col))
            return c, f"{col.replace('.', '_')}_{fn}"
        return None

    def _apply(self, df: DataFrame, cfg: dict[str, Any]) -> tuple[DataFrame, list[str]]:
        # 1. generated columns (before normalize, so exprs can see structs —
        #    matching write_with_datafusion which runs on the raw batch).
        for name, sql in cfg["generate"].items():
            df = df.withColumn(name, F.expr(sql))
        # 2. normalize
        if cfg["normalize"]:
            df = flatten_structs(df, cfg["separator"])
        # 3. resolve partition columns: post-normalize names first, then
        #    nested refs materialized under a flattened alias.
        part_cols: list[str] = []
        for spec in cfg["partition"]:
            flat = spec.replace(".", cfg["separator"]) if cfg["normalize"] else None
            transform = self.partition_transform(spec, df)
            if transform is not None:
                col, alias = transform
                df = df.withColumn(alias, col)
                part_cols.append(alias)
            elif spec in df.columns:
                part_cols.append(spec)
            elif flat and flat in df.columns:
                part_cols.append(flat)  # nested ref already flattened
            else:
                alias = spec.replace(".", "_")
                df = df.withColumn(alias, F.expr(spec))
                part_cols.append(alias)
        return df, part_cols

    # -------------------------------------------------------- schema migration
    def _migrate_schema(self, topic: str, incoming: StructType) -> None:
        """Add-only column evolution (delta.rs:624-667): new fields append,
        type changes are rejected."""
        path = os.path.join(self.table_dir(topic), "_schema.json")
        old = read_json(path, None)
        new = {f.name: f.dataType.simpleString() for f in incoming.fields}
        if old is not None:
            for name, t in new.items():
                if name in old and old[name] != t:
                    raise ValueError(
                        f"schema migration rejected for {topic!r}: column "
                        f"{name!r} changes {old[name]} -> {t} (add-only)"
                    )
            merged = {**old, **new}
        else:
            merged = new
        write_json_atomic(path, merged)

    # ------------------------------------------------------------------ store
    def store(self, topic: str) -> int:
        """Materialize newly produced records to the lake table; returns the
        number of rows appended. Incremental on the per-partition offset
        frontier, so repeated calls are cheap and exactly-once.
        Instrumented as `lakehouse_store_duration` (the reference's OTel
        histogram, nisshi-schema/src/lake.rs:154-176)."""
        from tansu_spark import metrics as M

        with M.timed("lakehouse_store_duration"):
            return self._store_impl(topic)

    def _store_impl(self, topic: str) -> int:
        cfg = self._lake_config(topic)
        if not cfg["sink"]:
            return 0
        # Fail fast, by name, if the topic asks for a table runtime the
        # environment doesn't ship (S4/S5 gate — parquet always works).
        require_lake_runtime(self.spark, cfg["format"])
        highs = self.broker.list_offsets(topic, "latest")

        state_key = f"{self.database}.{topic}"
        with file_lock(self._state_path() + ".lock"):
            state = read_json(self._state_path(), {})
            done = {int(p): o for p, o in state.get(state_key, {}).items()}

            df = self.broker.typed_records(topic)
            lo = F.create_map(
                *[
                    x
                    for p in highs
                    for x in (F.lit(p), F.lit(done.get(p, 0)))
                ]
            )
            hi = F.create_map(
                *[x for p, h in highs.items() for x in (F.lit(p), F.lit(h))]
            )
            fresh = df.filter(
                (F.col("offset") >= lo[F.col("partition")])
                & (F.col("offset") < hi[F.col("partition")])
            ).drop("txn_id", "control")

            out, part_cols = self._apply(fresh, cfg)
            n = out.count()
            if n:
                self._migrate_schema(topic, out.schema)
                # Iceberg-compatible field ids (avro.rs:63 ids map;
                # json/arrow.rs:70-78): assigned once per path, persisted
                # per table so add-only migration and maintenance
                # rewrites keep them stable (Iceberg matches columns by
                # id). See lake/field_ids.py.
                from tansu_spark.lake.field_ids import (
                    apply_field_ids,
                    assign_field_ids,
                )

                ids_path = os.path.join(self.table_dir(topic), "_field_ids.json")
                ids = assign_field_ids(out.schema, read_json(ids_path, {}))
                out = apply_field_ids(out, ids)
                os.makedirs(self.table_dir(topic), exist_ok=True)
                write_json_atomic(ids_path, ids)
                writer = out.write.mode("append").option("mergeSchema", "true")
                if part_cols:
                    writer = writer.partitionBy(*part_cols)
                if cfg["format"] == "parquet":
                    writer.parquet(self.table_dir(topic))
                    # Table version per committed append (Delta-log
                    # equivalent; maintenance rewrites add their own
                    # versions).
                    from tansu_spark.lake.snapshots import commit_snapshot

                    commit_snapshot(self.table_dir(topic), "append")
                    if cfg["delta_log"]:
                        from tansu_spark.lake.delta_log import export_delta_log

                        export_delta_log(self.spark, self.table_dir(topic))
                elif cfg["format"] == "delta":
                    # Native Delta runtime (gate passed above): Delta
                    # supports path-based tables, creates the transaction
                    # log on first write, and honours mergeSchema — the
                    # log IS the snapshot mechanism, no parquet-side
                    # commit marker.
                    writer.format("delta").save(self.table_dir(topic))
                else:
                    # Iceberg (ADVICE r3): the V1 path writer can only
                    # APPEND to a pre-existing HadoopTables table — it
                    # cannot create one — and parquet's mergeSchema option
                    # is a no-op there. Go through the V2 writer against
                    # the catalog table: create on first store (with the
                    # topic's partition transforms), append after, with
                    # Iceberg's own schema-evolution switch.
                    ident = f"{self._iceberg_catalog()}.{self.database}.{topic}"
                    w2 = (
                        out.writeTo(ident)
                        .option("merge-schema", "true")
                        .option("mergeSchema", "true")
                    )
                    if not self.spark.catalog.tableExists(ident):
                        if part_cols:
                            w2 = w2.partitionedBy(*[F.col(c) for c in part_cols])
                        w2.create()
                    else:
                        w2.append()

            state[state_key] = {str(p): h for p, h in highs.items()}
            write_json_atomic(self._state_path(), state)
        return n

    def _iceberg_catalog(self) -> str:
        """Name of the session's configured Iceberg catalog (the gate in
        require_lake_runtime guarantees one exists when this runs)."""
        jconf = self.spark.sparkContext._jsc.sc().conf().getAll()
        for kv in jconf:
            k, v = str(kv._1()), str(kv._2())
            if (
                k.startswith("spark.sql.catalog.")
                and k.count(".") == 3
                and "iceberg" in v.lower()
            ):
                return k.rsplit(".", 1)[1]
        raise LakeRuntimeUnavailable(
            "no spark.sql.catalog.<name> entry names an Iceberg catalog"
        )

    def read(self, topic: str) -> DataFrame:
        """The lake table, schema-merged across file generations."""
        return self.spark.read.option("mergeSchema", "true").parquet(
            self.table_dir(topic)
        )
