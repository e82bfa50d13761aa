"""Document-store table format as a Spark 4 **Python DataSource**
(``format("docstore")``) — the Mongo-parity surface (reference
``serving_mongo/publish_gold_to_mongo.py``) expressed engine-natively
instead of being declared out of scope:

- **Layout**: ``<path>/shards/*.jsonl`` (JSON record per line — the same
  record shape as ``io.to_json_records``) + ``<path>/manifest.json``
  naming the live shards, the stored schema, and per-shard (min, max)
  stats of the key column.
- **Write path**: every executor task streams its partition into a
  staged shard and reports (name, row count, key stats) in its commit
  message; the driver's ``commit`` publishes all staged shards with ONE
  atomic manifest replace (``overwrite`` swaps the shard list, append
  extends it). ``abort`` deletes staged files — a torn store is never
  visible because readers only trust the manifest.
- **Read path**: one input partition per shard (scales with the store),
  with real FILTER PUSHDOWN on the key column: comparison predicates
  prune whole shards via the manifest stats before any file is opened,
  then row-filter inside surviving shards — the "find by id" fast path
  of a document store (S10), backed by range-clustered writes the same
  way the lakehouse stats work.
- **Upsert** (Mongo ``replace_one(upsert=True)``, S7): ``upsert()`` =
  read + key anti-join + union + overwrite-commit — copy-on-write, same
  discipline as ``lakehouse.merge_table``. Truncate-and-load (S8) is
  ``mode("overwrite")``.

**Scale contract (r5 verdict #7)**: the writer serializes per-row in
Python (``DocStoreWriter.write``) — inherent to the Python DataSource
writer API. The format is therefore for the serving EDGE ONLY:
dimension-sized gold projections leaving the engine (the reference's
Mongo collections, 10^3-10^6 rows). Fact-sized tables MUST stay on
parquet/lakehouse; routing a fact through ``format("docstore")`` turns a
columnar JVM write into a per-row Python loop, ~100x slower at 100 TB.
Reads scale better (shard-parallel, manifest pruning) but carry
JSON-parse cost per row, so the same boundary applies.
"""

from __future__ import annotations

import json
import os
import pathlib
import tempfile
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

FORMAT_NAME = "docstore"


def _manifest_path(path: str) -> pathlib.Path:
    return pathlib.Path(path) / "manifest.json"


def _read_manifest(path: str) -> dict:
    with open(_manifest_path(path)) as f:
        return json.load(f)


def _encode_value(v):
    iso = getattr(v, "isoformat", None)
    return iso(sep=" ") if iso else v


def _decode_value(v, dtype: T.DataType):
    if v is None:
        return None
    if isinstance(dtype, T.TimestampType):
        import datetime as dt

        return dt.datetime.fromisoformat(v)
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType)):
        return int(v)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return float(v)
    return v


@dataclass
class _ShardPartition(InputPartition):
    shard: str


def prune_shards(shards: list[str], stats: dict[str, list], key_filters: list[Filter]) -> list[str]:
    """Manifest-level shard pruning for key-column comparisons: keep a
    shard only if its recorded [min, max] can satisfy EVERY pushed
    predicate; shards without stats are always kept (absence never loses
    rows). Pure function — unit-tested directly."""
    out = []
    for s in shards:
        rng = stats.get(s)
        if rng is None:
            out.append(s)
            continue
        lo, hi = rng
        keep = True
        for f in key_filters:
            v = f.value
            if isinstance(f, EqualTo):
                keep = lo <= v <= hi
            elif isinstance(f, GreaterThan):
                keep = hi > v
            elif isinstance(f, GreaterThanOrEqual):
                keep = hi >= v
            elif isinstance(f, LessThan):
                keep = lo < v
            elif isinstance(f, LessThanOrEqual):
                keep = lo <= v
            if not keep:
                break
        if keep:
            out.append(s)
    return out


def _row_pred(key: str, key_filters: list[Filter]):
    def ok(rec: dict) -> bool:
        v = rec.get(key)
        if v is None:
            return False
        for f in key_filters:
            w = f.value
            if isinstance(f, EqualTo) and not v == w:
                return False
            if isinstance(f, GreaterThan) and not v > w:
                return False
            if isinstance(f, GreaterThanOrEqual) and not v >= w:
                return False
            if isinstance(f, LessThan) and not v < w:
                return False
            if isinstance(f, LessThanOrEqual) and not v <= w:
                return False
        return True

    return ok


class DocStoreReader(DataSourceReader):
    def __init__(self, options: dict, schema: T.StructType):
        self.path = options["path"]
        self.schema = schema
        self.manifest = _read_manifest(self.path)
        self.key = self.manifest.get("key")
        self.key_filters: list[Filter] = []

    def pushFilters(self, filters: list[Filter]):
        supported = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
        for f in filters:
            # accept only single-column comparisons on the key with a
            # plain (non-null) literal — everything else stays Spark-side
            if (
                isinstance(f, supported)
                and len(f.attribute) == 1
                and f.attribute[0] == self.key
                and f.value is not None
            ):
                self.key_filters.append(f)
            else:
                yield f

    def partitions(self):
        shards = prune_shards(
            self.manifest["shards"], self.manifest.get("stats", {}), self.key_filters
        )
        # an empty partition list makes Spark fall back to read(None) —
        # keep one sentinel so "every shard pruned" means an empty scan
        return [_ShardPartition(s) for s in shards] or [_ShardPartition(None)]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        if partition is None or partition.shard is None:
            return
        fields = self.schema.fields
        pred = _row_pred(self.key, self.key_filters) if self.key_filters else None
        with open(os.path.join(self.path, "shards", partition.shard)) as f:
            for line in f:
                rec = json.loads(line)
                if pred is not None and not pred(rec):
                    continue
                yield tuple(_decode_value(rec.get(fld.name), fld.dataType) for fld in fields)


@dataclass
class _ShardCommit(WriterCommitMessage):
    staged: str
    n_rows: int
    key_min: object
    key_max: object


class DocStoreWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: T.StructType, overwrite: bool):
        self.path = options["path"]
        self.key = options.get("key")
        self.schema = schema
        self.overwrite = overwrite
        # schema enforcement happens at PLAN time (driver), not in commit:
        # an append that would silently re-point the stored schema at a
        # different shape corrupts every older shard's decode
        if not overwrite and _manifest_path(self.path).exists():
            stored = T.StructType.fromJson(_read_manifest(self.path)["schema"])
            # names + types only: nullability/metadata differences are not
            # a decode hazard and legitimately vary between writers
            shape = lambda s: [(f.name, f.dataType) for f in s.fields]
            if shape(stored) != shape(schema):
                raise ValueError(
                    f"append schema {schema.simpleString()} does not match the "
                    f"stored schema {stored.simpleString()}; use overwrite to "
                    "replace the collection"
                )

    def write(self, rows) -> _ShardCommit:
        staging = pathlib.Path(self.path) / "_staging"
        staging.mkdir(parents=True, exist_ok=True)
        name = f"{uuid.uuid4().hex}.jsonl"
        names = [f.name for f in self.schema.fields]
        n, kmin, kmax = 0, None, None
        with open(staging / name, "w") as f:
            for row in rows:
                rec = {c: _encode_value(v) for c, v in zip(names, row)}
                if self.key is not None and rec.get(self.key) is not None:
                    kv = rec[self.key]
                    kmin = kv if kmin is None or kv < kmin else kmin
                    kmax = kv if kmax is None or kv > kmax else kmax
                f.write(json.dumps(rec, sort_keys=True) + "\n")
                n += 1
        return _ShardCommit(staged=name, n_rows=n, key_min=kmin, key_max=kmax)

    def commit(self, messages) -> None:
        root = pathlib.Path(self.path)
        shards_dir = root / "shards"
        shards_dir.mkdir(parents=True, exist_ok=True)
        prev: dict = {"shards": [], "stats": {}, "txns": {}}
        if not self.overwrite and _manifest_path(self.path).exists():
            prev = _read_manifest(self.path)
        shards, stats = list(prev["shards"]), dict(prev.get("stats", {}))
        for m in messages:
            if m is None or m.n_rows == 0:
                continue
            os.replace(root / "_staging" / m.staged, shards_dir / m.staged)
            shards.append(m.staged)
            if m.key_min is not None:
                stats[m.staged] = [m.key_min, m.key_max]
        manifest = {
            "key": self.key,
            "shards": shards,
            "stats": stats,
            # streaming epoch tags ride along on appends (overwrite resets
            # them — a truncate-and-load starts a fresh stream history)
            "txns": prev.get("txns", {}),
            "schema": json.loads(self.schema.json()),
        }
        fd, tmp = tempfile.mkstemp(dir=root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps(manifest))
        os.replace(tmp, _manifest_path(self.path))  # atomic publish

    def abort(self, messages) -> None:
        root = pathlib.Path(self.path)
        for m in messages:
            if m is not None:
                try:
                    os.unlink(root / "_staging" / m.staged)
                except FileNotFoundError:
                    pass


class DocStoreStreamWriter(DataSourceStreamWriter):
    """Streaming sink: each micro-batch's staged shards publish in ONE
    manifest replace, tagged with (appId, batchId) so a batch re-delivered
    after a crash between commit and checkpoint advance is SKIPPED — the
    same exactly-once discipline as ``lakehouse.stream_ingest``. Pass
    ``option("appId", ...)`` stable across restarts of the logical stream;
    without it replays append duplicates (at-least-once)."""

    def __init__(self, options: dict, schema: T.StructType):
        self.path = options["path"]
        self.key = options.get("key")
        self.app_id = options.get("appid")  # option keys arrive lowercased
        self.schema = schema

    def write(self, rows):
        return DocStoreWriter.write(self, rows)  # same staging protocol

    def commit(self, messages, batchId: int) -> None:
        root = pathlib.Path(self.path)
        shards_dir = root / "shards"
        shards_dir.mkdir(parents=True, exist_ok=True)
        prev: dict = {"shards": [], "stats": {}, "txns": {}}
        if _manifest_path(self.path).exists():
            prev = _read_manifest(self.path)
        txns: dict = dict(prev.get("txns", {}))
        if self.app_id is not None and batchId in txns.get(self.app_id, []):
            for m in messages:  # replayed epoch: drop its staged shards
                if m is not None:
                    try:
                        os.unlink(root / "_staging" / m.staged)
                    except FileNotFoundError:
                        pass
            return
        shards, stats = list(prev["shards"]), dict(prev.get("stats", {}))
        for m in messages:
            if m is None or m.n_rows == 0:
                continue
            os.replace(root / "_staging" / m.staged, shards_dir / m.staged)
            shards.append(m.staged)
            if m.key_min is not None:
                stats[m.staged] = [m.key_min, m.key_max]
        if self.app_id is not None:
            txns.setdefault(self.app_id, []).append(int(batchId))
        manifest = {
            "key": self.key,
            "shards": shards,
            "stats": stats,
            "txns": txns,
            "schema": json.loads(self.schema.json()),
        }
        fd, tmp = tempfile.mkstemp(dir=root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps(manifest))
        os.replace(tmp, _manifest_path(self.path))

    def abort(self, messages, batchId: int) -> None:
        DocStoreWriter.abort(self, messages)


class DocStoreStreamReader(SimpleDataSourceStreamReader):
    """Streaming SOURCE: tail an append-only collection by manifest
    offset — the change-data-capture read of the serving store. The
    offset is the committed shard count; each micro-batch serves exactly
    the shards appended since the last offset, and ``readBetweenOffsets``
    replays a closed range deterministically after restart (shard names
    are never reordered: commits only append).

    Append-only is the contract: an overwrite rewrites history, so a
    shard list that no longer extends the offset's prefix raises instead
    of silently re-serving rewritten data (the reader cannot know which
    rows the checkpoint already emitted)."""

    def __init__(self, options: dict, schema: T.StructType):
        self.path = options["path"]
        self.schema = schema

    def initialOffset(self) -> dict:
        return {"shards": 0}

    def _shards(self) -> list[str]:
        return _read_manifest(self.path)["shards"]

    def _emit(self, shards: list[str]) -> Iterator[tuple]:
        # materialized, not a generator: the engine caches and COPIES the
        # returned iterator for partition planning (copy.copy fails on
        # generators); a micro-batch is a handful of shards, driver-sized
        fields = self.schema.fields
        out = []
        for s in shards:
            with open(os.path.join(self.path, "shards", s)) as f:
                for line in f:
                    rec = json.loads(line)
                    out.append(tuple(
                        _decode_value(rec.get(fld.name), fld.dataType) for fld in fields
                    ))
        return iter(out)

    def read(self, start: dict):
        shards = self._shards()
        k = int(start["shards"])
        if k > len(shards):
            raise ValueError(
                f"offset {k} beyond manifest ({len(shards)} shards): the "
                "collection was overwritten — CDC tailing needs append-only"
            )
        return self._emit(shards[k:]), {"shards": len(shards)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        shards = self._shards()
        a, b = int(start["shards"]), int(end["shards"])
        if b > len(shards):
            raise ValueError("replay range beyond manifest: collection was overwritten")
        return self._emit(shards[a:b])

    def commit(self, end: dict) -> None:
        pass  # nothing to clean: shards are immutable


class DocStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return T.StructType.fromJson(_read_manifest(self.options["path"])["schema"])

    def reader(self, schema: T.StructType) -> DocStoreReader:
        return DocStoreReader(self.options, schema)

    def writer(self, schema: T.StructType, overwrite: bool) -> DocStoreWriter:
        return DocStoreWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: T.StructType, overwrite: bool) -> DocStoreStreamWriter:
        return DocStoreStreamWriter(self.options, schema)

    def simpleStreamReader(self, schema: T.StructType) -> DocStoreStreamReader:
        return DocStoreStreamReader(self.options, schema)


def register(spark: SparkSession) -> None:
    """Idempotent format registration for the session. Also enables the
    Python-datasource filter pushdown switch (runtime conf, default off
    in Spark 4.1) — without it Spark refuses a reader that implements
    ``pushFilters``."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DocStoreDataSource)


def vacuum(path: str) -> int:
    """Delete shard files no longer referenced by the manifest (orphaned
    by overwrite commits, which swap the manifest but never delete bytes
    so that readers mid-scan keep their pinned file lists). Run only when
    no reader can still hold a pre-overwrite plan — the same retention
    contract as ``lakehouse.vacuum``. Returns the number deleted."""
    live = set(_read_manifest(path)["shards"])
    deleted = 0
    shards_dir = pathlib.Path(path) / "shards"
    for f in shards_dir.glob("*.jsonl"):
        if f.name not in live:
            f.unlink()
            deleted += 1
    return deleted


def upsert(spark: SparkSession, path: str, df: DataFrame, key: str) -> None:
    """Mongo replace_one(upsert=True) parity: rows of ``df`` replace
    stored documents with the same key, new keys insert — one atomic
    overwrite commit (copy-on-write, like ``lakehouse.merge_table``)."""
    register(spark)
    if _manifest_path(path).exists():
        existing = spark.read.format(FORMAT_NAME).load(path)
        survivors = existing.join(df.select(key), key, "left_anti")
        merged = survivors.select(df.columns).unionByName(df)
    else:
        merged = df
    merged.write.format(FORMAT_NAME).option("key", key).mode("overwrite").save(path)
