"""Spark 4 Python DataSource (`pyspark.sql.datasource`): a
partition-parallel synthetic document corpus.

Why it exists: the reference's whole ingest surface is file uploads;
a modern Spark engine also speaks CUSTOM sources (SaaS APIs, internal
services, generators) through the V2 DataSource API, and Spark 4
finally exposes that API to pure Python. This module demonstrates the
full contract — schema declaration, options, partition planning, and
per-partition iteration — on a generator whose content is a CLOSED
FORM of (doc_id), so the DuckDB oracle can regenerate every row and
prove the source end-to-end (the d05 WAV-decode trick applied to a
source).

Scale shape: ``partitions()`` plans one InputPartition per requested
split; each executor materializes only its own id-range — the same
contract a real paginated-API or shard-ranged source implements. No
data ever sits on the driver.

Worker-import note: the classes are defined INSIDE the factory, so
cloudpickle serializes them by value — a vanilla driver session (the
driver contract) never needs this package importable on executors.
"""

from __future__ import annotations

#: Closed-form generator constants — mirrored literally in the SQL
#: oracle; change one and the oracle string must change with it.
PYDS_VOCAB: tuple[str, ...] = (
    "key", "agg", "row", "scan", "slow", "fast", "table", "value",
    "part", "hash", "merge", "batch", "spark", "line", "sort", "window",
)
PYDS_LANGS: tuple[str, ...] = ("en", "es", "fr")


def synthetic_doc(doc_id: int) -> tuple[int, str, str]:
    """The closed form: n_words = 5 + doc_id % 10, word_j =
    VOCAB[(doc_id * 31 + j * 7) % 16], lang = LANGS[doc_id % 3]."""
    n = 5 + doc_id % 10
    text = " ".join(PYDS_VOCAB[(doc_id * 31 + j * 7) % 16] for j in range(n))
    return doc_id, text, PYDS_LANGS[doc_id % 3]


def make_synthetic_docs_source():
    """Build (by-value-picklable) DataSource classes and return the
    DataSource class, ready for ``spark.dataSource.register``."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    vocab = PYDS_VOCAB
    langs = PYDS_LANGS

    class SyntheticDocsReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 100))
            self.splits = int(options.get("splits", 8))

        def partitions(self):
            return [InputPartition(p) for p in range(self.splits)]

        def read(self, partition):
            p = partition.value
            for doc_id in range(p, self.n, self.splits):
                n = 5 + doc_id % 10
                text = " ".join(
                    vocab[(doc_id * 31 + j * 7) % 16] for j in range(n)
                )
                yield (doc_id, text, langs[doc_id % 3])

    class SyntheticDocsSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_docs"

        def schema(self):
            return "doc_id bigint, text string, lang string"

        def reader(self, schema):
            return SyntheticDocsReader(self.options)

    return SyntheticDocsSource


def register(spark) -> None:
    spark.dataSource.register(make_synthetic_docs_source())


def make_synthetic_docs_stream_source():
    """Streaming variant: the same closed-form corpus served as an
    offset-tracked micro-batch stream (Spark 4
    ``SimpleDataSourceStreamReader``). Offsets are plain row
    positions; ``readBetweenOffsets`` regenerates any committed range
    deterministically, which is the whole exactly-once replay
    contract — a restarted query re-reads an uncommitted batch and
    gets byte-identical rows. ``read`` caps at ``n`` so a bounded run
    drains to a fixed, oracle-checkable prefix."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    vocab = PYDS_VOCAB
    langs = PYDS_LANGS

    class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.n = int(options.get("n", 100))
            self.batch = int(options.get("batch", 25))

        def initialOffset(self):
            return {"pos": 0}

        def _rows(self, lo, hi):
            # a LIST, not a generator: the runtime's prefetch cache
            # copy.copy()s the returned iterator (generators aren't
            # copyable; list iterators are)
            return [
                (
                    doc_id,
                    " ".join(vocab[(doc_id * 31 + j * 7) % 16] for j in range(k)),
                    langs[doc_id % 3],
                )
                for doc_id in range(lo, hi)
                for k in (5 + doc_id % 10,)
            ]

        def read(self, start):
            pos = start["pos"]
            end = min(pos + self.batch, self.n)
            return iter(self._rows(pos, end)), {"pos": end}

        def readBetweenOffsets(self, start, end):
            return iter(self._rows(start["pos"], end["pos"]))

        def commit(self, end):
            pass

    class SyntheticDocsStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_docs_stream"

        def schema(self):
            return "doc_id bigint, text string, lang string"

        def simpleStreamReader(self, schema):
            return SyntheticDocsStreamReader(self.options)

    return SyntheticDocsStreamSource


def register_stream(spark) -> None:
    spark.dataSource.register(make_synthetic_docs_stream_source())


def make_snapshot_changes_stream_source():
    """Streaming READ of the manifest snapshot table (round 15 — the
    `spark.readStream.format("delta")` analog for the D102 protocol):
    offsets are snapshot VERSIONS, so the streaming engine's
    checkpointed offset IS a manifest pointer. Each micro-batch
    delivers the rows ADDED between the last committed version and
    the current head — O(|new data|), never the table — by diffing
    manifests exactly like `layout.snapshot_changes`, including its
    append-only lineage check (a COW rewrite or merge-on-read delete
    in the range raises rather than double-counting survivors).
    ``readBetweenOffsets`` re-reads any (v_from, v_to] range
    deterministically from the immutable manifests — the exactly-once
    replay contract comes free from the snapshot design. Offset
    {"version": 0} means "the current snapshot first" (Delta's
    starting mode): batch 1 is the head's full file set, later
    batches are deltas.

    Scale/shape note: the Simple stream-reader API materializes each
    batch on the DRIVER (pyarrow reads of exactly the added files) —
    right for control-plane-sized deltas and for this contract test;
    a partition-parallel `DataSourceStreamReader` with per-file
    InputPartitions is the same read path fanned out, and the offset
    protocol here is unchanged by that upgrade."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    # Everything below is SELF-CONTAINED on purpose (no etl_cortex_spark
    # imports): Python DataSource planner code runs in its own worker
    # process, which inherits neither the driver's sys.path nor its
    # addPyFile set — round-15 verify caught the import failing under
    # an out-of-repo session. The manifest grammar is 10 lines; inlining
    # it keeps the source usable from any session, which is the whole
    # point of a DataSource.

    def latest_version(path):
        import glob
        import os

        versions = [
            int(os.path.basename(m).split(".")[0][1:])
            for m in glob.glob(os.path.join(path, "v*.manifest.json"))
        ]
        return max(versions) if versions else 0

    def load_meta(path, v):
        import json
        import os

        target = os.path.join(path, f"v{v}.manifest.json")
        if not os.path.exists(target):
            raise ValueError(f"snapshot stream: version {v} missing at {path}")
        with open(target) as f:
            raw = json.load(f)
        if "segments" not in raw:
            return raw
        # round-17 SEGMENTED grammar: the manifest lists immutable
        # segment files; concatenate their file lists in order and
        # expand delete coverage (still self-contained — both grammars
        # together stay a ~20-line inline loader)
        files, meta = [], {k: v2 for k, v2 in raw.items() if k != "segments"}

        def seg_files(name):
            with open(os.path.join(path, name)) as f:
                return json.load(f)["files"]

        for name in raw["segments"]:
            files += seg_files(name)
        meta["files"] = files
        if raw.get("deletes"):
            out = []
            for d in raw["deletes"]:
                if "applies_to_segments" in d:
                    cover = []
                    for name in d["applies_to_segments"]:
                        cover += seg_files(name)
                    d = {"files": d["files"], "keys": d["keys"],
                         "applies_to": cover}
                out.append(d)
            meta["deletes"] = out
        return meta

    def added_files(path, v_from, v_to):
        prev_meta = load_meta(path, v_from) if v_from else {"files": []}
        first_files = set(prev_meta["files"])
        prev = set(prev_meta["files"])
        prev_dels = prev_meta.get("deletes") or []
        prev_pos = prev_meta.get("pos_deletes") or []
        for v in range(v_from + 1, v_to + 1):
            meta = load_meta(path, v)
            cur = set(meta["files"])
            if (
                not prev <= cur
                or (meta.get("deletes") or []) != prev_dels
                or (meta.get("pos_deletes") or []) != prev_pos
                or (meta.get("renames") or [])
                != (prev_meta.get("renames") or [])
            ):
                raise ValueError(
                    f"snapshot stream: version {v} is not a pure append "
                    "(rewrite or merge-on-read delete in range) — an "
                    "added-files stream cannot represent it"
                )
            prev, prev_dels = cur, meta.get("deletes") or []
            prev_pos = meta.get("pos_deletes") or []
            prev_meta = meta
        return sorted(
            set(load_meta(path, v_to)["files"]) - first_files
        )

    def rows_of(files, cols):
        # a LIST, not a generator (the prefetch cache copy.copy()s the
        # iterator). Rows are aligned to the DECLARED schema's column
        # NAMES explicitly (round-16 ADVICE): relying on parquet column
        # order silently misaligns or truncates values when a later
        # append wrote its columns in a different order or added a
        # column (additive evolution) — the append-only lineage check
        # does not guard schema drift. Missing declared columns
        # surface as None; columns the declared schema doesn't know
        # are ignored (the stream's schema is fixed at start, the CDC
        # convention). Round 19: columns are PRUNED at the parquet
        # read (undeclared columns are never decoded) and rows are
        # built column-wise (one to_pylist per column + zip) instead
        # of via per-row dicts — same tuples, same alignment, no
        # per-row dict churn.
        import pyarrow.parquet as pq

        out = []
        for f in files:
            pf = pq.ParquetFile(f)
            have = set(pf.schema_arrow.names)
            tbl = pf.read(columns=[c for c in cols if c in have])
            series = [
                tbl.column(c).to_pylist()
                if c in tbl.column_names
                else [None] * tbl.num_rows
                for c in cols
            ]
            out.extend(zip(*series))
        return out

    class SnapshotChangesStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options, cols):
            self.path = options["path"]
            self.start_version = int(options.get("start_version", 0))
            self.cols = cols  # declared schema's column names, fixed at start

        def initialOffset(self):
            return {"version": self.start_version}

        def read(self, start):
            v0 = start["version"]
            head = latest_version(self.path)
            if head <= v0:
                return iter([]), {"version": v0}
            return iter(
                rows_of(added_files(self.path, v0, head), self.cols)
            ), {"version": head}

        def readBetweenOffsets(self, start, end):
            return iter(
                rows_of(
                    added_files(self.path, start["version"], end["version"]),
                    self.cols,
                )
            )

        def commit(self, end):
            pass

    class SnapshotChangesStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "snapshot_changes_stream"

        def schema(self):
            # one footer read of the newest file (the _version_schema
            # rule): arrow types mapped to the DDL subset the protocol
            # fixtures use; anything else raises rather than guessing
            import pyarrow.parquet as pq

            head = latest_version(self.options["path"])
            if not head:
                raise ValueError("snapshot stream: empty table")
            files = load_meta(self.options["path"], head)["files"]
            sch = pq.read_schema(files[-1])
            m = {
                "int64": "bigint", "int32": "int", "double": "double",
                "float": "float", "string": "string", "large_string": "string",
                "bool": "boolean",
            }
            parts = []
            for field in sch:
                t = m.get(str(field.type))
                if t is None:
                    raise ValueError(
                        f"snapshot stream: unmapped column type {field.type}"
                    )
                parts.append(f"{field.name} {t}")
            return ", ".join(parts)

        def simpleStreamReader(self, schema):
            # hand the reader the DECLARED column names so every
            # record aligns by name, not parquet position (see rows_of);
            # schema=None (direct/recovery construction) re-derives the
            # same names from this source's own DDL
            if schema is not None:
                cols = [f.name for f in schema.fields]
            else:
                cols = [p.strip().split(" ")[0] for p in self.schema().split(",")]
            return SnapshotChangesStreamReader(self.options, cols)

    return SnapshotChangesStreamSource


def register_snapshot_stream(spark) -> None:
    spark.dataSource.register(make_snapshot_changes_stream_source())


def make_snapshot_tail_stream_source():
    """`layout.snapshot_tail`'s cursor + rate-limit contract as a
    Spark streaming DataSource (round 19 — the r18 verdict's #4):
    ``spark.readStream.format("snapshot_tail_stream")`` with offsets
    that ARE snapshot versions, so the engine's checkpoint replaces
    the tail's cursor file, and an optional ``max_files`` option that
    cuts each micro-batch at the last version fitting the file budget
    (Delta's maxFilesPerTrigger) — the backlog drains across
    micro-batches/restarts, each offset a consistent version
    boundary. Every step is validated append-only at the FILE level
    (subset test + unchanged delete sets), which also tolerates the
    round-19 tiered segment consolidation — a consolidation commit
    rewrites segment NAMES, never drops a file. ``readBetweenOffsets``
    replays any committed window deterministically from the immutable
    manifests; exactly-once downstream composes with
    ``snapshot_append(batch_id=<engine batch id>)`` in foreachBatch,
    the same ledger the sinks use.

    Self-contained on purpose (no etl_cortex_spark imports): Python
    DataSource planner code runs in its own worker process that
    inherits neither sys.path nor addPyFile — the round-15 lesson.
    Driver-side materialization via the Simple reader is right for
    rate-limited control-plane batches; a partition-parallel
    DataSourceStreamReader is the same walk fanned out."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    def latest_version(path):
        import glob
        import os

        versions = [
            int(os.path.basename(m).split(".")[0][1:])
            for m in glob.glob(os.path.join(path, "v*.manifest.json"))
        ]
        return max(versions) if versions else 0

    def load_files(path, v):
        import json
        import os

        target = os.path.join(path, f"v{v}.manifest.json")
        if not os.path.exists(target):
            raise ValueError(
                f"snapshot tail stream: version {v} missing at {path} "
                "(expired past the checkpoint? re-seed the stream)"
            )
        with open(target) as f:
            raw = json.load(f)
        if "segments" not in raw:
            return raw.get("files") or [], raw
        files = []
        for name in raw["segments"]:
            with open(os.path.join(path, name)) as f:
                files += json.load(f)["files"]
        return files, raw

    def step_added(path, v_prev, prev_files, prev_raw, v):
        """Added files of one step, validated append-only: the file
        set may only grow and the MOR delete sets may not change —
        a consolidation step passes (names rewritten, files kept),
        a COW rewrite/compact/rollback raises."""
        cur_files, cur_raw = load_files(path, v)
        prev_set = set(prev_files)
        if (
            not prev_set <= set(cur_files)
            or (cur_raw.get("deletes") or []) != (prev_raw.get("deletes") or [])
            or (cur_raw.get("pos_deletes") or [])
            != (prev_raw.get("pos_deletes") or [])
            or (cur_raw.get("renames") or [])
            != (prev_raw.get("renames") or [])
        ):
            raise ValueError(
                f"snapshot tail stream: version {v} is not a pure "
                "append (rewrite or merge-on-read delete) — re-seed "
                "the stream or use the CDF source"
            )
        added = [f for f in cur_files if f not in prev_set]
        return added, cur_files, cur_raw

    def window_plan(path, v_from, v_to, max_files):
        """(cut_version, added_files_in_commit_order) for the pull
        window, honoring the file budget at version boundaries; a
        single over-budget commit still drains whole."""
        if v_from:
            prev_files, prev_raw = load_files(path, v_from)
        else:
            prev_files, prev_raw = [], {}
        out, taken, cut = [], 0, v_from
        for v in range(v_from + 1, v_to + 1):
            added, prev_files, prev_raw = step_added(
                path, v - 1, prev_files, prev_raw, v
            )
            if max_files and cut > v_from and taken + len(added) > max_files:
                break
            out += added
            taken += len(added)
            cut = v
            if max_files and taken >= max_files:
                break
        return cut, out

    def rows_of(files, cols):
        # LIST-backed, name-aligned (see the changes source's twin);
        # round 19: column-pruned read + column-wise tuple build
        import pyarrow.parquet as pq

        out = []
        for f in files:
            pf = pq.ParquetFile(f)
            have = set(pf.schema_arrow.names)
            tbl = pf.read(columns=[c for c in cols if c in have])
            series = [
                tbl.column(c).to_pylist()
                if c in tbl.column_names
                else [None] * tbl.num_rows
                for c in cols
            ]
            out.extend(zip(*series))
        return out

    class SnapshotTailStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options, cols):
            self.path = options["path"]
            self.start_version = int(options.get("start_version", 0))
            self.max_files = int(options.get("max_files", 0))
            self.cols = cols

        def initialOffset(self):
            return {"version": self.start_version}

        def read(self, start):
            v0 = start["version"]
            head = latest_version(self.path)
            if head <= v0:
                return iter([]), {"version": v0}
            cut, files = window_plan(self.path, v0, head, self.max_files)
            return iter(rows_of(files, self.cols)), {"version": cut}

        def readBetweenOffsets(self, start, end):
            _, files = window_plan(
                self.path, start["version"], end["version"], 0
            )
            return iter(rows_of(files, self.cols))

        def commit(self, end):
            pass

    class SnapshotTailStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "snapshot_tail_stream"

        def schema(self):
            import pyarrow.parquet as pq

            head = latest_version(self.options["path"])
            if not head:
                raise ValueError("snapshot tail stream: empty table")
            files, _ = load_files(self.options["path"], head)
            if not files:
                raise ValueError(
                    "snapshot tail stream: head references no data files"
                )
            sch = pq.read_schema(files[-1])
            m = {
                "int64": "bigint", "int32": "int", "double": "double",
                "float": "float", "string": "string",
                "large_string": "string", "bool": "boolean",
            }
            parts = []
            for field in sch:
                t = m.get(str(field.type))
                if t is None:
                    raise ValueError(
                        f"snapshot tail stream: unmapped column type "
                        f"{field.type}"
                    )
                parts.append(f"{field.name} {t}")
            return ", ".join(parts)

        def simpleStreamReader(self, schema):
            if schema is not None:
                cols = [f.name for f in schema.fields]
            else:
                cols = [
                    p.strip().split(" ")[0] for p in self.schema().split(",")
                ]
            return SnapshotTailStreamReader(self.options, cols)

    return SnapshotTailStreamSource


def register_snapshot_tail_stream(spark) -> None:
    spark.dataSource.register(make_snapshot_tail_stream_source())


def make_snapshot_tail_stream_dist_source():
    """PARTITION-PARALLEL snapshot tail source (round 19 — the
    executor-side upgrade every Simple-reader docstring in this module
    points at): a full `DataSourceStreamReader` whose `partitions(
    start, end)` plans ONE InputPartition per data file added in the
    offset window (the same validated append-only file walk as
    `snapshot_tail_stream`) and whose `read(partition)` runs ON THE
    EXECUTORS — each task pyarrow-reads exactly its own file, so a
    micro-batch over a wide backlog scans in parallel and the rows
    never pass through the driver. This is the 100 TB-shaped read
    path; the Simple variant remains for rate-limited control-plane
    batches (the full-reader API has no start-aware admission control
    in PySpark 4, so `max_files` lives there).

    Offsets are snapshot versions; planning stays O(new versions +
    new segments) driver JSON; replay determinism comes from the
    immutable manifests (`partitions(start, end)` is a pure function
    of the log). Classes defined in the factory → cloudpickle ships
    them by value; executors need no repo on sys.path (the round-15
    lesson, same as every source here)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    def latest_version(path):
        import glob
        import os

        versions = [
            int(os.path.basename(m).split(".")[0][1:])
            for m in glob.glob(os.path.join(path, "v*.manifest.json"))
        ]
        return max(versions) if versions else 0

    def load_files(path, v):
        import json
        import os

        target = os.path.join(path, f"v{v}.manifest.json")
        if not os.path.exists(target):
            raise ValueError(
                f"snapshot tail dist stream: version {v} missing at "
                f"{path} (expired past the checkpoint? re-seed)"
            )
        with open(target) as f:
            raw = json.load(f)
        if "segments" not in raw:
            return raw.get("files") or [], raw
        files = []
        for name in raw["segments"]:
            with open(os.path.join(path, name)) as f:
                files += json.load(f)["files"]
        return files, raw

    def added_files(path, v_from, v_to):
        """Validated append-only walk, tolerant of consolidation
        (file-level subset test; a rewrite or MOR-delete step
        raises)."""
        if v_from:
            prev_files, prev_raw = load_files(path, v_from)
        else:
            prev_files, prev_raw = [], {}
        out = []
        for v in range(v_from + 1, v_to + 1):
            cur_files, cur_raw = load_files(path, v)
            prev_set = set(prev_files)
            if (
                not prev_set <= set(cur_files)
                or (cur_raw.get("deletes") or [])
                != (prev_raw.get("deletes") or [])
                or (cur_raw.get("pos_deletes") or [])
                != (prev_raw.get("pos_deletes") or [])
                or (cur_raw.get("renames") or [])
                != (prev_raw.get("renames") or [])
            ):
                raise ValueError(
                    f"snapshot tail dist stream: version {v} is not a "
                    "pure append — re-seed or use the CDF source"
                )
            out += [f for f in cur_files if f not in prev_set]
            prev_files, prev_raw = cur_files, cur_raw
        return out

    class FilePartition(InputPartition):
        def __init__(self, path, cols, types):
            self.path = path
            self.cols = cols
            self.types = types  # DDL type names aligned with cols

    class SnapshotTailDistReader(DataSourceStreamReader):
        def __init__(self, options, cols, types):
            self.path = options["path"]
            self.start_version = int(options.get("start_version", 0))
            self.cols = cols
            self.types = types

        def initialOffset(self):
            return {"version": self.start_version}

        def latestOffset(self):
            return {"version": latest_version(self.path)}

        def partitions(self, start, end):
            files = added_files(
                self.path, start["version"], end["version"]
            )
            # one task per file: the executor-parallel scan; an empty
            # window still needs ≥1 (zero-row) partition — the engine
            # rejects an empty list
            if not files:
                return [FilePartition(None, self.cols, self.types)]
            return [FilePartition(f, self.cols, self.types) for f in files]

        def read(self, partition):
            # EXECUTOR-side: this function runs in the task's Python
            # worker — only stdlib + pyarrow, no repo imports.
            # Round 19: yield ARROW BATCHES, not per-row Python tuples
            # — the engine accepts pyarrow.RecordBatch from DataSource
            # readers (the batch snapshot source already relies on it)
            # and the columnar path skips the per-row pickle + convert
            # hop entirely (guide §4: control how much crosses the
            # boundary and how). Columns are PRUNED at the parquet
            # read (only declared columns are decoded) and aligned BY
            # NAME to the declared schema: a column missing from an
            # older file (additive evolution) surfaces as typed nulls,
            # exactly the tuple path's rec.get(c) semantics; a file
            # whose physical type differs is cast to the declared
            # type (the tuple path coerced implicitly).
            import pyarrow as pa
            import pyarrow.parquet as pq

            if partition.path is None:
                return iter([])
            amap = {
                "bigint": pa.int64(), "int": pa.int32(),
                "double": pa.float64(), "float": pa.float32(),
                "string": pa.string(), "boolean": pa.bool_(),
            }
            pf = pq.ParquetFile(partition.path)
            have = set(pf.schema_arrow.names)
            tbl = pf.read(columns=[c for c in partition.cols if c in have])
            arrays = []
            for c, t in zip(partition.cols, partition.types):
                typ = amap[t]
                if c in tbl.column_names:
                    a = tbl.column(c)
                    if a.type != typ:
                        a = a.cast(typ)
                else:
                    a = pa.nulls(tbl.num_rows, typ)
                arrays.append(a)
            out = pa.table(arrays, names=list(partition.cols))
            return iter(out.to_batches())

        def commit(self, end):
            pass

    class SnapshotTailDistSource(DataSource):
        @classmethod
        def name(cls):
            return "snapshot_tail_stream_dist"

        def schema(self):
            import pyarrow.parquet as pq

            head = latest_version(self.options["path"])
            if not head:
                raise ValueError("snapshot tail dist stream: empty table")
            files, _ = load_files(self.options["path"], head)
            if not files:
                raise ValueError(
                    "snapshot tail dist stream: head references no "
                    "data files"
                )
            sch = pq.read_schema(files[-1])
            m = {
                "int64": "bigint", "int32": "int", "double": "double",
                "float": "float", "string": "string",
                "large_string": "string", "bool": "boolean",
            }
            parts = []
            for field in sch:
                t = m.get(str(field.type))
                if t is None:
                    raise ValueError(
                        f"snapshot tail dist stream: unmapped column "
                        f"type {field.type}"
                    )
                parts.append(f"{field.name} {t}")
            return ", ".join(parts)

        def streamReader(self, schema):
            # names AND DDL type names travel to the partitions so the
            # executor-side Arrow path can null-fill/cast by declared
            # type; simpleString() yields exactly the DDL-subset names
            # this source's schema() emits
            if schema is not None:
                cols = [f.name for f in schema.fields]
                types = [f.dataType.simpleString() for f in schema.fields]
            else:
                parts = [p.strip() for p in self.schema().split(",")]
                cols = [p.split(" ")[0] for p in parts]
                types = [p.split(" ")[1] for p in parts]
            return SnapshotTailDistReader(self.options, cols, types)

    return SnapshotTailDistSource


def register_snapshot_tail_stream_dist(spark) -> None:
    spark.dataSource.register(make_snapshot_tail_stream_dist_source())


def make_snapshot_batch_source():
    """BATCH snapshot-table DataSource with STATS-PRUNED scans (round
    19): ``spark.read.format("snapshot_batch").option("path", t)``
    plans from the manifest alone — `pushFilters` (PySpark 4.1's
    data-source filter-pushdown hook) records the scan's supported
    conjuncts, `partitions()` prunes the file list against the
    manifest's per-file ZONE MAPS (``stats: {file: {col: [lo, hi]}}``)
    and BLOOM FILTERS (equality probes, md5 bit positions — the exact
    arithmetic `layout._bloom_positions_py` commits, duplicated here
    because this class must stay repo-import-free), and `read()` runs
    ON THE EXECUTORS, pyarrow-reading one surviving file per task with
    the same predicates passed down again as parquet row-group
    filters. Three pruning tiers for the one declared predicate —
    manifest file skip, row-group skip, Spark's own post-scan filter —
    which is the Iceberg/Delta scan shape expressed through the public
    DataSource API instead of `layout.snapshot_scan`'s helper calls.

    Every pushed filter is also RETURNED to Spark (the API allows
    claiming filters as fully handled; this source never does), so
    pruning can only ever skip files/row-groups the predicate provably
    excludes — a wrong zone map could lose rows, but a conservative
    keep never corrupts a result, and files committed without stats
    are always kept. Tables carrying merge-on-read delete entries
    refuse loudly (raw file reads would resurrect deleted rows —
    `layout.snapshot_read` is the MOR-aware path). ``option("version",
    n)`` time-travels: the scan resolves that manifest, immutable by
    protocol. Classes live in the factory → cloudpickled by value (the
    round-15 worker-import rule)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        InputPartition,
        LessThan,
        LessThanOrEqual,
    )

    def resolve(path, version):
        """Manifest → logical {files, stats, blooms, deletes,
        pos_deletes}, honoring both the segmented (round-17) and
        inline grammars — the read-side subset of
        `layout._resolve_meta`, repo-import-free."""
        import glob
        import json
        import os

        if version is None:
            versions = [
                int(os.path.basename(m).split(".")[0][1:])
                for m in glob.glob(os.path.join(path, "v*.manifest.json"))
            ]
            if not versions:
                raise ValueError(f"snapshot_batch: no manifests under {path}")
            version = max(versions)
        target = os.path.join(path, f"v{version}.manifest.json")
        if not os.path.exists(target):
            raise ValueError(
                f"snapshot_batch: version {version} does not exist at {path}"
            )
        with open(target) as f:
            raw = json.load(f)
        if "segments" not in raw:
            return raw
        files, stats, blooms = [], {}, {}
        for name in raw["segments"]:
            with open(os.path.join(path, name)) as f:
                seg = json.load(f)
            files += seg["files"]
            stats.update(seg.get("stats") or {})
            for c, fb in (seg.get("blooms") or {}).items():
                blooms.setdefault(c, {}).update(fb)
        meta = {k: v for k, v in raw.items() if k != "segments"}
        meta["files"] = files
        if stats:
            meta["stats"] = stats
        if blooms:
            meta["blooms"] = blooms
        return meta

    def bloom_maybe(words, value):
        """`layout._bloom_maybe_contains`' arithmetic: 8192 bits as
        128 longs, 3 md5 positions; int/str probes only (the rendering
        contract) — anything else conservatively matches."""
        import hashlib

        if not words or isinstance(value, bool) or not isinstance(
            value, (int, str)
        ):
            return True
        for i in range(3):
            p = int(
                hashlib.md5(f"{i}:{value}".encode()).hexdigest()[:8], 16
            ) % 8192
            if not (words[p // 64] >> (p % 64)) & 1:
                return False
        return True

    def range_may(rng, op, val):
        """Can a file whose column spans [lo, hi] satisfy the
        predicate? None bounds (no stats / all-null file) and
        cross-type comparisons keep the file — pruning is only ever
        a proof of exclusion."""
        lo, hi = rng
        if lo is None or hi is None:
            return True
        try:
            if op == "=":
                return lo <= val <= hi
            if op == ">":
                return hi > val
            if op == ">=":
                return hi >= val
            if op == "<":
                return lo < val
            if op == "<=":
                return lo <= val
            if op == "in":
                return any(lo <= v <= hi for v in val)
        except TypeError:
            return True
        return True

    class FilePartition(InputPartition):
        def __init__(self, path, cols, pq_filters):
            self.path = path
            self.cols = cols
            self.pq_filters = pq_filters

    class SnapshotBatchReader(DataSourceReader):
        def __init__(self, options, cols):
            self.path = options["path"]
            self.version = (
                int(options["version"]) if "version" in options else None
            )
            self.cols = cols
            self.triples = []  # (col, op, value) recorded by pushFilters

        def pushFilters(self, filters):
            ops = {
                EqualTo: "=",
                GreaterThan: ">",
                GreaterThanOrEqual: ">=",
                LessThan: "<",
                LessThanOrEqual: "<=",
                In: "in",
            }
            for f in filters:
                op = ops.get(type(f))
                if op is not None and len(f.attribute) == 1:
                    val = tuple(f.value) if op == "in" else f.value
                    self.triples.append((f.attribute[0], op, val))
            # every filter goes back to Spark: this source prunes, it
            # never claims exact evaluation
            return filters

        def partitions(self):
            meta = resolve(self.path, self.version)
            if meta.get("deletes") or meta.get("pos_deletes"):
                raise ValueError(
                    "snapshot_batch: table carries merge-on-read delete "
                    "entries — raw file scans would resurrect deleted "
                    "rows; read via layout.snapshot_read"
                )
            if meta.get("renames"):
                raise ValueError(
                    "snapshot_batch: table carries metadata-only column "
                    "renames — raw file scans would surface pre-rename "
                    "physical names; read via layout.snapshot_read or "
                    "snapshot_materialize_renames the table"
                )
            stats = meta.get("stats") or {}
            blooms = meta.get("blooms") or {}
            keep = []
            for fp in meta["files"]:
                fstats = stats.get(fp) or {}
                ok = True
                for col, op, val in self.triples:
                    rng = fstats.get(col)
                    if rng is not None and not range_may(rng, op, val):
                        ok = False
                        break
                    fb = (blooms.get(col) or {}).get(fp)
                    if fb is not None:
                        if op == "=" and not bloom_maybe(fb, val):
                            ok = False
                            break
                        if op == "in" and not any(
                            bloom_maybe(fb, v) for v in val
                        ):
                            ok = False
                            break
                if ok:
                    keep.append(fp)
            if not keep:
                return [FilePartition(None, self.cols, [])]
            pq_filters = [(c, o, list(v) if o == "in" else v)
                          for c, o, v in self.triples]
            return [
                FilePartition(fp, self.cols, pq_filters) for fp in keep
            ]

        def read(self, partition):
            # EXECUTOR-side: stdlib + pyarrow only; the recorded
            # predicates prune parquet ROW GROUPS here (footer stats),
            # then filter rows — Spark re-applies them regardless, so
            # this tier is pure I/O reduction
            import pyarrow.parquet as pq

            if partition.path is None:
                return iter([])
            tbl = pq.read_table(
                partition.path,
                columns=partition.cols,
                filters=partition.pq_filters or None,
            )
            return iter(tbl.select(partition.cols).to_batches())

    class SnapshotBatchSource(DataSource):
        @classmethod
        def name(cls):
            return "snapshot_batch"

        def schema(self):
            import pyarrow.parquet as pq

            meta = resolve(
                self.options["path"],
                int(self.options["version"])
                if "version" in self.options
                else None,
            )
            if not meta["files"]:
                raise ValueError(
                    "snapshot_batch: version references no data files"
                )
            if meta.get("renames"):
                raise ValueError(
                    "snapshot_batch: table carries metadata-only column "
                    "renames — the raw physical schema would be wrong; "
                    "read via layout.snapshot_read or "
                    "snapshot_materialize_renames the table"
                )
            sch = pq.read_schema(meta["files"][-1])
            m = {
                "int64": "bigint", "int32": "int", "double": "double",
                "float": "float", "string": "string",
                "large_string": "string", "bool": "boolean",
                "date32[day]": "date",
            }
            parts = []
            for field in sch:
                t = m.get(str(field.type))
                if t is None:
                    raise ValueError(
                        f"snapshot_batch: unmapped column type {field.type}"
                    )
                parts.append(f"{field.name} {t}")
            return ", ".join(parts)

        def reader(self, schema):
            if schema is not None:
                cols = [f.name for f in schema.fields]
            else:
                cols = [
                    p.strip().split(" ")[0] for p in self.schema().split(",")
                ]
            return SnapshotBatchReader(self.options, cols)

    return SnapshotBatchSource


def register_snapshot_batch(spark) -> None:
    spark.dataSource.register(make_snapshot_batch_source())
