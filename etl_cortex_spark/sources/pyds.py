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
