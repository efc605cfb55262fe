"""Custom Python data source (Spark 4 DataSource API): a deterministic
synthetic documents generator, registered as ``synthetic_docs``.

Demonstrates the engine's source-extensibility surface — the same API a
user would implement to wrap an internal REST/queue/blob feed as a
first-class ``spark.read.format(...)`` source — while being genuinely
useful here: corpus-shaped test data of ANY size with no fixture files,
generated IN PARALLEL (one reader per partition, each producing its own
id range) and fully deterministic (LCG seeded by (seed, doc_id), so the
same options always yield byte-identical rows on any cluster layout).

Usage::

    spark.dataSource.register(SyntheticDocsDataSource)
    df = (spark.read.format("synthetic_docs")
          .option("n", 10_000).option("partitions", 8)
          .option("seed", 42).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_WORDS = (
    "the of and to in is it for on with as at by from up about into over "
    "data spark stream route filter topic batch shuffle join window state "
    "corpus token model train sample index vector cluster quality merge"
).split()

_LANGS = ("en", "de", "es", "fr", "zh")
_SOURCES = tuple(f"src{i}" for i in range(20))

#: 64-bit LCG constants (Knuth MMIX) — stable across platforms.
_LCG_A = 6364136223846793005
_LCG_C = 1442695040888963407
_MASK = (1 << 64) - 1


def _rng(seed: int, doc_id: int) -> int:
    return ((seed ^ (doc_id * 0x9E3779B97F4A7C15)) * _LCG_A + _LCG_C) & _MASK


def _gen_row(seed: int, doc_id: int) -> tuple:
    """One deterministic synthetic row — shared by the batch reader and
    the stream reader so a streamed prefix equals the batch read of the
    same id range byte-for-byte."""
    s = _rng(seed, doc_id)
    n_words = 20 + (s >> 8) % 180
    words = []
    w = s
    for _ in range(n_words):
        w = (w * _LCG_A + _LCG_C) & _MASK
        words.append(_WORDS[(w >> 16) % len(_WORDS)])
    text = " ".join(words)
    return (
        doc_id,
        text,
        _LANGS[(s >> 24) % len(_LANGS)],
        _SOURCES[(s >> 32) % len(_SOURCES)],
        len(text),
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = max(int(options.get("partitions", 4)), 1)
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        step = -(-self.n // self.parts)
        return [
            _Range(lo, min(lo + step, self.n), self.seed)
            for lo in range(0, self.n, step)
        ]

    def read(self, partition):
        for doc_id in range(partition.start, partition.end):
            yield _gen_row(partition.seed, doc_id)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self):
        return StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
                StructField("lang", StringType()),
                StructField("source", StringType()),
                StructField("n_chars", IntegerType()),
            ]
        )

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema):
        return _SyntheticDocsStreamReader(self.options)


class _SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same source (Spark 4
    ``SimpleDataSourceStreamReader``): each micro-batch emits the next
    ``batch_rows`` ids until ``n`` is exhausted, offsets are the plain
    next-id cursor, and ``readBetweenOffsets`` replays any committed
    range deterministically (exactly-once on recovery follows from row
    = f(seed, doc_id) — the same property the batch reader has across
    partitions, here across offsets)."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.batch = max(int(options.get("batch_rows", 100)), 1)
        self.seed = int(options.get("seed", 0))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        s = int(start["next"])
        e = min(s + self.batch, self.n)
        return (
            iter([_gen_row(self.seed, i) for i in range(s, e)]),
            {"next": e},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [
                _gen_row(self.seed, i)
                for i in range(int(start["next"]), int(end["next"]))
            ]
        )
