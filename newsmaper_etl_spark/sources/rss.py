"""RSS source: a Spark 4 Python DataSource registering the ``rss`` format.

The reference's primary entry point is an HTTP fetch + XML parse per feed
(Extract.py:9-27: requests.get → BeautifulSoup('xml') → per-<item>
title/link/description/pubDate, media falling back <content>→<enclosure>→
the literal string 'null' — ledger L6). Re-expressed Spark-first:

- one input partition PER FEED, so a 10-feed registry fans out to 10
  parallel fetch+parse tasks on executors (the reference loops feeds
  serially on one worker) — and a 10,000-feed registry to 10,000 tasks;
- the parse is stdlib ``xml.etree`` matched on tag *localnames*, so
  namespaced ``media:content`` behaves like BeautifulSoup's
  namespace-agnostic ``find('content')``;
- the fetch is ``urllib`` for http(s) URLs and plain ``open`` for local
  paths / file:// URLs (tests and air-gapped rigs use files; the HTTP
  path is the same code shape).

Semantics pinned to the reference, with deviations documented:

- media fallback: first <content> with a url attribute, else first
  <enclosure> with a url, else 'null' (string sentinel, NOT SQL NULL —
  L6, Extract.py:14-24). A media element without a url attribute falls
  through to the next choice (the reference would KeyError; crashing on
  a malformed feed is not a behavior worth preserving).
- missing title/link/description/pubDate yield NULL (the reference
  raises AttributeError mid-extract; same deviation rationale).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

#: In-flight article schema — the frame Extract.py:43 builds, pinned.
ARTICLE_SCHEMA = StructType(
    [
        StructField("id_source", IntegerType(), True),
        StructField("title", StringType(), True),
        StructField("link", StringType(), True),
        StructField("description", StringType(), True),
        StructField("date", StringType(), True),
        StructField("media", StringType(), True),
    ]
)

_ITEM_FIELDS = ("title", "link", "description", "pubDate")


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def parse_rss_items(xml_bytes: bytes) -> Iterator[dict]:
    """Yield one dict per ``<item>`` (any namespace), reference field set.

    Pure function of the payload — shared by the DataSource executor path
    and any driver-side use; unit-testable without Spark.
    """
    root = ET.fromstring(xml_bytes)
    for elem in root.iter():
        if _localname(elem.tag) != "item":
            continue
        fields: dict[str, str | None] = {f: None for f in _ITEM_FIELDS}
        content_url = None
        enclosure_url = None
        # DESCENDANT walk, not direct children: standard MRSS nests
        # media:content inside media:group, and the reference's
        # find('content') is recursive — a child-only loop would degrade
        # every media:group feed to the 'null' sentinel
        for child in elem.iter():
            if child is elem:
                continue
            name = _localname(child.tag)
            if name in fields and fields[name] is None:
                fields[name] = (child.text or "").strip() or None
            elif name == "content" and content_url is None:
                content_url = child.get("url")
            elif name == "enclosure" and enclosure_url is None:
                enclosure_url = child.get("url")
        # L6: content → enclosure → 'null' string sentinel
        media = content_url or enclosure_url or "null"
        yield {
            "title": fields["title"],
            "link": fields["link"],
            "description": fields["description"],
            "date": fields["pubDate"],
            "media": media,
        }


def _fetch(location: str, timeout: float) -> bytes:
    if location.startswith(("http://", "https://")):
        import urllib.request

        with urllib.request.urlopen(location, timeout=timeout) as resp:  # noqa: S310
            return resp.read()
    if location.startswith("file://"):
        # a real URL parse: 'file://localhost/x' carries an authority and
        # 'file:///my%20feed.xml' percent-encodes — a bare prefix strip
        # resolved both to wrong paths
        from urllib.parse import urlparse
        from urllib.request import url2pathname

        parsed = urlparse(location)
        if parsed.netloc not in ("", "localhost"):
            raise ValueError(
                f"file:// URL with non-local authority: {location!r}"
            )
        location = url2pathname(parsed.path)
    with open(location, "rb") as fh:
        return fh.read()


class _FeedPartition(InputPartition):
    def __init__(self, source_id: int, location: str):
        self.source_id = source_id
        self.location = location


class _RssReader(DataSourceReader):
    def __init__(self, options: dict):
        import json

        feeds_opt = options.get("feeds")
        if feeds_opt:
            self.feeds = [
                (int(f["id"]), str(f["rss"])) for f in json.loads(feeds_opt)
            ]
        elif options.get("path"):
            self.feeds = [(int(options.get("source_id", 0)), options["path"])]
        else:
            raise ValueError(
                "rss source needs a `feeds` option (JSON list of "
                '{"id": ..., "rss": ...}) or a `path` option'
            )
        self.timeout = float(options.get("timeout", 10.0))
        # permissive=true: a feed that fails to fetch/parse contributes
        # zero rows instead of failing the task. Default strict — the
        # reference's posture (a bad feed aborts the run) and the safer
        # default for correctness-gated pipelines; flip it for always-on
        # polling where one broken outlet must not stall the other 9,999.
        self.permissive = str(options.get("permissive", "false")).lower() == "true"

    def partitions(self):
        # one partition per feed: the unit of fetch parallelism
        return [_FeedPartition(sid, loc) for sid, loc in self.feeds]

    def read(self, partition: _FeedPartition):
        try:
            payload = _fetch(partition.location, self.timeout)
            items = list(parse_rss_items(payload))
        except Exception:  # noqa: BLE001 — gated by the permissive option
            if self.permissive:
                import sys
                import traceback

                print(
                    f"rss: skipping feed {partition.location} "
                    f"(source {partition.source_id}):\n"
                    + traceback.format_exc(limit=1),
                    file=sys.stderr,
                )
                return
            raise
        for item in items:
            yield (
                partition.source_id,
                item["title"],
                item["link"],
                item["description"],
                item["date"],
                item["media"],
            )


class _RssStreamReader(DataSourceStreamReader):
    """Polling stream: each micro-batch re-fetches every feed and emits
    all current items — the streaming form of the reference's 20-minute
    schedule (Main.py:23); pair with ``trigger(processingTime='20
    minutes')`` and the pipeline's watermarked dedup, which turns the
    repeated-items-per-poll firehose into effectively-once per key.

    PARTITIONED like the batch reader: ``partitions()`` hands one feed
    per input partition, so each poll's fetch+parse fans out across
    executors exactly as in batch — the earlier Simple reader looped
    every feed serially ON THE DRIVER, turning a 10,000-feed poll into
    hours of blocked driver time.

    Offsets count polls. A live feed is not replayable, so recovery
    re-fetches (at-least-once at the source; the downstream dedup state
    restores exactly-once per key) — documented, inherent to polling
    sources without an upstream log.
    """

    def __init__(self, options: dict):
        self._batch = _RssReader(options)
        self._poll = 0
        # optional cross-restart floor: with a state_dir option the last
        # committed offset is persisted on commit() and restored here,
        # so a restarted reader can never emit an offset at or below the
        # committed log even when the wall clock regressed across the
        # restart (restored checkpoint on another host, clock step)
        self._state_file = None
        state_dir = options.get("state_dir")
        if state_dir:
            os.makedirs(state_dir, exist_ok=True)
            self._state_file = os.path.join(state_dir, "rss-last-offset")
            try:
                with open(self._state_file) as f:
                    self._poll = int(f.read().strip())
            except (FileNotFoundError, ValueError):
                pass

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def latestOffset(self) -> dict:
        # every poll advances: a fresh fetch is always "new data" for a
        # live feed (the watermarked dedup downstream absorbs repeats).
        # The counter is wall-clock-seeded (unix seconds) with a strict
        # in-session increase: a clean restart creates a FRESH reader
        # whose first latestOffset() fires before any partitions(start,
        # end) call could re-seed it, so a pure in-memory counter would
        # emit poll=1 below the committed log. Clock-seeding keeps the
        # offset log monotonic across NORMAL restarts; if the system
        # clock regressed past the committed offset across a restart,
        # latestOffset lands at or below the committed value and the
        # engine plans no batch — polling STALLS until the clock catches
        # up (ADVICE r06: a real stall, not just log cosmetics). The
        # state_dir option closes that window: the restored committed
        # offset floors the counter, so the first poll of the new
        # session always advances past it.
        import time

        self._poll = max(self._poll + 1, int(time.time()))
        return {"poll": self._poll}

    def partitions(self, start: dict, end: dict):
        # replay path: re-seed from the restored offsets as well, so a
        # pending batch's re-execution can't step the counter backwards
        self._poll = max(self._poll, start.get("poll", 0), end.get("poll", 0))
        return self._batch.partitions()

    def read(self, partition: _FeedPartition):
        return self._batch.read(partition)

    def commit(self, end: dict) -> None:
        committed = int(end.get("poll", 0))
        self._poll = max(self._poll, committed)
        if self._state_file is not None:
            # crash-safe single-writer persist (the engine serializes
            # commits); readers tolerate a torn/absent file by falling
            # back to clock seeding
            tmp = self._state_file + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(self._poll))
            os.replace(tmp, self._state_file)


class RssDataSource(DataSource):
    """``spark.read.format("rss")`` (batch) / ``spark.readStream`` (poll
    stream) after :func:`register_rss_source`."""

    @classmethod
    def name(cls) -> str:
        return "rss"

    def schema(self) -> StructType:
        return ARTICLE_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _RssReader(dict(self.options))

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _RssStreamReader(dict(self.options))


def register_rss_source(spark: SparkSession) -> None:
    """Idempotently register the ``rss`` format on this session."""
    spark.dataSource.register(RssDataSource)


def read_rss(
    spark: SparkSession,
    sources: DataFrame,
    permissive: bool = False,
    timeout: float = 10.0,
) -> DataFrame:
    """Read every feed in a ``sources`` registry frame (id, rss, ...) —
    the Spark form of Extract.py:30-43's scan→loop→concat.

    The registry is dimension-sized by contract (the reference's has 10
    rows), so collecting it to build the reader options is the same
    sanctioned driver-side materialization as the keyword map; the
    fetches themselves run on executors, one task per feed. Reader
    options pass through (``permissive``/``timeout``) so callers — the
    CLI included — never rebuild the option plumbing inline.
    """
    import json

    register_rss_source(spark)
    feeds = [
        {"id": r["id"], "rss": r["rss"]}
        for r in sources.select("id", "rss").collect()
    ]
    return (
        spark.read.format("rss")
        .option("feeds", json.dumps(feeds))
        .option("permissive", str(bool(permissive)).lower())
        .option("timeout", str(float(timeout)))
        .schema(ARTICLE_SCHEMA)
        .load()
    )
