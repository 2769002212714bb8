"""SnapshotCatalog — numbered, atomically-published table snapshots.

Iceberg-shaped semantics behind a small interface (SURVEY.md §7): on a
real cluster this is Iceberg snapshot commits (config-only swap); in
the sandbox (no Iceberg runtime jar, no network) the offline backend is
Parquet directories published by an atomic manifest rename.  Both give:

* numbered snapshots per table (``round`` k → immutable directory),
* atomic publish (write staging → fsync manifest → ``os.replace``),
* time-travel (read table as of round k),
* resume: ``latest_round()`` = max committed manifest, so a crawl
  killed mid-round restarts from the last published round with no
  partial state visible (reference has no such recovery — the asyncio
  queue dies with the process; this is the north_rule checkpoint
  requirement).
"""

from __future__ import annotations

import json
import os
import time
import uuid


class SnapshotCatalog:
    """Per-crawl catalog rooted at one directory.

    Layout::

        root/
          <table>/r00003/part-*.parquet      # data, written by Spark
          <table>/_r00003.manifest.json      # atomic commit marker
          _crawl_state/r00003.json           # driver-side loop state
    """

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---------------------------------------------------------- paths
    def data_dir(self, table: str, round_: int) -> str:
        return os.path.join(self.root, table, f"r{round_:05d}")

    def _manifest_path(self, table: str, round_: int) -> str:
        return os.path.join(self.root, table, f"_r{round_:05d}.manifest.json")

    def _read_manifest(self, table: str, round_: int) -> dict | None:
        try:
            with open(self._manifest_path(table, round_)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def data_path(self, table: str, round_: int) -> str:
        """The snapshot's COMMITTED data directory — follows the
        manifest's recorded path (a rewrite of a committed round
        publishes into a fresh uuid-suffixed dir, Iceberg-style),
        falling back to the deterministic layout for uncommitted
        rounds and pre-rewrite manifests.  Readers must resolve
        through this, never ``data_dir``, or they can race a
        maintenance rewrite."""
        m = self._read_manifest(table, round_)
        if m and m.get("path"):
            return m["path"]
        return self.data_dir(table, round_)

    # ---------------------------------------------------------- write
    def write(self, df, table: str, round_: int, partition_by: list[str] | None = None) -> None:
        """Write a snapshot and atomically publish its manifest.

        Rewriting an ALREADY-COMMITTED round (maintenance ops:
        ``fold_bloom`` at vacuum cadence, ``_ensure_bloom``'s
        param-drift rebuild) never touches the committed bytes: the
        data lands in a fresh uuid-suffixed directory and the manifest
        ``os.replace`` is the commit point.  A crash anywhere before
        the replace leaves the old snapshot fully readable; a reader
        mid-scan of the old dir never has files deleted under it — the
        superseded dir is TOMBSTONED and reclaimed only once older
        than :data:`SUPERSEDED_GRACE_S` (see
        :meth:`vacuum_superseded`), so even a reader that resolved the
        old path moments before the swap finishes its scan."""
        prev = self._read_manifest(table, round_)
        if prev is None:
            path = self.data_dir(table, round_)
        else:
            path = self.data_dir(table, round_) + "." + uuid.uuid4().hex[:8]
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        self._publish(table, round_, {"path": path, "partition_by": partition_by or []})
        if prev is not None:
            old = prev.get("path") or self.data_dir(table, round_)
            if os.path.realpath(old) != os.path.realpath(path):
                # deferred deletion (the Iceberg expire-snapshots
                # pattern): a reader that resolved data_path() just
                # before the manifest swap may still be scanning the
                # old dir — deleting it NOW fails that scan.  Record a
                # tombstone instead; dirs are reclaimed once older than
                # the grace window (swept opportunistically here and by
                # vacuum_superseded()).
                self._tombstone(old)
        self.vacuum_superseded()

    # superseded-snapshot grace window: longer than any reasonable
    # single-snapshot scan, short enough that a long crawl's rewrite
    # garbage stays bounded to the last few minutes' worth
    SUPERSEDED_GRACE_S = 600.0

    def _tombstone(self, path: str) -> None:
        d = os.path.join(self.root, "_trash")
        os.makedirs(d, exist_ok=True)
        final = os.path.join(d, uuid.uuid4().hex + ".json")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"path": path, "ts": time.time()}, f)
        os.replace(tmp, final)

    def vacuum_superseded(self, grace_s: float | None = None) -> int:
        """Delete superseded snapshot dirs whose tombstones are older
        than ``grace_s`` (default :data:`SUPERSEDED_GRACE_S`); returns
        the number reclaimed.  Pass 0 to force (tests, final cleanup —
        only safe when no concurrent reader can hold a pre-rewrite
        path)."""
        import shutil

        if grace_s is None:
            grace_s = self.SUPERSEDED_GRACE_S
        d = os.path.join(self.root, "_trash")
        if not os.path.isdir(d):
            return 0
        now, n = time.time(), 0
        root_real = os.path.realpath(self.root)
        for name in os.listdir(d):
            if not name.endswith(".json") or name.endswith(".tmp"):
                continue
            p = os.path.join(d, name)
            try:
                with open(p) as f:
                    t = json.load(f)
                if now - float(t["ts"]) < grace_s:
                    continue
                victim = os.path.realpath(t["path"])
                # never follow a tombstone outside this catalog
                if victim.startswith(root_real + os.sep):
                    shutil.rmtree(victim, ignore_errors=True)
                os.unlink(p)
                n += 1
            except (OSError, ValueError, KeyError):
                continue
        return n

    def _publish(self, table: str, round_: int, payload: dict) -> None:
        payload = dict(payload, table=table, round=round_,
                       committed_at=time.time(), snapshot_id=str(uuid.uuid4()))
        final = self._manifest_path(table, round_)
        tmp = final + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)  # atomic on POSIX
        self._publish_stream_entry(table, round_)

    # streaming-safe view: <root>/stream/<table>/rNNNNN/ holds a copy
    # of each COMMITTED round's data files, published ONLY AFTER the
    # manifest commit, so a file stream tailing the stream dir can
    # never observe a torn/uncommitted round (the raw <table>/r* dirs
    # may briefly hold junk a crash left behind).  Object-store-safe
    # by construction (r4, replacing a symlink mechanism that cannot
    # exist on S3/GCS): the publish primitive is "make the committed,
    # immutable bytes visible under the stream prefix" — a server-side
    # CopyObject on an object store, optimized to a zero-byte hard
    # link on POSIX.  Every published file is final and immutable, so
    # a crash mid-publish at worst leaves a round partially listed;
    # the next publish/stream_dir call completes it idempotently
    # (per-file existence check), and a file stream just picks the
    # stragglers up in a later micro-batch — append-exactly-once
    # either way, unlike the overwrite-retried raw round dirs.
    def _stream_table_dir(self, table: str) -> str:
        return os.path.join(self.root, "stream", table)

    def _publish_stream_entry(self, table: str, round_: int) -> None:
        """Make round ``round_`` visible under the stream prefix,
        append-EXACTLY-ONCE for file streams.

        A round's first complete publication is sealed with a
        ``_published.json`` marker (its file list) and is IMMUTABLE
        from then on: a later rewrite of the committed round (compact,
        fold_bloom) must NOT re-publish, because Spark's
        FileStreamSource tracks files by path — renamed content-equal
        files would be delivered as new rows (duplicates) and unlinking
        listed-but-unread old files fails the micro-batch.  The sealed
        entry's hard links/copies keep the ORIGINAL committed bytes
        alive after the raw dir is rewritten; same rows either way.

        Healing stays: a publish that crashed mid-copy left no marker —
        it is completed per-file and then sealed.  A sealed entry that
        LOST files (external damage) is restored from the marker list
        when the source still has those names, else rebuilt from the
        current snapshot (re-delivery possible only in that
        damaged-entry corner, where re-delivery beats data loss)."""
        import shutil
        import uuid as _uuid

        src = self.data_path(table, round_)
        dst = os.path.join(self._stream_table_dir(table), f"r{round_:05d}")
        # heal a pre-r4 symlink publication in place (the data files it
        # pointed at are the same committed bytes)
        if os.path.islink(dst):
            os.unlink(dst)
        os.makedirs(dst, exist_ok=True)
        marker = os.path.join(dst, "_published.json")
        src_names = {n for n in os.listdir(src) if n.endswith(".parquet")}

        published: set[str] | None = None
        if os.path.exists(marker):
            try:
                with open(marker) as f:
                    published = set(json.load(f)["files"])
            except (OSError, ValueError, KeyError):
                published = None  # torn marker: treat as unsealed
        if published is not None:
            have = {n for n in os.listdir(dst) if n.endswith(".parquet")}
            if published <= have:
                return  # sealed + intact: the normal rewrite no-op
            if not (published <= src_names):
                # damaged AND the original names are gone (snapshot was
                # rewritten since): rebuild from the current snapshot
                for name in have - src_names:
                    try:
                        os.unlink(os.path.join(dst, name))
                    except OSError:
                        pass
                published = None
        names = published if published is not None else src_names
        if published is None:
            # never sealed: a partial publication superseded by a
            # rewrite may have left old-generation names — drop them so
            # the sealed entry is one coherent file set
            for name in os.listdir(dst):
                if name.endswith(".parquet") and name not in names:
                    try:
                        os.unlink(os.path.join(dst, name))
                    except OSError:
                        pass

        for name in sorted(names):
            t = os.path.join(dst, name)
            if os.path.exists(t):
                continue
            try:
                os.link(os.path.join(src, name), t)  # POSIX: zero-copy
            except OSError:
                # cross-device / FS without hard links: real copy, made
                # visible atomically under its final name (the PUT-like
                # path an object store takes natively)
                tmp = t + f".tmp.{os.getpid()}"
                shutil.copyfile(os.path.join(src, name), tmp)
                os.replace(tmp, t)
        # seal AFTER every file is in place (crash before this line =
        # unsealed entry, healed idempotently on the next publish)
        tmp = marker + f".tmp.{_uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"files": sorted(names)}, f)
        os.replace(tmp, marker)

    def stream_dir(self, table: str) -> str:
        """Directory whose ``r*`` children are EXACTLY the committed
        rounds of ``table`` (heals rounds committed by an older engine
        version or a publish interrupted mid-copy) — the safe source
        for readStream."""
        for r in self.committed_rounds(table):
            self._publish_stream_entry(table, r)
        return self._stream_table_dir(table)

    # ----------------------------------------------------------- read
    def committed_rounds(self, table: str) -> list[int]:
        d = os.path.join(self.root, table)
        if not os.path.isdir(d):
            return []
        out = []
        for name in os.listdir(d):
            if name.startswith("_r") and name.endswith(".manifest.json"):
                out.append(int(name[2:7]))
        return sorted(out)

    def latest_round(self, table: str) -> int | None:
        rounds = self.committed_rounds(table)
        return rounds[-1] if rounds else None

    def read(self, spark, table: str, round_: int | None = None):
        """Read a table snapshot (latest when ``round_`` is None)."""
        if round_ is None:
            round_ = self.latest_round(table)
        if round_ is None:
            raise FileNotFoundError(f"no committed snapshot for table {table!r}")
        return spark.read.parquet(self.data_path(table, round_))

    def exists(self, table: str, round_: int) -> bool:
        return os.path.exists(self._manifest_path(table, round_))

    def read_upto(self, spark, table: str, max_round: int):
        """Read the latest snapshot committed at or before ``max_round``
        (resume safety: a partially-committed later round stays
        invisible)."""
        rounds = [r for r in self.committed_rounds(table) if r <= max_round]
        if not rounds:
            raise FileNotFoundError(
                f"no snapshot for table {table!r} at or before round {max_round}"
            )
        return self.read(spark, table, rounds[-1])

    def count(self, table: str, round_: int) -> int:
        """Exact row count from the snapshot's parquet footers — no
        Spark job, no data scan (Iceberg equivalent: snapshot summary
        record counts)."""
        import pyarrow.parquet as pq

        d = self.data_path(table, round_)
        total = 0
        for name in os.listdir(d):
            if name.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(d, name)).metadata.num_rows
        return total

    # mixed row groups above this many total rows switch count_true to
    # a distributed Spark count instead of a driver-side column read
    COUNT_TRUE_DRIVER_MAX_ROWS = 50_000_000

    def count_true(
        self, table: str, round_: int, column: str, spark=None
    ) -> int:
        """Rows where a boolean ``column`` is true — from parquet
        ROW-GROUP STATISTICS wherever possible (a row group whose
        min == max is homogeneous: contributes num_rows or 0 with zero
        data read — frontier deltas are written new-rows-then-deferred,
        so most groups are homogeneous).  Only MIXED row groups read
        the column, and only driver-side below a row cap; above it (a
        10^10-row frontier delta must never stream through the driver)
        the residual count runs as a distributed Spark job over the
        same files (Iceberg equivalent: snapshot summary counts)."""
        import pyarrow.parquet as pq
        import pyarrow.compute as pc

        d = self.data_path(table, round_)
        total = 0
        # files with >=1 non-homogeneous group: (path, stats_part, groups)
        mixed_files: list[tuple[str, int, list[int]]] = []
        n_mixed_rows = 0
        for name in sorted(os.listdir(d)):
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(d, name)
            f = pq.ParquetFile(path)
            try:
                ci = f.schema_arrow.get_field_index(column)
            except KeyError:
                ci = -1
            file_stats = 0
            file_mixed: list[int] = []
            for g in range(f.metadata.num_row_groups):
                rg = f.metadata.row_group(g)
                stats = rg.column(ci).statistics if ci >= 0 else None
                if stats is not None and stats.has_min_max and (
                    stats.min == stats.max
                ) and not (stats.null_count or 0):
                    file_stats += rg.num_rows if stats.min else 0
                else:
                    file_mixed.append(g)
                    n_mixed_rows += rg.num_rows
            if file_mixed:
                mixed_files.append((path, file_stats, file_mixed))
            else:
                total += file_stats
        if not mixed_files:
            return total
        if spark is not None and n_mixed_rows > self.COUNT_TRUE_DRIVER_MAX_ROWS:
            # whole-file distributed recount of only the mixed files
            # (their stats_part is NOT pre-added, so no double count)
            from pyspark.sql import functions as F

            paths = sorted(p for p, _, _ in mixed_files)
            return total + (
                spark.read.parquet(*paths).filter(F.col(column)).count()
            )
        for path, file_stats, groups in mixed_files:
            total += file_stats
            f = pq.ParquetFile(path)
            for g in groups:
                t = f.read_row_group(g, columns=[column])
                total += pc.sum(pc.cast(t[column], "int64")).as_py() or 0
        return total

    # ---------------------------------------------------- maintenance
    def compact(self, spark, table: str, rounds: list[int] | None = None,
                target_bytes_per_file: int = 256 << 20,
                min_files: int = 2,
                max_concurrent: int = 8) -> dict[int, tuple[int, int]]:
        """Rewrite committed snapshots of ``table`` into few right-sized
        files — the small-file maintenance op for crawl outputs (the
        Iceberg ``rewrite_data_files`` analogue, like ``compact_index``
        for the ANN layouts).  A crawl writes shuffle-partition-many
        files per round; over hundreds of rounds ``crawled_all`` reads
        thousands of tiny files whose open/footer cost dominates the
        scan.  Each round is rewritten through :meth:`write`'s
        committed-round path, so the swap is ATOMIC (fresh uuid dir +
        manifest replace; a crash leaves the old snapshot readable) and
        the stream view re-publishes to exactly the new bytes.

        Per-round file targets come from on-disk BYTE size (stat, no
        Spark job for the planning pass) — bytes, not rows, because a
        row's width varies 1000× between a URL-frontier row and a
        full-text document row: a row-count target would coalesce a
        fat round into one multi-GB file, a single-task write
        straggler (reads would survive — parquet splits by row group —
        but the rewrite wouldn't).  Rounds already at or below the
        target, below ``min_files``, or written with a
        ``partition_by`` layout (none of the crawl tables today) are
        left untouched.  Returns {round: (files_before, files_after)}
        for the rounds rewritten.

        Rounds are rewritten CONCURRENTLY (``max_concurrent`` driver
        threads — rounds are disjoint dirs + disjoint manifests, and
        Spark job submission is thread-safe): each rewrite is a tiny
        job whose fixed scheduling latency would otherwise be paid
        rounds-many times in sequence, which measured 30–42 s for a
        ~10-round 240k-page crawl at local[32]."""
        plan: list[tuple[int, str, int, int]] = []  # (round, dir, before, n_files)
        for r in (rounds if rounds is not None
                  else self.committed_rounds(table)):
            m = self._read_manifest(table, r)
            if m is None or m.get("partition_by"):
                continue
            d = self.data_path(table, r)
            before = [n for n in os.listdir(d) if n.endswith(".parquet")]
            if len(before) < max(2, min_files):
                continue
            n_bytes = sum(os.path.getsize(os.path.join(d, n))
                          for n in before)
            n_files = max(1, -(-n_bytes // max(1, target_bytes_per_file)))
            if n_files >= len(before):
                continue
            plan.append((r, d, len(before), n_files))
        if not plan:
            return {}

        def _one(item):
            r, d, n_before, n_files = item
            self.write(spark.read.parquet(d).coalesce(n_files), table, r)
            after = [n for n in os.listdir(self.data_path(table, r))
                     if n.endswith(".parquet")]
            return r, (n_before, len(after))

        if len(plan) == 1 or max_concurrent <= 1:
            return dict(_one(item) for item in plan)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(max_concurrent, len(plan))) as ex:
            return dict(ex.map(_one, plan))

    # ------------------------------------- bucketed seen-set table
    #
    # Cluster-scale F8 backend: ONE hash-bucketed parquet table of seen
    # urls, appended per round, so the seen-set side of the dedup
    # anti-join NEVER shuffles (SortMergeJoin reads the buckets in
    # place; only the small per-round candidate side exchanges).  This
    # is the vanilla-Spark emulation of an Iceberg bucket-transform
    # table; atomicity comes from the same manifest protocol as
    # snapshots: each append records the exact files it added, and
    # files not named by any committed manifest are vacuumed on open
    # (exactly what Iceberg manifests do for torn commits).

    def _seen_dir(self) -> str:
        return os.path.join(self.root, "_seen_bucketed")

    def seen_table_name(self) -> str:
        import hashlib

        h = hashlib.md5(os.path.abspath(self.root).encode()).hexdigest()[:12]
        return f"doccrawler_seen_{h}"

    def _seen_append_manifest(self, round_: int) -> str:
        return os.path.join(
            self.root, "_seen_manifests", f"r{round_:05d}.json"
        )

    def seen_appended_rounds(self) -> list[int]:
        d = os.path.join(self.root, "_seen_manifests")
        if not os.path.isdir(d):
            return []
        return sorted(
            int(n[1:6]) for n in os.listdir(d)
            if n.startswith("r") and n.endswith(".json")
        )

    def _seen_ensure_registered(self, spark, n_buckets: int) -> str:
        d = self._seen_dir()
        os.makedirs(d, exist_ok=True)
        name = self.seen_table_name()
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {name} (url STRING) USING PARQUET "
            f"CLUSTERED BY (url) INTO {n_buckets} BUCKETS LOCATION '{d}'"
        )
        return name

    def seen_vacuum(self, spark, n_buckets: int) -> list[str]:
        """Remove data files not named by any committed append manifest
        (orphans of a crashed mid-append round); returns removed names."""
        import json as _json

        name = self._seen_ensure_registered(spark, n_buckets)
        committed: set[str] = set()
        for r in self.seen_appended_rounds():
            with open(self._seen_append_manifest(r)) as f:
                committed.update(_json.load(f)["files"])
        removed = []
        for fn in os.listdir(self._seen_dir()):
            if fn.startswith("part-") and fn not in committed:
                os.remove(os.path.join(self._seen_dir(), fn))
                removed.append(fn)
        if removed:
            spark.sql(f"REFRESH TABLE {name}")
        return removed

    def seen_append(self, spark, urls_df, round_: int, n_buckets: int) -> None:
        """Append one round's url delta to the bucketed seen table;
        idempotent per round (a committed manifest short-circuits)."""
        if os.path.exists(self._seen_append_manifest(round_)):
            return
        name = self._seen_ensure_registered(spark, n_buckets)
        before = {
            fn for fn in os.listdir(self._seen_dir()) if fn.startswith("part-")
        }
        (
            urls_df.select("url").write.mode("append").format("parquet")
            .bucketBy(n_buckets, "url").option("path", self._seen_dir())
            .saveAsTable(name)
        )
        added = sorted(
            fn for fn in os.listdir(self._seen_dir())
            if fn.startswith("part-") and fn not in before
        )
        os.makedirs(os.path.dirname(self._seen_append_manifest(round_)),
                    exist_ok=True)
        final = self._seen_append_manifest(round_)
        tmp = final + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"round": round_, "files": added}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)

    def seen_table(self, spark, n_buckets: int):
        """The bucketed seen table as a DataFrame (vacuumed: only
        committed appends are visible)."""
        name = self._seen_ensure_registered(spark, n_buckets)
        self.seen_vacuum(spark, n_buckets)
        return spark.table(name)

    # ------------------------------------------------- driver state
    def write_state(self, round_: int, state: dict) -> None:
        d = os.path.join(self.root, "_crawl_state")
        os.makedirs(d, exist_ok=True)
        final = os.path.join(d, f"r{round_:05d}.json")
        tmp = final + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(state, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)

    def latest_state(self) -> tuple[int, dict] | None:
        d = os.path.join(self.root, "_crawl_state")
        if not os.path.isdir(d):
            return None
        rounds = sorted(
            int(n[1:6]) for n in os.listdir(d)
            if n.startswith("r") and n.endswith(".json")
        )
        if not rounds:
            return None
        r = rounds[-1]
        with open(os.path.join(d, f"r{r:05d}.json")) as f:
            return r, json.load(f)
