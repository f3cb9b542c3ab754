"""Embeddable document-store stub for the K1/K2 Mongo sink path.

No MongoDB server or connector jar exists in this sandbox, so the routed
bulk-write path (``write_resources_mongo``, bundle.go:111-120 parity)
could never execute end-to-end — its option surface was pinned by unit
tests but nothing ever consumed the options.  This module closes that
gap with a PUBLIC-API stand-in: a Spark *Python Data Source*
(``pyspark.sql.datasource``, Spark 4+) registered as ``filedocstore``
that accepts the EXACT option names of the MongoDB Spark Connector's
write configuration (``connection.uri``, ``database``, ``collection``,
``ordered``, ``maxBatchSize``) and persists documents as JSONL — one
directory per (database, collection), one file per flushed batch, plus a
``_manifest.json`` recording the options each executor actually
received.

What this proves that the option-dict unit test cannot: the options
survive Spark's writer plumbing (misspelled keys would vanish silently),
``maxBatchSize`` really bounds flush sizes, the per-collection driver
routing loop produces one isolated store per resource type, and the
whole path runs distributed (executor-side ``write``, driver-side
``commit`` — same lifecycle as the real connector).  Swapping
``format("filedocstore")`` for ``format("mongodb")`` is the ONLY
difference from production; see SCALE.md §Mongo.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage
from pyspark.sql.types import StructType


@dataclass
class _BatchCommit(WriterCommitMessage):
    files: list
    batch_sizes: list


class FileDocStoreDataSource(DataSource):
    """``format("filedocstore")`` — Mongo-connector-shaped JSONL sink."""

    @classmethod
    def name(cls) -> str:
        return "filedocstore"

    def writer(self, schema: StructType, overwrite: bool) -> "DataSourceWriter":
        return FileDocStoreWriter(dict(self.options), schema, overwrite)


class FileDocStoreWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool = False) -> None:
        # Validate the connector option surface EAGERLY on the driver —
        # a missing/renamed option should fail the save, not no-op (the
        # silent-no-op failure mode is why jdbc_write_options exists).
        options = {k.lower(): v for k, v in options.items()}  # Spark may
        # normalize option-key case differently across write paths
        try:
            self.uri = options["connection.uri"]
            self.database = options["database"]
            self.collection = options["collection"]
            self.ordered = options["ordered"].lower() == "true"
            self.max_batch_size = int(options["maxbatchsize"])
        except KeyError as missing:  # connector-style hard failure
            raise ValueError(
                f"filedocstore: required write option {missing} not supplied "
                f"(got {sorted(options)})"
            ) from None
        if self.max_batch_size <= 0:
            raise ValueError("filedocstore: maxBatchSize must be positive")
        # uri scheme mirrors mongodb://host/; the stub maps the authority
        # part to a local root directory
        self.root = self.uri.removeprefix("docstore://")
        self.columns = list(schema.fieldNames())
        self.overwrite = overwrite
        # Per-SAVE staging id, minted once on the driver and shipped to
        # every task via the pickled writer: concurrent saves to the same
        # collection each stage under their own directory, so one save's
        # commit/abort cleanup can never delete another save's staged
        # files (the r8 review's concurrent-append clobber).
        self.save_id = uuid.uuid4().hex

    def _dir(self) -> str:
        return os.path.join(self.root, self.database, self.collection)

    def _staging(self) -> str:
        # Task attempts write here; only commit() publishes into the
        # collection directory.  This is the same visibility rule as the
        # real sink's task-retry story: a retried or speculative attempt's
        # files must never be observable — commit() moves exactly the
        # files named by the SUCCESSFUL attempts' messages and discards
        # the rest of this save's staging wholesale.
        return os.path.join(self._dir(), f"_staging-{self.save_id}")

    def write(self, iterator) -> _BatchCommit:
        """Executor-side: buffer rows, flush every maxBatchSize documents
        to a new staged JSONL file — the connector's unordered bulk-insert
        batch analog (one InsertMany per flush)."""
        os.makedirs(self._staging(), exist_ok=True)
        files: list = []
        sizes: list = []
        buf: list = []

        def flush() -> None:
            if not buf:
                return
            path = os.path.join(self._staging(), f"batch-{uuid.uuid4().hex}.jsonl")
            with open(path, "w") as fh:
                for doc in buf:
                    fh.write(json.dumps(doc, default=str) + "\n")
            files.append(path)
            sizes.append(len(buf))
            buf.clear()

        for row in iterator:
            buf.append({c: row[i] for i, c in enumerate(self.columns)})
            if len(buf) >= self.max_batch_size:
                flush()
        flush()
        return _BatchCommit(files=files, batch_sizes=sizes)

    def commit(self, messages) -> None:
        """Driver-side: publish the successful attempts' staged files into
        the collection directory (failed/speculative attempts' orphans die
        with this save's staging dir), then merge this save into the
        cumulative manifest — an append save must extend the history, not
        erase it, while an OVERWRITE save replaces both documents and
        history (the connector's collection-replace analog)."""
        import shutil

        os.makedirs(self._dir(), exist_ok=True)
        all_sizes = [s for m in messages if m for s in m.batch_sizes]
        manifest_path = os.path.join(self._dir(), "_manifest.json")
        # The WHOLE publish runs under the per-collection lock — including
        # the overwrite's removal loop and the data-file os.replace's, not
        # just the manifest merge: an overwrite's deletions interleaving
        # with a concurrent append's merge would otherwise publish a
        # manifest describing files the overwrite just deleted (r9 review
        # finding; the r8 fix locked only the merge).  The lock file itself
        # survives overwrite (only .jsonl and _manifest.json are removed).
        # flock is advisory and single-host, which matches the stub's
        # sandbox contract; the real connector's server owns this
        # transactionally.  Manifest publish stays atomic (tmp +
        # os.replace) so even lock-less non-POSIX readers never see a torn
        # file.
        lock_path = os.path.join(self._dir(), "_manifest.lock")
        with open(lock_path, "a") as lock_fh:
            locked = False
            try:
                import fcntl

                fcntl.flock(lock_fh, fcntl.LOCK_EX)
                locked = True
            except (ImportError, OSError):  # pragma: no cover - non-POSIX
                pass
            # Reap orphan manifest temp files in BOTH modes (r10 review:
            # append is the common mode, and a crash between writing
            # `_manifest.json.tmp-<hex>` and os.replace leaves the tmp
            # behind forever otherwise).  The reap is ONLY safe while we
            # hold the exclusive flock — then any tmp-* visible now belongs
            # to a dead writer, never a concurrent live one.  When flock
            # itself failed (non-POSIX / network FS) a live committer's
            # in-flight tmp could be visible, so we skip the reap entirely
            # rather than break its os.replace (r10 advisor finding).
            if locked:
                for name in os.listdir(self._dir()):
                    if name.startswith("_manifest.json.tmp-"):
                        try:
                            os.remove(os.path.join(self._dir(), name))
                        except OSError:  # pragma: no cover - concurrent cleanup
                            pass
            if self.overwrite:
                for name in os.listdir(self._dir()):
                    if name.endswith(".jsonl") or name == "_manifest.json":
                        try:
                            os.remove(os.path.join(self._dir(), name))
                        except OSError:  # pragma: no cover - concurrent cleanup
                            pass
            n_files = 0
            for m in messages:
                if m:
                    for path in m.files:
                        os.replace(
                            path, os.path.join(self._dir(), os.path.basename(path))
                        )
                        n_files += 1
            shutil.rmtree(self._staging(), ignore_errors=True)
            manifest = {
                "database": self.database,
                "collection": self.collection,
                "ordered": self.ordered,
                "maxBatchSize": self.max_batch_size,
                "n_files": n_files,
                "batch_sizes": all_sizes,
                "n_docs": sum(all_sizes),
                "n_saves": 1,
            }
            if os.path.exists(manifest_path):
                with open(manifest_path) as fh:
                    prior = json.load(fh)
                manifest["n_files"] += prior.get("n_files", 0)
                manifest["batch_sizes"] = prior.get("batch_sizes", []) + all_sizes
                manifest["n_docs"] += prior.get("n_docs", 0)
                manifest["n_saves"] += prior.get("n_saves", 1)
            tmp_path = manifest_path + f".tmp-{uuid.uuid4().hex}"
            with open(tmp_path, "w") as fh:
                json.dump(manifest, fh, indent=1)
            os.replace(tmp_path, manifest_path)

    def abort(self, messages) -> None:  # pragma: no cover - best-effort
        import shutil

        shutil.rmtree(self._staging(), ignore_errors=True)
