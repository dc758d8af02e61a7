# -*- coding: utf-8 -*-
"""Checkpoint manifest: per-stage commit records with lineage +
counters, enabling resume at the last committed stage.

Analog of the reference's model/file persistence
(/root/reference/webstruct/_fileresource.py) re-thought for a staged
distributed job: every stage writes its output table, then appends one
JSON line {stage, rows_out, n_files, bytes, files:[{name, rows,
bytes}], wall_sec, committed_utc_ns} to ``manifest.jsonl``.  A killed
run restarts, finds the committed entries, and skips straight to the
first uncommitted stage (kill-and-resume equivalence is pytest-gated).

On a real deployment each stage commit would be an Iceberg snapshot;
in the sandbox the parquet dir + _SUCCESS marker plays that role and
per-file row counts come from the parquet footers (no data scan).
"""
from __future__ import annotations

import json
import os
import threading
import time
from typing import Dict, List, Optional

import pyarrow.parquet as pq


def table_fingerprint(path: str) -> dict:
    """(row count, total bytes, file count) of a parquet table (single
    file or flat Spark-written part-file dir) from the footers — no
    data scan.  This is the resume-identity check for
    `Manifest.is_committed`: a swapped or regenerated table virtually
    never keeps all three identical.  NOT a content hash — a
    same-size, same-row-count in-place edit passes; the guard's job is
    catching pointed-at-the-wrong-corpus and regenerated-corpus
    mistakes, not adversarial substitution.  Raises on a dir with no
    top-level .parquet files (nested/Hive-partitioned layouts are
    unsupported) rather than returning an all-zero fingerprint every
    such dir would share."""
    if os.path.isfile(path):
        files = [path]
    else:
        files = [
            os.path.join(path, n)
            for n in sorted(os.listdir(path))
            if n.endswith(".parquet")
        ]
    if not files:
        raise ValueError(
            "table_fingerprint: no .parquet files at %r (nested/"
            "partitioned layouts are not supported)" % path
        )
    rows = 0
    nbytes = 0
    for fp in files:
        rows += pq.read_metadata(fp).num_rows
        nbytes += os.path.getsize(fp)
    return {"rows": rows, "bytes": nbytes, "n_files": len(files)}


class Manifest:
    """Commit records are append-only JSON lines; :meth:`commit` holds a
    per-instance lock so stages finishing on concurrent driver threads
    (pipeline.build_kg ``stage_concurrency`` > 1) never interleave
    partial lines.  Record ORDER in the file is completion order and
    carries no meaning — resume reads the whole file into a per-stage
    dict."""

    def __init__(self, out_dir: str, layout_version: str = "1"):
        self.out_dir = out_dir
        self.layout_version = layout_version
        self.path = os.path.join(out_dir, "manifest.jsonl")
        self._append_lock = threading.Lock()
        os.makedirs(out_dir, exist_ok=True)

    def committed(self) -> Dict[str, dict]:
        # the lock also serializes reads against same-process appends
        # (a commit record can exceed one write() syscall once `files`
        # lists hundreds of part files); a torn TRAILING line — a
        # different-process writer killed mid-append — is treated as
        # uncommitted, but a corrupt interior line still raises
        with self._append_lock:
            if not os.path.exists(self.path):
                return {}
            with open(self.path) as f:
                lines = f.read().splitlines()
        out: Dict[str, dict] = {}
        for i, line in enumerate(lines):
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                if i == len(lines) - 1:
                    break
                raise
            out[rec["stage"]] = rec
        return out

    def is_committed(self, stage: str,
                     source_fp: Optional[dict] = None,
                     rec: Optional[dict] = None) -> bool:
        """``rec``: pass the stage's record from an already-loaded
        :meth:`committed` snapshot to skip re-reading the manifest —
        callers that check many stages (build resume, append
        preamble) parse the file once instead of once per stage."""
        if rec is None:
            rec = self.committed().get(stage)
        if not rec:
            return False
        # a commit from an older table layout must not be resumed into
        # — rebuild instead of silently serving stale-schema outputs
        if rec.get("layout", "1") != self.layout_version:
            return False
        # a commit built from DIFFERENT source tables must not be
        # resumed into either: every stage records the run's source
        # fingerprint (rows+bytes per input table, from the parquet
        # footers), so pointing the same out_dir at a changed corpus
        # rebuilds instead of serving stale outputs.  A record without
        # one (pre-fingerprint manifest) is unverifiable → rebuild.
        if source_fp is not None and rec.get("source_fp") != source_fp:
            return False
        # the stage dir must still look committed on disk
        return os.path.exists(
            os.path.join(self.out_dir, stage, "_SUCCESS")
        )

    def stage_path(self, stage: str) -> str:
        return os.path.join(self.out_dir, stage)

    def commit(self, stage: str, wall_sec: float,
               inputs: Optional[List[str]] = None,
               source_fp: Optional[dict] = None,
               only_files: Optional[List[str]] = None,
               prior_rec: Optional[dict] = None) -> dict:
        """Collect lineage from the written parquet dir and append the
        commit record.

        Full-build commits enumerate every part file's footer.  For
        APPEND commits pass ``only_files`` (the part files this write
        added — snapshot the dir listing before and after the write)
        plus ``prior_rec`` (the stage's previous record): footers are
        read for the delta only and the record's ``rows_out``/
        ``bytes``/``n_files`` totals are the prior totals plus the
        delta — O(delta) per commit instead of O(total files ever
        written), and each record's ``files`` lineage lists only what
        that commit added (``files_delta: true``)."""
        path = self.stage_path(stage)
        if only_files is not None:
            if prior_rec is None:
                raise ValueError(
                    "commit(only_files=...) needs prior_rec for the "
                    "running totals"
                )
            names = sorted(only_files)
        else:
            names = sorted(os.listdir(path))
        files: List[dict] = []
        rows = 0
        total_bytes = 0
        for name in names:
            if not name.endswith(".parquet"):
                continue
            fp = os.path.join(path, name)
            meta = pq.ParquetFile(fp).metadata
            nbytes = os.path.getsize(fp)
            files.append(dict(name=name, rows=meta.num_rows, bytes=nbytes))
            rows += meta.num_rows
            total_bytes += nbytes
        n_files = len(files)
        if only_files is not None:
            rows += prior_rec["rows_out"]
            total_bytes += prior_rec["bytes"]
            n_files += prior_rec["n_files"]
        rec = dict(
            stage=stage,
            layout=self.layout_version,
            inputs=list(inputs or []),
            **({"source_fp": source_fp} if source_fp is not None else {}),
            rows_out=rows,
            n_files=n_files,
            bytes=total_bytes,
            files=files,
            **({"files_delta": True} if only_files is not None else {}),
            wall_sec=round(wall_sec, 3),
            committed_utc_ns=time.time_ns(),
        )
        with self._append_lock:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec
