"""Snapshot/commit/resume primitives — Iceberg-style semantics over parquet.

Mirrors the reference's job-queue status machine and idempotency guards:

  reference (emop-controller [U])                 here
  ---------------------------------------------  ------------------------------
  dashboard job_queues row per (batch, page)      manifest row per partition
  reserve N pages → proc_id                       stamp run_id, status=pending
  EmopRun refuses to rerun if output payload      run skips partitions already
    exists (emop/lib/emop_run.py :: run)            present in committed lineage
  payload output JSON single-file write           per-wave parquet write +
    = the commit                                    atomic manifest rename
  completed/ → uploaded/ rename                   status pending→committed flip

Why not real Iceberg: no Iceberg runtime jar ships in this sandbox
(SURVEY.md §8 hard parts), so the snapshot commit is a write-temp +
os.replace() of `manifest.json` — the same atomic-visibility contract an
Iceberg snapshot commit provides. The layout keeps table paths and a
`writeTo`-shaped API so a real catalog can be dropped in.

Run directory layout:

  {root}/{run_id}/
    manifest.json                 # atomic snapshot: per-partition status
    staged/                       # keyed input, partitioned by partition_id
      partition_id=K/*.parquet    #   (written once; waves prune to their dirs)
    extracted/                    # output parquet, partitioned by partition_id
      partition_id=K/*.parquet
    extracted_retry/              # retry attempts (attempt column in data)
    lineage/wave-*.parquet        # committed per-partition lineage rows
    lineage/retry-NNN.parquet     # one audit file per retry attempt
"""

from __future__ import annotations

import datetime as dt
import json
import os
import pathlib
import uuid


class RunManifest:
    """Driver-side manifest table for one run (the scheduler-daemon analog)."""

    def __init__(self, root: str, run_id: str):
        self.root = pathlib.Path(root)
        self.run_id = run_id
        self.dir = self.root / run_id
        self.path = self.dir / "manifest.json"

    # ---------------------------------------------------------------- create
    @classmethod
    def create(
        cls,
        root: str,
        n_partitions: int,
        total_bytes: int,
        run_id: str | None = None,
        force: bool = False,
        sink_table: str | None = None,
    ) -> "RunManifest":
        """Reserve step (Q2): one pending row per partition, one commit.

        Refuses to re-create an existing run: silently resetting every
        partition to pending while extracted/ and lineage/ persist would
        make a re-run append duplicates of all committed rows. `force=True`
        is the explicit override — it also clears the run's data dirs so
        the reset is consistent."""
        import shutil

        run_id = run_id or uuid.uuid4().hex[:12]
        m = cls(root, run_id)
        if m.path.exists():
            if not force:
                raise FileExistsError(
                    f"run {run_id} already has a manifest under {root}; "
                    "load it to resume, or pass force=True to reset "
                    "(clears extracted/, staged/ and lineage/)"
                )
            for sub in ("extracted", "extracted_retry", "staged", "staged.tmp", "lineage"):
                shutil.rmtree(m.dir / sub, ignore_errors=True)
            for gen in m.dir.glob("extracted.gen-*"):
                shutil.rmtree(gen, ignore_errors=True)
        m.dir.mkdir(parents=True, exist_ok=True)
        (m.dir / "lineage").mkdir(exist_ok=True)
        state = {
            "run_id": run_id,
            "n_partitions": n_partitions,
            "total_bytes": total_bytes,
            "created_at": _now(),
            "partitions": {
                str(p): {"status": "pending", "attempt": 0, "committed_at": None}
                for p in range(n_partitions)
            },
        }
        if sink_table:
            # where this run's extracted base LIVES is a property of the
            # RUN, not of whatever session later reads it — recording it
            # here is what lets every verb route without (and validated
            # against) live session conf
            state["sink_table"] = sink_table
        m._commit(state)
        return m

    @classmethod
    def load(cls, root: str, run_id: str) -> "RunManifest":
        m = cls(root, run_id)
        if not m.path.exists():
            raise FileNotFoundError(f"no manifest for run {run_id} under {root}")
        return m

    # ---------------------------------------------------------------- state
    def state(self) -> dict:
        return json.loads(self.path.read_text())

    def pending_partitions(self) -> list[int]:
        """Q1 query-pending analog (emop/lib/emop_query.py [U])."""
        st = self.state()
        return sorted(
            int(p)
            for p, v in st["partitions"].items()
            if v["status"] != "committed"
        )

    def committed_partitions(self) -> list[int]:
        st = self.state()
        return sorted(
            int(p)
            for p, v in st["partitions"].items()
            if v["status"] == "committed"
        )

    def is_complete(self) -> bool:
        return not self.pending_partitions()

    @property
    def sink_table(self) -> str | None:
        """Catalog table recorded at enqueue time (engine/catalog.py), or
        None for the parquet-path run (incl. every pre-seam manifest)."""
        return self.state().get("sink_table")

    # ---------------------------------------------------------------- commit
    def commit_partitions(self, partition_ids: list[int]) -> None:
        """Flip pending→committed for a wave, in ONE atomic snapshot swap."""
        st = self.state()
        now = _now()
        for p in partition_ids:
            row = st["partitions"][str(p)]
            row["status"] = "committed"
            row["attempt"] += 1
            row["committed_at"] = now
        self._commit(st)

    def _commit(self, state: dict) -> None:
        """Atomic snapshot publish: write temp, fsync, rename over."""
        tmp = self.path.with_suffix(".json.tmp")
        data = json.dumps(state, indent=1, sort_keys=True)
        with open(tmp, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)

    # ---------------------------------------------------------------- paths
    @property
    def extracted_path(self) -> str:
        """The ACTIVE extracted table, resolved through the manifest's
        `extracted_dir` pointer (default "extracted"). compact_run
        publishes a rewritten table by flipping this pointer in one
        atomic manifest commit — the Iceberg-snapshot analog — so there
        is no instant at which the run has no readable table (the old
        two-rename swap had one)."""
        name = self.state().get("extracted_dir", "extracted")
        return str(self.dir / name)

    def set_extracted_dir(self, name: str) -> None:
        """Atomically flip the active-table pointer (THE compact commit).

        Only "extracted" or a compaction generation is a legal target:
        pointing at a recovery artifact like extracted.pre_compact would
        make it vacuum_run's active-vs-stale classification problem (and
        a later vacuum could have deleted the only copy). To recover a
        legacy backup, rename it to a FRESH extracted.gen-* name (not the
        plain 'extracted' name: when the active pointer is a generation,
        vacuum classifies a plain 'extracted' dir as the first
        compaction's crash leftover and expires it — restoring under
        that name races any concurrent vacuum)."""
        import re

        if not (name == "extracted" or re.fullmatch(r"extracted\.gen-\d+", name)):
            raise ValueError(
                f"not a legal extracted dir name: {name!r} (use 'extracted' "
                "or 'extracted.gen-NNNN'; restore recovery artifacts under "
                "a fresh extracted.gen-* name first)"
            )
        st = self.state()
        st["extracted_dir"] = name
        self._commit(st)

    @property
    def staged_path(self) -> str:
        """Keyed input staged once, partitionBy(partition_id), so waves
        read only their own partition directories."""
        return str(self.dir / "staged")

    @property
    def lineage_dir(self) -> pathlib.Path:
        return self.dir / "lineage"

    def lineage_wave_path(self, wave: int) -> str:
        return str(self.lineage_dir / f"wave-{wave:05d}.parquet")


def _now() -> str:
    return dt.datetime.now(dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def latest_run_id(root: str) -> str | None:
    """Most recently created run under root (for CLI convenience)."""
    rootp = pathlib.Path(root)
    if not rootp.exists():
        return None
    runs = sorted(
        ((p / "manifest.json").stat().st_mtime, p.name)
        for p in rootp.iterdir()
        if (p / "manifest.json").exists()
    )
    return runs[-1][1] if runs else None
