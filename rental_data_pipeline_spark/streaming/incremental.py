"""Structured Streaming face of the incremental pipeline (SURVEY §2.8).

The reference has no streaming engine — incrementality is cron plus a
full state-file reload/rewrite per run (T1/T3:
``.github/workflows/data-pipeline.yml:4-8``,
``parse_data.py:131-132,217-223``). The Spark-idiomatic restatement:

- **micro-batch source** (T1): each scrape drop is a new file in a
  landing directory; ``readStream`` with ``maxFilesPerTrigger``
  replays them as micro-batches, and ``Trigger.AvailableNow`` gives
  exactly the reference's "process everything pending, then stop"
  cron semantics with checkpointed exactly-once progress.
- **stateful merge** (T3): ``foreachBatch`` folds each micro-batch
  into the persistent state table with the SAME ``merge_listings``
  operator the batch pipeline uses — one code path for both engines.
  The merge continues CDC history already in state (A5), so chunked
  streaming equals a one-shot batch fold (asserted in
  tests/test_streaming.py).
- **event time + late data** (T4/T7): ``updated_date`` is the event
  time; ``windowed_price_stats`` shows the watermarked tumbling-window
  aggregation path for analytics that, unlike the merge, can bound
  state retention. The merge itself retains all keys by design —
  listings never expire (T7, ``merge.py:111``).

Scale: the state table is HASH-BUCKETED by key
(``pmod(xxhash64(key), n_buckets)`` → ``state_bucket=K`` partition
dirs inside each version). A micro-batch fold reads and rewrites ONLY
the buckets its keys hash into (keys in untouched buckets are identity
under the merge, so bucket-local merge ≡ global merge); untouched
buckets stay live in older versions and the composed read picks the
newest committed copy of each bucket (LSM-style deltas). Every
``compact_every`` commits the fold writes a full snapshot (``_FULL``
marker) so shadowed deltas can be pruned — per-batch I/O is
O(|touched buckets|) with an amortized O(|state|/compact_every)
compaction tax, instead of the reference's O(|state|) JSON rewrite per
run (``parse_data.py:131-132,217-223``). On a cluster ``n_buckets``
scales with state size (thousands); the default 16 keeps local-mode
file counts sane.

Measured cost profile (sf0.1, local[32]): streaming machinery is
~100 ms/batch (offset/commit logs); ~1.5 s/batch is the foreachBatch
fold — merge plan construction + a 3-stage tiny-data execution whose
cost is per-JOB overhead (scheduling, AQE replan, codegen), not
per-ROW. It is flat in data size, so at production batch sizes it
amortizes to noise; shrinking it further would mean contorting the
shared batch merge operator for bench cosmetics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rental_data_pipeline_spark.operators.merge import merge_listings

SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("offer_id", T.LongType()),
        T.StructField("updated_date", T.TimestampType()),
        T.StructField("price_value", T.DoubleType()),
        T.StructField("is_unpublished", T.BooleanType()),
        T.StructField("event_id", T.LongType()),
    ]
)


def read_snapshot_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType = SNAPSHOT_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """T1: the landing directory as a micro-batch stream; one scrape
    drop = one file = one micro-batch at the default trigger pacing."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )


import re as _re

_VERSION_NAME_RE = _re.compile(r"v_\d{9}(_b\d{9})?")


def _version_counter(path: str) -> int:
    import os as _os

    return int(_os.path.basename(path).split("v_")[1].split("_")[0])


def _all_version_dirs(state_path: str) -> list[str]:
    """Version directories under ``state_path``, oldest→newest.

    Only names matching the exact ``v_{counter:09d}[_b{batch:09d}]``
    layout this module writes are considered: a stray user entry
    (``v_tmp``, ``v_x``, editor droppings) is ignored rather than
    crashing the sort — state reads must never depend on the directory
    containing nothing but our own entries."""
    import glob as _glob
    import os as _os

    return sorted(
        (
            d
            for d in _glob.glob(f"{state_path}/v_*")
            if _VERSION_NAME_RE.fullmatch(_os.path.basename(d))
        ),
        key=_version_counter,
    )


def _state_versions(state_path: str) -> list[str]:
    """COMMITTED state versions (parquet job wrote its _SUCCESS
    marker), oldest→newest. A crash mid-write leaves a marker-less
    directory that is never read as state."""
    import os as _os

    return [
        d for d in _all_version_dirs(state_path)
        if _os.path.exists(f"{d}/_SUCCESS")
    ]


# ---------------------------------------------------------------------------
# Bucketed state layout
# ---------------------------------------------------------------------------

BUCKET_COL = "state_bucket"  # no leading '_': Spark's FileIndex hides _-paths
N_STATE_BUCKETS = 16

_META_NAME = "_meta.json"  # '_' prefix: invisible to Spark's file listing


def _bucket_of(key_col: str, n_buckets: int):
    """Deterministic bucket id for a key: ``pmod(xxhash64(key), N)``.
    The key is hashed through its string form so the bucket survives a
    key-type migration (long → string) within one state table. The ONE
    bucket function for every hash-partitioned streaming state layout
    (this state table, the dedup index's band/shingle slices)."""
    return F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))


def success_dirs(pattern: str) -> list[str]:
    """Committed (``_SUCCESS``-gated) directories matching a glob —
    the shared commit-listing for every append-only per-batch state
    layout (``dedup_index``, ``sketch_stream``; this module's version
    chain layers the ``v_*`` name check on top)."""
    import glob as _glob
    import os as _os

    return sorted(
        d for d in _glob.glob(pattern) if _os.path.exists(f"{d}/_SUCCESS")
    )


def manifest_covered(root: str) -> set[str]:
    """Slice dirs shadowed by a committed compaction under ``root``:
    every dir listed in a ``c_*`` dir's ``_covered.json``. A compaction
    is committed by its MANIFEST (written after the parquet
    ``_SUCCESS``): a crash between consolidated write and source
    deletion leaves both on disk, and the manifest keeps readers from
    double-counting; a crash before the manifest leaves an invisible
    ``c_*`` dir and the sources stay live."""
    import glob as _glob
    import json as _json
    import os as _os

    out: set[str] = set()
    for c in _glob.glob(f"{root}/c_*"):
        # canonical names only: a stray copy's manifest must not get a
        # vote on what is covered (it could shadow a live slice)
        if not C_SLICE_RE.fullmatch(_os.path.basename(c)):
            continue
        if _os.path.exists(f"{c}/_SUCCESS"):
            covered = _read_manifest(f"{c}/_covered.json")
            if covered is not None:
                out.update(covered)
    return out


def slice_id_compacted(root: str, batch_id: int) -> bool:
    """Whether slice ``b_<batch_id>`` was folded AND compacted away
    (its name appears in a committed ``c_*`` manifest under ``root``).
    Folds must treat a covered id as a COMMITTED REPLAY and no-op —
    the slice-commit marker the usual replay check looks for is
    deleted by compaction, but the batch's content lives on in the
    consolidated slice. Without this check a crash in the window
    between a fold's inline compaction and the stream checkpoint
    commit would make the replay rewrite the batch as a permanently
    invisible (covered) slice — wasted work at best, and for
    non-idempotent downstreams a divergence. (Same-id-means-same-batch
    is the stream contract; a fresh checkpoint pointed at existing
    state violates it with ids that still exist on disk just the
    same.)"""
    return f"b_{batch_id:09d}" in manifest_covered(root)


def has_part_files(root: str) -> bool:
    """Whether a just-written parquet root contains any data files —
    the post-write emptiness check shared by every slice writer: a
    zero-ROW ``partitionBy`` write leaves only ``_SUCCESS`` (no
    readable part file), which wedges every later schema-inferring
    read of the dir. Writers that detect this overwrite the dir with a
    schema-bearing plain-column empty frame. Checked after the write
    so the hot (non-empty) path costs no extra Spark job."""
    import os as _os

    for _dirpath, _dirs, files in _os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                return True
    return False


def atomic_json_write(path: str, obj) -> None:
    """tmp + os.replace — a crash mid-write must never leave truncated
    JSON behind. The one writer for manifests, watermarks and meta."""
    import json as _json
    import os as _os

    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        _json.dump(obj, f)
    _os.replace(tmp, path)


def _read_manifest(path: str) -> list | None:
    """The compaction manifest, or None when missing OR truncated — a
    crash mid-write must demote the compaction to invisible (its
    source dirs are still live), not wedge every later listing with a
    JSON parse error. Writers use tmp+rename, so this tolerance only
    matters for legacy dirs and torn filesystems."""
    import json as _json
    import os as _os

    if not _os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return _json.load(f)
    except ValueError:
        return None


def sliced_committed(root: str) -> list[str]:
    """The LIVE slice dirs of an append-only per-batch layout:
    ``b_*`` batch slices (plain ``_SUCCESS``) plus manifest-committed
    ``c_*`` compactions, minus anything a committed manifest covers.
    The one listing shared by the dedup index and the sketch stream.
    CANONICAL names only: an operator's stray copy of a slice
    (``c_000000000.bak``, ``b_000000001 copy``) carries ``_SUCCESS``
    and a manifest just the same, and listing it would double-count
    its rows in every SUM-style merge-on-read."""
    import os as _os

    covered = manifest_covered(root)
    out = []
    for pat, regex in (("b_*", B_SLICE_RE), ("c_*", C_SLICE_RE)):
        for d in success_dirs(f"{root}/{pat}"):
            if not regex.fullmatch(_os.path.basename(d)):
                continue  # stray operator entry: never parsed
            # a c_* dir without a VALID manifest is an uncommitted
            # compaction (crash before/mid manifest): invisible, its
            # source dirs are still live
            if pat == "c_*" and _read_manifest(f"{d}/_covered.json") is None:
                continue
            if _os.path.basename(d) not in covered:
                out.append(d)
    return sorted(out)


_GC_NAME = "_gc.json"

# canonical compaction-slice name — the only manifest-less c_* dirs the
# sweep treats as crashed compactions (an operator's stray entry is
# never parsed or deleted)
import re as _re

C_SLICE_RE = _re.compile(r"c_\d{9}")
B_SLICE_RE = _re.compile(r"b_\d{9}")

# covered-id replay reach, in batch ordinals — shared by the tiered
# store's manifest prune (tiered.py imports it) and the versioned
# store's pruned-batch record below. Structured Streaming replays at
# most the one batch between the last fold and the checkpoint commit;
# 4096 keeps the metadata trivial while absorbing operator re-runs.
REPLAY_HORIZON = 4096

_PRUNED_BIDS_NAME = "_pruned_bids.json"


def _pruned_bids(state_path: str) -> set[int]:
    """Batch ids whose v_*_b{id} version was pruned away — the fold's
    replay record outliving the dir name it used to ride on. Bounded
    to :data:`REPLAY_HORIZON` of the newest recorded id."""
    import json as _json
    import os as _os

    p = f"{state_path}/{_PRUNED_BIDS_NAME}"
    if not _os.path.exists(p):
        return set()
    with open(p) as f:
        return {int(b) for b in _json.load(f)}


def _record_pruned_bid(state_path: str, bid: int) -> None:
    ids = sorted(_pruned_bids(state_path) | {int(bid)})
    ids = [i for i in ids if i > ids[-1] - REPLAY_HORIZON]
    atomic_json_write(f"{state_path}/{_PRUNED_BIDS_NAME}", ids)


def next_slice_dir(parent: str, prefix: str = "c_") -> str:
    """Path of the next free canonical ``{prefix}#########`` slice dir
    under ``parent``. The max scans CANONICAL names only: the graced
    sweep deliberately preserves a non-canonical ``c_*`` entry (an
    operator's ``c_000000003.bak``), so an unguarded
    ``int(basename[2:])`` here would turn that stray into a permanent
    compaction crash at every fold."""
    import glob as _glob
    import os as _os

    pat = _re.compile(_re.escape(prefix) + r"\d{9}")
    n = max(
        (
            int(_os.path.basename(d)[len(prefix):])
            for d in _glob.glob(f"{parent}/{prefix}*")
            if pat.fullmatch(_os.path.basename(d))
        ),
        default=-1,
    ) + 1
    return f"{parent}/{prefix}{n:09d}"


def set_gc_grace(table_path: str, grace_sec: float) -> None:
    """Persist a table-level GC retention window (``_gc.json``): every
    sweep under this table — including the ones the STREAM FOLDS
    trigger at their ``compact_every`` cadence, which an operator
    cannot pass arguments to — keeps covered slices on disk until
    their covering compaction commit is at least this old. Set it
    above the longest expected concurrent read; 0 (the default when
    the file is absent) reclaims immediately."""
    import os as _os

    _os.makedirs(table_path, exist_ok=True)
    atomic_json_write(
        f"{table_path}/{_GC_NAME}", {"grace_sec": float(grace_sec)}
    )


def read_gc_grace(table_path: str) -> float:
    """The table's persisted GC grace (``set_gc_grace``), 0.0 when
    never configured."""
    import json as _json
    import os as _os

    p = f"{table_path}/{_GC_NAME}"
    if not _os.path.exists(p):
        return 0.0
    try:
        with open(p) as f:
            return float(_json.load(f).get("grace_sec", 0.0))
    except (ValueError, OSError):
        return 0.0


def parquet_rows(path: str) -> int:
    """Exact row count from parquet FOOTERS under ``path`` — no Spark
    job, no data scan. The maintenance watermarks use this whenever
    the layout makes footer sums exact (a keyed-unique single slice, a
    newest-commit full snapshot): at a multi-TB state the occupancy
    poll must not cost a full table scan."""
    import glob as _glob

    import pyarrow.parquet as _pq

    total = 0
    for f in _glob.glob(f"{path}/**/*.parquet", recursive=True):
        total += _pq.ParquetFile(f).metadata.num_rows
    return total


def sweep_covered_slices(
    root: str,
    grace_sec: float | None = None,
    commit_marker: str = "_SUCCESS",
    config_path: str | None = None,
    uncommitted_re=None,
) -> None:
    """Physically delete slice dirs under ``root`` that a COMMITTED
    ``c_*`` manifest covers — the shared GC for every compacting slice
    store. Coverage (not deletion) is the commit: readers already skip
    covered dirs (:func:`sliced_committed`), so deletion is pure disk
    reclamation and can be deferred.

    The grace keeps a covered slice until its covering MANIFEST (the
    moment after which no new reader lists it) is at least that old —
    the vacuum-retention discipline: a reader that listed slices just
    before the compaction commit keeps its files for the grace window.
    ``grace_sec=None`` (the normal call shape) reads the TABLE-LEVEL
    setting (``set_gc_grace`` on ``config_path``, which defaults to
    ``root``; absent → 0 = reclaim immediately) — table-level because
    the sweeps that run inside stream folds take no operator
    arguments; a per-call float overrides it. Compactions call this
    instead of deleting their sources inline, which also heals the
    crash-after-manifest leak: a covered dir whose deletion crashed
    used to be skipped by every later listing but deleted by nothing.

    Only dirs NAMED IN a committed manifest are ever deleted — a
    stray operator entry (``b_000000001.bak``) never appears in one.
    ``commit_marker`` is the path (relative to the ``c_*`` dir) whose
    existence commits that compaction (the ANN appends commit on their
    last-written sub-table, not a root ``_SUCCESS``).

    ``uncommitted_re`` (a compiled regex, fullmatched against the
    basename — pass :data:`C_SLICE_RE` for the canonical layout) also
    reclaims manifest-less ``c_*`` dirs: crashed compactions, already
    invisible to every reader. These have no commit event, so the SAME
    grace gates them on dir mtime — which additionally protects a
    concurrent compactor's just-written, not-yet-committed output from
    another process's sweep (the in-flight window between the parquet
    write and the manifest)."""
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import time as _time

    g = (
        read_gc_grace(config_path if config_path is not None else root)
        if grace_sec is None
        else float(grace_sec)
    )
    now = _time.time()
    covered_at: dict[str, float] = {}
    for c in _glob.glob(f"{root}/c_*"):
        if not C_SLICE_RE.fullmatch(_os.path.basename(c)):
            # a stray operator entry's manifest (a .bak copy, junk)
            # must not get a vote on what is covered: readers ignore
            # it (manifest_covered is canonical-only), so honoring it
            # here could delete a dir readers still list
            continue
        mf = f"{c}/_covered.json"
        names = _read_manifest(mf)
        if names is None:
            if uncommitted_re is not None and uncommitted_re.fullmatch(
                _os.path.basename(c)
            ):
                try:
                    old = now - _os.path.getmtime(c) >= g
                except OSError:
                    old = False
                if old:
                    _shutil.rmtree(c, ignore_errors=True)
            continue
        if not _os.path.exists(f"{c}/{commit_marker}"):
            continue
        try:
            mt = _os.path.getmtime(mf)
        except OSError:
            continue
        for n in names:
            covered_at[n] = max(covered_at.get(n, 0.0), mt)
    for pat in ("b_*", "c_*"):
        for d in _glob.glob(f"{root}/{pat}"):
            name = _os.path.basename(d)
            if name in covered_at and now - covered_at[name] >= g:
                _shutil.rmtree(d, ignore_errors=True)


def covered_bytes_retained(root: str) -> int:
    """On-disk bytes of slice dirs a COMMITTED manifest covers but the
    sweep has not yet reclaimed — the disk the GC grace window (plus
    any not-yet-run sweep) is holding for concurrent readers. Readers
    already skip these dirs, so every byte here is pure retention; at
    a 100 TB state a generous grace on the span table is real money,
    and the maintenance watermark must surface it rather than let it
    accrue invisibly. Driver-side filesystem walk only — no Spark job
    (same discipline as :func:`parquet_rows`). The covered set comes
    from :func:`manifest_covered` — the SAME listing readers and
    sweeps use, so the meter cannot drift from what they skip."""
    import os as _os

    total = 0
    for name in manifest_covered(root):
        d = f"{root}/{name}"
        if not _os.path.isdir(d):
            continue
        for dirpath, _dirs, files in _os.walk(d):
            for fn in files:
                try:
                    total += _os.path.getsize(_os.path.join(dirpath, fn))
                except OSError:
                    pass  # swept concurrently mid-walk
    return total


def _read_meta(state_path: str) -> dict | None:
    import json as _json
    import os as _os

    p = f"{state_path}/{_META_NAME}"
    if not _os.path.exists(p):
        return None
    with open(p) as f:
        return _json.load(f)


def _ensure_meta(state_path: str, key: str, n_buckets: int) -> dict:
    """Bucket-layout metadata, written once at table creation; an
    existing table's recorded ``n_buckets``/``key`` always win over the
    caller's parameters (the bucket function must never change under a
    live table)."""
    import json as _json
    import os as _os

    meta = _read_meta(state_path)
    if meta is not None:
        return meta
    meta = {"n_buckets": int(n_buckets), "key": key}
    _os.makedirs(state_path, exist_ok=True)
    tmp = f"{state_path}/{_META_NAME}.tmp"
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    _os.replace(tmp, f"{state_path}/{_META_NAME}")
    return meta


_META_PENDING = "_meta.json.pending"


def _assert_no_pending_rebucket(state_path: str) -> None:
    """An interrupted :func:`rebucket_state` leaves its staged meta on
    disk; folding or reading through a half-migrated table would mix
    bucket-id semantics, so both refuse until the migration is re-run
    to completion (rebucket_state resumes idempotently)."""
    import os as _os

    if _os.path.exists(f"{state_path}/{_META_PENDING}"):
        raise RuntimeError(
            f"state table at {state_path} has an interrupted rebucket "
            "migration (pending meta present); re-run rebucket_state() "
            "to finish it before folding or reading"
        )


def suggest_rebucket(
    spark: SparkSession,
    state_path: str,
    target_rows_per_bucket: int = 2000,
    growth_factor: float = 2.0,
) -> dict:
    """The operational watermark for :func:`rebucket_state` — the
    bucket-count analog of ``ann_index.suggest_regrow``. Per-batch fold
    cost is O(touched buckets × rows per bucket), so a bucket count
    frozen at the local default bends the fold's flatness curve as
    state accumulates (measured: the composed corpus fold is 1.16× at
    100× state under 16 buckets and 1.01× under 256 — the
    ``corpus100``/``corpus100rb`` tiers). Reports current occupancy
    and a power-of-two target holding ``target_rows_per_bucket``
    (default 2000: comfortably inside the measured-flat regime, which
    held at ~780 rows/bucket and bent at ~12,500); ``due`` once the
    target reaches ``growth_factor`` × the current count. Offline —
    a maintenance job polls this between batches and runs
    ``rebucket_state`` / ``rebucket_corpus`` when due. When the newest
    commit is a ``_FULL`` snapshot (the steady state right after a
    compaction) the row count comes from parquet FOOTERS — exact, no
    Spark job, no state scan (at a multi-TB state the poll must not
    cost a full read); a delta tail composes and counts as before."""
    meta = _read_meta(state_path)
    if meta is None:
        raise ValueError(
            f"not a bucketed state table (no {_META_NAME}): {state_path}"
        )
    # the footer fast path never reads the state, so it must refuse a
    # half-migrated table explicitly (read_state's guard): a staged
    # pending means the layout is about to change under the meta this
    # report would describe
    _assert_no_pending_rebucket(state_path)
    vers = _state_versions(state_path)
    if vers and _is_full(vers[-1]):
        # newest commit is the whole state: footer sums are exact
        n = parquet_rows(vers[-1])
    else:
        st = read_state(spark, state_path)
        n = 0 if st is None else st.count()
    n_buckets = int(meta["n_buckets"])
    target = n_buckets
    while target * target_rows_per_bucket < n:
        target *= 2
    return {
        "state_rows": n,
        "n_buckets": n_buckets,
        "rows_per_bucket": round(n / max(n_buckets, 1), 1),
        "target_n_buckets": target,
        "due": target >= growth_factor * n_buckets,
    }


def rebucket_state(
    spark: SparkSession,
    state_path: str,
    new_n_buckets: int,
    keep_versions: int = 2,
) -> bool:
    """OFFLINE migration of a live state table to a new bucket count —
    the path from the local-mode default (16) to the thousands a
    production corpus needs, without abandoning the table.

    ``n_buckets`` is frozen in ``_meta.json`` at creation (the bucket
    function must never change under a live table), so migration is a
    full-snapshot rewrite: compose the current state, write it as the
    next version bucketed under ``new_n_buckets`` with a ``_FULL``
    marker (shadowing every old-layout version), then atomically
    replace the meta (tmp + ``os.replace``). Returns True when a
    migration ran, False for a no-op (already at the target count).

    Crash-safe via a staged ``_meta.json.pending``: folds and reads
    refuse while it exists (:func:`_assert_no_pending_rebucket`), and
    re-running this function resumes — the snapshot write is
    idempotent-by-new-version and the meta swap is the commit point.
    Must not run concurrently with a fold (same offline discipline as
    every compaction here).

    Time travel: versions at or after the migration read normally;
    ``as_of_version`` BELOW it raises :class:`StateVersionUnavailable`
    by design — pre-migration versions carry bucket ids under the old
    layout, which the new meta cannot reinterpret (the migration
    records ``migrated_at_version`` to detect this)."""
    import json as _json
    import os as _os

    meta = _read_meta(state_path)
    if meta is None:
        raise ValueError(
            f"not a bucketed state table (no {_META_NAME}): {state_path}"
        )
    pending = f"{state_path}/{_META_PENDING}"
    if _os.path.exists(pending):
        # resume at the STAGED parameters: a crashed migration finishes
        # at the count (and version cut-point) it was staged with,
        # regardless of the caller's args — rebucket_corpus resumes
        # with the CURRENT meta count, so honoring the caller here
        # would silently revert the half-done migration to the old
        # layout and redo it only if a later occupancy poll happened
        # to say due
        with open(pending) as f:
            staged = _json.load(f)
        new_n_buckets = int(staged["n_buckets"])
        all_dirs = _all_version_dirs(state_path)
        n = int(
            staged.get(
                "migrated_at_version",
                # hand-staged pendings (older layouts, tests) may lack
                # the cut-point: recompute it — folds refuse while the
                # pending exists, so the version counter cannot move
                _version_counter(all_dirs[-1]) + 1 if all_dirs else 0,
            )
        )
        new_meta = {
            **meta,
            **staged,
            "n_buckets": new_n_buckets,
            "migrated_at_version": n,
        }
    else:
        if int(meta["n_buckets"]) == int(new_n_buckets):
            return False
        all_dirs = _all_version_dirs(state_path)
        n = _version_counter(all_dirs[-1]) + 1 if all_dirs else 0
        new_meta = {
            **meta,
            "n_buckets": int(new_n_buckets),
            "migrated_at_version": n,
        }
        # atomic stage: a torn pending would both wedge the table
        # (folds/reads refuse on its existence) and crash every
        # documented resume path at json.load — unrecoverable without
        # hand-deleting the file
        atomic_json_write(pending, new_meta)
    # compose under the OLD meta (still in place — flat residual
    # filtering, if any, needs the old bucket function); _compose
    # directly, since read_state refuses while our own stage marker is
    # on disk
    st = _compose(spark, state_path, None)
    if st is not None:
        if BUCKET_COL in st.columns:
            st = st.drop(BUCKET_COL)
        vdir = f"{state_path}/v_{n:09d}"
        dp = spark.sparkContext.defaultParallelism
        st.withColumn(
            BUCKET_COL, _bucket_of(meta["key"], int(new_n_buckets))
        ).repartition(dp, F.col(BUCKET_COL)).write.mode(
            "overwrite"
        ).partitionBy(BUCKET_COL).parquet(vdir)
        if not has_part_files(vdir):
            # zero-row state: the partitionBy write left no readable
            # part file — rewrite as a schema-bearing plain frame
            # (the flat-full shape the composed read handles)
            spark.createDataFrame([], st.schema).write.mode(
                "overwrite"
            ).parquet(vdir)
        _mark_full(vdir)
    # commit point: swap the meta, clear the stage marker
    tmp = f"{state_path}/{_META_NAME}.tmp"
    with open(tmp, "w") as f:
        _json.dump(new_meta, f)
    _os.replace(tmp, f"{state_path}/{_META_NAME}")
    _os.remove(pending)
    _prune_versions(state_path, keep_versions)
    return True


def _version_buckets(vdir: str) -> list[int] | None:
    """Bucket ids present in a version dir, or None for a flat
    (non-bucketed) version."""
    import glob as _glob
    import os as _os

    subs = _glob.glob(f"{vdir}/{BUCKET_COL}=*")
    if not subs:
        return None
    return sorted(int(_os.path.basename(d).split("=")[1]) for d in subs)


def _is_full(vdir: str) -> bool:
    """A full-snapshot version shadows every older version entirely:
    flat versions are full by construction; bucketed ones carry an
    explicit ``_FULL`` marker (first write / compaction / pipeline)."""
    import os as _os

    return _os.path.exists(f"{vdir}/_FULL") or _version_buckets(vdir) is None


def _mark_full(vdir: str) -> None:
    with open(f"{vdir}/_FULL", "w") as f:
        f.write("")


def _legacy_root_files(state_path: str) -> bool:
    """True when ``state_path`` holds the pre-versioning FLAT layout:
    parquet part files directly at the root (no ``v_*`` chain)."""
    import glob as _glob

    return bool(_glob.glob(f"{state_path}/*.parquet")) or bool(
        _glob.glob(f"{state_path}/part-*")
    )


class StateVersionUnavailable(ValueError):
    """A time-travel read asked for a version whose reconstruction is
    incomplete: some bucket's newest copy at-or-below that version has
    been pruned (shadowed deltas and compacted-over snapshots are
    deleted by ``_prune_versions``). Raise rather than silently return
    partial state."""


def _bucket_sources(
    state_path: str,
    buckets: list[int] | None,
    versions: list[str] | None = None,
    strict: bool = False,
) -> tuple[list[str], tuple[str, set[int]] | None]:
    """Where each live bucket's newest committed copy lives.

    Walks versions newest→oldest collecting unseen bucket dirs,
    stopping at the first full snapshot. Returns ``(bucket_dir_paths,
    flat_residual)``; ``flat_residual = (flat_version_dir,
    shadowed_buckets)`` when a flat full version is the base layer —
    its rows must be filtered to buckets NOT shadowed by newer deltas.
    ``buckets=None`` means all buckets (full compose). ``versions``
    restricts the walk (time travel); ``strict`` raises
    :class:`StateVersionUnavailable` when the walk exhausts without
    reaching a full base (a pruned chain would otherwise read as a
    silently partial state)."""
    want = None if buckets is None else set(buckets)
    paths: list[str] = []
    seen: set[int] = set()
    vs = _state_versions(state_path) if versions is None else versions
    for v in reversed(vs):
        bks = _version_buckets(v)
        if bks is None:  # flat full snapshot: base layer
            return paths, (v, set(seen))
        new = [
            b for b in bks if b not in seen and (want is None or b in want)
        ]
        paths += [f"{v}/{BUCKET_COL}={b}" for b in new]
        seen.update(bks)  # a bucket present here shadows older copies
        if _is_full(v):
            return paths, None
        if want is not None and want <= seen:
            return paths, None
    if strict:
        raise StateVersionUnavailable(
            f"state at {state_path} cannot be reconstructed from versions "
            f"{[_version_counter(v) for v in vs]}: no full snapshot at or "
            "below the requested version (older versions were pruned)"
        )
    return paths, None


def _compose(
    spark: SparkSession,
    state_path: str,
    buckets: list[int] | None,
    versions: list[str] | None = None,
    strict: bool = False,
) -> DataFrame | None:
    """The live state (restricted to ``buckets`` when given) as a union
    of each bucket's newest committed copy. None when no state exists."""
    paths, flat = _bucket_sources(state_path, buckets, versions, strict)
    frames: list[DataFrame] = []
    if paths:
        frames.append(spark.read.option("mergeSchema", "true").parquet(*paths))
    if flat is not None:
        vdir, shadowed = flat
        df = spark.read.parquet(vdir)
        meta = _read_meta(state_path)
        if meta is not None:
            b = _bucket_of(meta["key"], meta["n_buckets"])
            if shadowed:
                df = df.where(~b.isin(*shadowed))
            if buckets is not None:
                df = df.where(b.isin(*buckets))
        frames.append(df)
    if not frames:
        return None
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def read_state(
    spark: SparkSession,
    state_path: str,
    as_of_version: int | None = None,
) -> DataFrame | None:
    """The committed state (composed across bucketed delta versions),
    or None before the first fold.

    ``as_of_version`` time-travels: reconstruct the table exactly as it
    stood after commit ``v_{as_of_version:09d}`` — the same
    newest-copy-per-bucket compose, restricted to versions at or below
    the target. History is bounded by retention: a version is readable
    while every bucket's newest at-or-below copy survives pruning
    (``keep_versions`` + full-snapshot compaction govern that);
    otherwise :class:`StateVersionUnavailable` is raised rather than
    returning silently partial state. At 100 TB this is the audit /
    reproducibility read — "the corpus as the run that trained model X
    saw it" — for free out of the layout the fold already writes."""
    _assert_no_pending_rebucket(state_path)
    if as_of_version is None:
        return _compose(spark, state_path, None)
    meta = _read_meta(state_path)
    migrated_at = (meta or {}).get("migrated_at_version")
    if migrated_at is not None and as_of_version < migrated_at:
        raise StateVersionUnavailable(
            f"version {as_of_version} predates the rebucket migration at "
            f"version {migrated_at}: pre-migration versions carry bucket "
            "ids under the old layout and are not reconstructible"
        )
    vers = [
        v
        for v in _state_versions(state_path)
        if _version_counter(v) <= as_of_version
    ]
    if not vers:
        raise StateVersionUnavailable(
            f"no committed version <= {as_of_version} under {state_path}"
        )
    return _compose(spark, state_path, None, versions=vers, strict=True)


def state_version_log(state_path: str) -> list[dict]:
    """The commit log: one entry per committed version, oldest→newest —
    ``{version, batch_id, full, buckets}``. ``batch_id`` is the
    streaming micro-batch that wrote it (None for batch-pipeline
    commits); ``buckets`` is None for flat (pre-bucketing) versions."""
    import os as _os

    out = []
    for v in _state_versions(state_path):
        name = _os.path.basename(v)
        out.append(
            {
                "version": _version_counter(v),
                "batch_id": int(name.split("_b")[1]) if "_b" in name else None,
                "full": _is_full(v),
                "buckets": _version_buckets(v),
            }
        )
    return out


def read_state_buckets(
    spark: SparkSession, state_path: str, buckets: list[int]
) -> DataFrame | None:
    """Pruned state read: only the given buckets' newest copies — the
    per-micro-batch merge target. Falls back to a filtered read of a
    legacy flat root when no version chain exists yet."""
    if not _state_versions(state_path):
        if _legacy_root_files(state_path):
            # part files ARE present (the guard above checked), so a
            # read failure here means a corrupt/torn legacy state —
            # propagate it: swallowing it would report "no state" and
            # silently restart the table from empty
            meta = _read_meta(state_path)
            if meta is None:
                return spark.read.parquet(state_path)
            return spark.read.parquet(state_path).where(
                _bucket_of(meta["key"], meta["n_buckets"]).isin(*buckets)
            )
        return None
    return _compose(spark, state_path, buckets)


def read_state_or_legacy(spark: SparkSession, state_path: str) -> DataFrame | None:
    """Current committed state, else the pre-versioning flat parquet
    layout (state written directly under ``state_path``), else None.
    The flat fallback keeps continuity for state tables created before
    versioning existed — both the batch pipeline's ``load_state`` and
    the streaming fold go through here so neither silently restarts
    from empty on a legacy layout."""
    st = read_state(spark, state_path)
    if st is not None:
        return st
    # look before the flat-layout read: probing an existing-but-
    # parquet-less dir (a table mid-creation holds only _meta.json)
    # raises at ANALYSIS, and with any Observation registered in the
    # session the ObservationManager's listener re-logs every failed
    # analysis as an ERROR — pure noise, but noise that looks like a
    # wedged fold in a corpus-stream log
    if not _legacy_root_files(state_path):
        return None
    # part files ARE present, so a failure here means a corrupt/torn
    # legacy state — propagate it rather than reporting "no state" and
    # silently restarting the table from empty (once a version chain
    # exists the flat root would never be consulted again, making the
    # loss permanent and invisible)
    return spark.read.parquet(state_path)


def _prune_versions(state_path: str, keep_versions: int) -> None:
    """Delete committed versions whose every bucket is shadowed by a
    newer committed version, keeping at least ``keep_versions`` newer
    commits above anything deleted (so a reader of v_{n-1} started
    before this commit never loses its files). Un-shadowed deltas are
    never deleted — a cold bucket's only copy stays live until a full
    snapshot (compaction) covers it."""
    import os as _os
    import re as _re
    import shutil as _shutil

    def _uncommit_then_delete(v: str) -> None:
        # record the batch id FIRST: the v_*_b{id} dir name is the
        # fold's only replay record, and two full commits while a
        # crashed stream is down would otherwise prune it — the
        # restarted stream would then double-fold its last batch
        m = _re.fullmatch(r"v_\d{9}_b(\d{9})", _os.path.basename(v))
        if m is not None:
            _record_pruned_bid(state_path, int(m.group(1)))
        # then drop the commit marker, THEN rmtree: rmtree deletes
        # entries in arbitrary order, so a crash mid-delete could
        # otherwise leave _SUCCESS/_FULL intact over missing bucket
        # dirs — a time-travel read bottoming out on that version
        # would return silently partial state instead of raising
        for marker in ("_SUCCESS", "_FULL"):
            try:
                _os.remove(f"{v}/{marker}")
            except OSError:
                pass
        _shutil.rmtree(v, ignore_errors=True)

    committed = _state_versions(state_path)
    for i, v in enumerate(committed):
        newer = committed[i + 1:]
        if len(newer) < keep_versions:
            break
        if any(_is_full(nv) for nv in newer):
            _uncommit_then_delete(v)
            continue
        vb = _version_buckets(v)
        if vb is None:
            continue  # flat base with no newer full: still live
        covered: set[int] = set()
        for nv in newer:
            covered.update(_version_buckets(nv) or ())
        if set(vb) <= covered:
            _uncommit_then_delete(v)


def bucketed_keyed_fold(
    batch: DataFrame,
    batch_id: int,
    state_path: str,
    key: str,
    merge_fn,
    n_buckets: int = N_STATE_BUCKETS,
    keep_versions: int = 2,
    compact_every: int = 8,
    needs_full=None,
) -> None:
    """ONE micro-batch folded into a versioned, hash-bucketed state
    table under an arbitrary keyed merge — the LSM commit protocol
    (replay no-op, crashed-attempt cleanup, touched-bucket pruning,
    delta version write, periodic ``_FULL`` compaction, retention
    pruning) factored out of :func:`incremental_merge_stream` so every
    keyed fold (CDC merge, curation min-fold, ...) shares one
    crash-safety implementation instead of re-deriving it.

    ``merge_fn(target, batch) -> DataFrame`` is the per-key merge:
    ``target`` is the current state restricted to the batch's touched
    buckets (or the FULL state on compaction commits, or None before
    the first commit); it must be a pure keyed fold — a key absent
    from the batch must pass through unchanged — because bucket-local
    merge ≡ global merge is exactly what makes the pruned read sound.
    It must also be NON-DELETING: every key present in ``target`` must
    appear in the output (T7 infinite retention — deletions are status
    flips, J8-style, never dropped rows). The version layout cannot
    express "this bucket is now empty" (a partitionBy write emits no
    dir for an empty bucket, so reads fall back to the bucket's older
    version and deleted rows would silently resurrect). The
    all-buckets-emptied case raises loudly at the commit boundary;
    a partial per-bucket emptying is undetectable at fold cost and is
    excluded by this contract.
    ``needs_full(batch) -> bool`` forces a full-state merge + snapshot
    for batches whose merge semantics reach beyond their own keys'
    buckets (e.g. the CDC url-adoption path)."""
    import shutil as _shutil

    _assert_no_pending_rebucket(state_path)
    suffix = f"_b{batch_id:09d}"
    committed = _state_versions(state_path)
    # replay no-op: the batch already committed — as a live v_*_b{id}
    # dir, or as a pruned one whose id outlives in the sidecar record
    # (_prune_versions can delete the dir while a crashed stream is
    # down, once two newer full commits shadow it)
    if any(v.endswith(suffix) for v in committed) or batch_id in _pruned_bids(
        state_path
    ):
        return
    # clear garbage from a crashed attempt of this same batch
    for d in _all_version_dirs(state_path):
        if d.endswith(suffix) and d not in committed:
            _shutil.rmtree(d, ignore_errors=True)
    sess = batch.sparkSession
    meta = _ensure_meta(state_path, key, n_buckets)
    n_bk = int(meta["n_buckets"])
    touched = sorted(
        r[0]
        for r in batch.select(_bucket_of(key, n_bk).alias("b"))
        .where(F.col("b").isNotNull())
        .distinct()
        .collect()
    )
    if not touched:
        return  # empty batch: nothing to fold, nothing to commit
    # this commit's version counter — monotonic across prunes, so the
    # compaction cadence is exactly every compact_every-th commit
    # (counting surviving versions instead would fire early: pruning
    # shrinks the committed list after every full snapshot)
    all_dirs = _all_version_dirs(state_path)
    n = _version_counter(all_dirs[-1]) + 1 if all_dirs else 0
    full = (
        not committed
        or n % compact_every == 0
        or (needs_full is not None and needs_full(batch))
    )
    if full:
        target = read_state_or_legacy(sess, state_path)
    else:
        target = read_state_buckets(sess, state_path, touched)
    merged = merge_fn(target, batch)
    out = merged.withColumn(BUCKET_COL, _bucket_of(key, n_bk))
    vdir = f"{state_path}/v_{n:09d}{suffix}"
    # repartition by bucket so each bucket lands in ~one file (a
    # key-partitioned merge output would otherwise scatter every
    # bucket across every task → buckets x tasks tiny files); full
    # snapshots keep the session's parallelism
    dp = sess.sparkContext.defaultParallelism
    n_parts = dp if full else max(1, min(len(touched), dp))
    out.repartition(n_parts, F.col(BUCKET_COL)).write.mode(
        "overwrite"
    ).partitionBy(BUCKET_COL).parquet(vdir)
    if not has_part_files(vdir):
        # a zero-row partitionBy write leaves only _SUCCESS — no part
        # files, no bucket dirs — which _version_buckets would misread
        # as a FLAT full snapshot that cannot even infer a schema,
        # wedging every later read AND fold (reachable: a first batch
        # whose rows are all keyless-unmatched merges to zero rows
        # while touched is non-empty, xxhash64(NULL) being the seed).
        # A zero-row merge over NON-EMPTY prior state means merge_fn
        # deleted rows — a contract violation (see docstring) on BOTH
        # commit shapes: a dropped DELTA commit would silently
        # resurrect the rows on the next read, and an empty FULL
        # commit (compaction cadence / needs_full) would silently
        # truncate the whole state table. Raise at the boundary
        # instead; the target probe is one limit-1 job on this rare
        # path only. The empty dir is removed first so the raise
        # leaves no part-file-less version to wedge later reads.
        _shutil.rmtree(vdir, ignore_errors=True)
        if target is not None and target.limit(1).count() > 0:
            raise RuntimeError(
                f"bucketed_keyed_fold: batch {batch_id} merged "
                f"{'the full state' if full else str(len(touched)) + ' non-empty touched bucket(s)'} "
                f"of '{state_path}' to ZERO rows — merge_fn violated "
                "the non-deleting contract (the layout cannot commit "
                "an emptied state; deletions must be status flips, "
                "not dropped rows)"
            )
        # Legitimately empty: a DELTA over empty prior state is a
        # no-op — skip the commit (a replay recomputes the same
        # nothing). An empty FULL commit (first batch, keyless rows
        # merging to nothing) rewrites as a schema-bearing plain frame
        # — the legacy-flat shape the composed read already handles
        # (bucket membership recomputed from meta).
        if not full:
            return
        sess.createDataFrame(
            [], out.drop(BUCKET_COL).schema
        ).write.mode("overwrite").parquet(vdir)
    if full:
        _mark_full(vdir)
    _prune_versions(state_path, keep_versions)


def incremental_merge_stream(
    snapshots: DataFrame,
    state_path: str,
    checkpoint_path: str,
    key: str = "offer_id",
    order_cols: list[str] | None = None,
    available_now: bool = True,
    keep_versions: int = 2,
    n_buckets: int = N_STATE_BUCKETS,
    compact_every: int = 8,
    expectations: dict | None = None,
    quarantine_path: str | None = None,
    **merge_kwargs,
):
    """T3: fold each micro-batch into the persistent state table via
    the batch merge operator. Returns the started StreamingQuery.

    The state table is VERSIONED and HASH-BUCKETED. Each fold:

    1. computes the batch's touched buckets
       (``pmod(xxhash64(key), n_buckets)`` — ≤ n_buckets scalars to the
       driver, never rows);
    2. reads ONLY those buckets' newest committed copies as the merge
       target (:func:`read_state_buckets`) — keys in untouched buckets
       are identity under the merge, so the bucket-local merge equals
       the global one;
    3. writes a DELTA version ``v_{counter}_b{batch}`` containing only
       the touched ``state_bucket=K`` partitions (``_SUCCESS``-gated; a
       crashed write is invisible, a replayed committed batch is a
       no-op — idempotent exactly as before).

    Untouched buckets stay live in older versions; the composed read
    picks each bucket's newest copy. Every ``compact_every`` commits
    the fold reads the FULL state and writes a ``_FULL`` snapshot so
    shadowed deltas can be pruned (``keep_versions`` newer commits are
    always left above anything deleted). Per-batch I/O is therefore
    O(touched buckets) + amortized O(|state|/compact_every), replacing
    the previous O(|state|) rewrite per batch. A legacy pre-versioning
    flat layout (or a fresh checkpoint over pipeline-written versions)
    is migrated by an immediate full snapshot. Read the result with
    :func:`read_state`.

    ``expectations`` (name -> boolean Column, operators/expectations
    contract) gates every batch BEFORE the fold: failing rows never
    reach the state table; with ``quarantine_path`` they land in a
    per-batch ``b_*`` dir (mode=overwrite, so crashed-batch replays
    rewrite rather than double-append) tagged with their violations
    and batch id — the streaming twin of the pipeline's A7-observed
    gate.
    """
    order_cols = order_cols or ["updated_date", "event_id"]

    def merge_fn(target: DataFrame | None, batch: DataFrame) -> DataFrame:
        if target is None:
            target = batch.limit(0).drop("updated_date")
        return merge_listings(
            target, batch, key=key, order_cols=order_cols, **merge_kwargs
        )

    def needs_full(batch: DataFrame) -> bool:
        # Full-state merge only when the batch actually CONTAINS a
        # J5-adoptable row (NULL key + offer_url): adoption looks the
        # url up across the whole keyed state, so the adopting row's
        # bucket cannot be pruned from the batch side. Keyed rows never
        # adopt (merge.py's J5 join takes only source keyless rows), so
        # keyed-only batches fold bucket-pruned. Gating on mere column
        # PRESENCE — the previous check — made every url-bearing stream
        # pay an O(state) merge + full snapshot per micro-batch; the
        # limit(1) probe costs one O(batch) job instead.
        url_col = merge_kwargs.get("url_col", "offer_url")
        if url_col not in batch.columns:
            return False
        return (
            batch.where(
                F.col(key).isNull() & F.col(url_col).isNotNull()
            )
            .limit(1)
            .count()
            > 0
        )

    def fold(batch: DataFrame, batch_id: int) -> None:
        if expectations:
            from rental_data_pipeline_spark.operators.expectations import (
                VIOLATIONS_COL,
                validate,
            )

            tagged = validate(batch, expectations)
            if quarantine_path:
                tagged.where(F.size(F.col(VIOLATIONS_COL)) > 0).withColumn(
                    "_batch_id", F.lit(batch_id)
                ).write.mode("overwrite").parquet(
                    f"{quarantine_path}/b_{batch_id:09d}"
                )
            batch = tagged.where(
                F.size(F.col(VIOLATIONS_COL)) == 0
            ).drop(VIOLATIONS_COL)
        bucketed_keyed_fold(
            batch,
            batch_id,
            state_path,
            key=key,
            merge_fn=merge_fn,
            n_buckets=n_buckets,
            keep_versions=keep_versions,
            compact_every=compact_every,
            needs_full=needs_full,
        )

    writer = (
        snapshots.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_price_stats_stream_exact(
    snapshots: DataFrame,
    window_duration: str = "1 hour",
    time_col: str = "updated_date",
    key_col: str = "offer_id",
    price_col: str = "price_value",
) -> DataFrame:
    """T4 on the REAL streaming engine, oracle-hashable: tumbling-window
    stats shaped so every aggregate is deterministic under micro-batch
    partial aggregation — exact distinct via ``collect_set`` size
    (COUNT(DISTINCT) is unsupported in streaming), the price sum in
    DECIMAL so accumulation order across batches can't change the
    double bits, and the average derived from that exact sum with ONE
    double division. Run with complete output mode (no watermark
    cutoff, every window emitted), which is how a bounded replay
    produces the full history; the production path with late-data
    eviction is ``windowed_price_stats`` below."""
    sum_dec = F.sum(F.col(price_col).cast("decimal(18,6)")).cast("double")
    n_vals = F.count(price_col)
    return (
        snapshots.groupBy(F.window(F.col(time_col), window_duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_snapshots"),
            F.size(F.collect_set(key_col)).alias("n_offers"),
            sum_dec.alias("sum_price"),
            (sum_dec / n_vals).alias("avg_price"),
            F.min(price_col).alias("min_price"),
            F.max(price_col).alias("max_price"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_snapshots",
            "n_offers",
            "sum_price",
            "avg_price",
            "min_price",
            "max_price",
        )
    )


def windowed_price_stats(
    snapshots: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    time_col: str = "updated_date",
    key_col: str = "offer_id",
    approx_distinct: bool = True,
) -> DataFrame:
    """T4/T7: watermarked tumbling-window price analytics — the
    bounded-state streaming aggregation the merge can't be (it must
    retain every key). Works identically on a batch DataFrame (window
    function is engine-agnostic), which is how the test oracles it.
    ``approx_distinct`` uses HLL++ (streaming-safe, bounded state);
    the batch twin may ask for an exact distinct count."""
    distinct = (
        F.approx_count_distinct(key_col)
        if approx_distinct
        else F.count_distinct(key_col)
    )
    return (
        snapshots.withWatermark(time_col, watermark_delay)
        .groupBy(F.window(F.col(time_col), window_duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_snapshots"),
            distinct.alias("n_offers"),
            F.avg("price_value").alias("avg_price"),
            F.min("price_value").alias("min_price"),
            F.max("price_value").alias("max_price"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_snapshots",
            "n_offers",
            "avg_price",
            "min_price",
            "max_price",
        )
    )
