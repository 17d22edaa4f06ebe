"""Sinks (SURVEY.md §2.C "Sinks"): batch parquet writes and a streaming
foreachBatch MERGE-style upsert.

The reference's "sink" is the out-BlockingQueue plus the live mutable maps
the host app reads (README.md:97, 131).  The engine's equivalents:

- batch: ``write.parquet`` of any cache view (partitioned for pruning);
- streaming: ``foreachBatch`` maintaining a keyed cache table — the
  update-mode stream of new cache rows merged into the stored table by
  key.  Without a transactional table format in this container the merge
  is emulated as read+union+dedupe+atomic-rename; on a real deployment the
  body becomes a Delta/Iceberg MERGE INTO with the same keys (the
  foreachBatch wiring — checkpointing, per-epoch idempotence — is
  identical).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_cache_parquet(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def write_cache_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
) -> None:
    """Persist a cache view as a BUCKETED parquet table: rows are
    hash-distributed into ``num_buckets`` files per partition on
    ``bucket_cols`` and each bucket is sorted on them.

    This is the co-location lever for the read-side API at scale: two
    cache views bucketed the same way (same columns, same count) join
    WITHOUT a shuffle — the scan itself satisfies the join's
    distribution requirement, so repeated B-API queries against 100 TB
    cache tables pay the shuffle once at write time, never per query
    (pinned in tests/test_sinks.py::test_bucketed_cache_join_has_no_shuffle).
    """
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table_name)
    )


def _check_state_columns(stored_cols, upd_cols, target_path: str) -> None:
    """State tables do not silently auto-evolve: a merge whose batch
    schema differs from the stored schema refuses with the actual
    difference instead of surfacing Spark's unresolved-column union
    error mid-plan.  Evolution is an explicit rewrite (read, add/backfill
    the column, write a new table) — at 100 TB a schema change is a
    migration, not a side effect of one micro-batch."""
    stored = set(stored_cols) - {"kb", DELETED_COL}
    upd = set(upd_cols) - {"kb", DELETED_COL}
    if stored != upd:
        raise ValueError(
            f"schema mismatch merging into {target_path}: updates have "
            f"{sorted(upd)} but the stored table has {sorted(stored)} "
            f"(missing from updates: {sorted(stored - upd)}; new in "
            f"updates: {sorted(upd - stored)}).  State tables do not "
            "auto-evolve; migrate explicitly by rewriting the table."
        )


def _with_kb(df: DataFrame, key_cols: list[str], n_buckets: int) -> DataFrame:
    """Attach the key-bucket column: Murmur3 hash of the key columns mod
    ``n_buckets`` — deterministic across sessions, so a key always lands
    in the same bucket directory for the lifetime of the table.

    Key SKEW caveat: the layout balances distinct KEYS, not rows — every
    row of a hot key hashes into one bucket, so a key carrying 50% of
    the table makes one bucket ~50% of the bytes.  Merges and lookups
    stay CORRECT (pinned in tests/test_sinks.py::
    test_bucketed_merge_correct_under_hot_key_skew); the cost is that
    touching the hot key rewrites/reads its oversized bucket, and
    rebucket_state_table fixes bucket COUNT, not skew.  This is fine for
    one-row-per-key state (the upsert caches: a "hot" key is still one
    row) and for pair tables keyed (doc_a, doc_b) (composite keys spread).
    A table with MANY ROWS per hot key (count-style additive state fed
    by a celebrity key) takes the opt-in ``n_salt`` of accumulate_batch:
    the key widens with a salt column so the hot key's partials spread
    across up to n_salt buckets, and reads merge the partials back
    (read_state_table / lookup_state_keys are salt-aware via the table
    meta)."""
    return df.withColumn(
        "kb", F.pmod(F.hash(*key_cols), F.lit(n_buckets)).cast("int")
    )


def _distinct_kbs(df: DataFrame) -> list[int]:
    """Distinct ``kb`` values of a routed relation.  When the relation
    folds to a LocalRelation (driver-held key sets: driver_local
    relations and their projections), the collect is driver-side and
    the dedup happens in Python — no job, no exchange; otherwise the
    usual distinct aggregation runs."""
    from streamsum_spark.util import is_local_relation

    if is_local_relation(df):
        return sorted({r.kb for r in df.select("kb").collect()})
    return sorted(r.kb for r in df.select("kb").distinct().collect())


def _cheap_to_reevaluate(df: DataFrame) -> bool:
    """Whether every leaf of ``df``'s optimized plan is already
    materialized driver- or block-side (LocalRelation / LogicalRDD,
    i.e. collected rows or localCheckpoint output): re-evaluating such
    a plan re-reads blocks instead of recomputing upstream work, so a
    defensive checkpoint before a probe+write double evaluation would
    only add a copy.  Best-effort False on introspection errors."""
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        names = {
            leaves.apply(i).getClass().getSimpleName()
            for i in range(leaves.size())
        }
        return bool(names) and names <= {"LocalRelation", "LogicalRDD"}
    except Exception:
        return False


def _assert_bucketed_layout(target_path: str) -> None:
    """A bucketed merge against a FLAT table would silently ignore all
    existing rows (it only reads kb= subdirectories) — refuse instead."""
    if os.path.isdir(target_path) and any(
        f.startswith("part-") for f in os.listdir(target_path)
    ):
        raise ValueError(
            f"{target_path} has a flat layout; n_buckets merges require a "
            "table created with the same n_buckets (kb= directories)"
        )


# Replay manifests are bounded: foreachBatch redelivers at most the epochs
# after the last committed checkpoint offset (in practice one), so a
# 4096-marker tail is orders of magnitude beyond any replay horizon while
# keeping the manifest file size constant over a long-running stream.
_MANIFEST_CAP = 4096

#: Hot-key salt column (opt-in via accumulate_batch n_salt): widens the
#: key so a celebrity key's ADDITIVE partials spread across up to n_salt
#: buckets instead of concentrating in one.  Like kb, it is layout, not
#: state — salt-aware reads merge the partials and drop the column.
SALT_COL = "_salt"

#: Tombstone column: a batch row with _deleted = true DELETES its key if
#: it wins newest-wins (a stale delete loses to a newer upsert, exactly
#: like a stale update).  The column is merge INSTRUCTION, not state —
#: winners are filtered and the column dropped before write, so the
#: stored table never carries it.
DELETED_COL = "_deleted"


def _align_tombstones(stored: DataFrame | None, upd: DataFrame):
    """When the batch carries the tombstone column, give the stored side
    an all-false twin so the union resolves; returns (stored, has_del)."""
    has_del = DELETED_COL in upd.columns
    if has_del and stored is not None and DELETED_COL not in stored.columns:
        stored = stored.withColumn(DELETED_COL, F.lit(False))
    return stored, has_del


def _drop_deleted(reduced: DataFrame, has_del: bool) -> DataFrame:
    if not has_del:
        return reduced
    return reduced.where(
        ~F.coalesce(F.col(DELETED_COL), F.lit(False))
    ).drop(DELETED_COL)


def _resolve_bucket_cols(
    key_cols: list[str], bucket_cols: list[str] | None
) -> list[str]:
    """The columns kb hashes: default the full key; callers may narrow to
    a SUBSET of the key columns so the bucket routing matches a read-side
    access path (e.g. a signature store keyed (band, mh, doc_id) but
    bucketed on (band, mh) — the LSH join key).  Only key subsets are
    legal: bucketing on a value column would move a key to a different
    bucket when its value changes, silently duplicating keys across
    buckets."""
    if bucket_cols is None:
        return list(key_cols)
    if not set(bucket_cols) <= set(key_cols):
        raise ValueError(
            f"bucket_cols {bucket_cols} must be a subset of key_cols "
            f"{key_cols}: a non-key bucket column changes bucket when the "
            "value changes, duplicating keys across buckets"
        )
    return list(bucket_cols)


def _read_meta(target_path: str) -> dict | None:
    import json

    meta = os.path.join(target_path, "_table_meta.json")
    if not os.path.exists(meta):
        return None
    try:
        with open(meta) as fh:
            return json.load(fh)
    except ValueError:
        return None


def _check_bucket_meta(
    spark: SparkSession,
    target_path: str,
    n_buckets: int,
    key_cols: list[str],
    bucket_cols: list[str] | None = None,
    columns: list[str] | None = None,
    extra_meta: dict | None = None,
) -> None:
    """Enforce the docstring's "pass the same n_buckets for the table's
    lifetime": the kb assignment is ``hash(key) % n_buckets``, so merging
    an existing table with a DIFFERENT count would silently DUPLICATE keys
    across buckets (the stored row stays in its old bucket while the
    update lands in a new one).  The bucket count is recorded in a
    ``_table_meta.json`` at table creation and a mismatch refuses.

    Tables created before the meta existed are adopted only after a FULL
    verification: ``pmod(hash(key_cols), n_buckets)`` is recomputed over
    every stored row and compared to its kb partition value (the same
    check rebucket_state_table runs).  A structural check alone (max
    on-disk kb < n_buckets) is one-sided — a legacy 8-bucket table's
    indices all pass a 16-bucket scan, and adopting it would bake the
    wrong modulus into the meta, scattering keys across mismatched
    buckets and routing lookups to the wrong bucket forever after.  The
    verify is a one-time cost at adoption; mismatches are refused with a
    pointer at rebucket_state_table."""
    import json

    bcols = _resolve_bucket_cols(key_cols, bucket_cols)
    meta = os.path.join(target_path, "_table_meta.json")
    if os.path.isdir(target_path):
        stored_meta = _read_meta(target_path)
        stored = stored_meta.get("n_buckets") if stored_meta else None
        if stored is not None:
            if stored != n_buckets:
                raise ValueError(
                    f"{target_path} was created with n_buckets={stored}; "
                    f"merging with n_buckets={n_buckets} would scatter keys "
                    "across mismatched buckets (rebucket by rewriting the "
                    "table instead)"
                )
            stored_salt = stored_meta.get("n_salt")
            want_salt = (extra_meta or {}).get("n_salt")
            if stored_salt != want_salt:
                # diagnosed BEFORE bucket_cols: a salt mismatch also
                # perturbs bucket_cols (the salt is one of them), and
                # the root cause is the salt
                raise ValueError(
                    f"{target_path} was created with n_salt={stored_salt}; "
                    f"merging with n_salt={want_salt} would route a key's "
                    "salted partials to different buckets (rewrite the "
                    "table to change the salt)"
                )
            stored_bcols = stored_meta.get("bucket_cols", list(key_cols))
            if stored_bcols != bcols:
                raise ValueError(
                    f"{target_path} was created with bucket_cols="
                    f"{stored_bcols}; merging with bucket_cols={bcols} "
                    "would route keys to different buckets (rebucket by "
                    "rewriting the table instead)"
                )
            return
        if any(d.startswith("kb=") for d in os.listdir(target_path)):
            stored_df = spark.read.parquet(target_path)
            recomputed = F.pmod(F.hash(*bcols), F.lit(n_buckets)).cast("int")
            n_bad = stored_df.where(F.col("kb") != recomputed).count()
            if n_bad:
                raise ValueError(
                    f"{n_bad} stored rows' kb disagree with "
                    f"hash({bcols}) % {n_buckets} in {target_path}; the "
                    "table was created with a different bucket count (or "
                    "key set) — run rebucket_state_table instead of "
                    "adopting the wrong modulus"
                )
    os.makedirs(target_path, exist_ok=True)
    tmp = os.path.join(target_path, f"._meta-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        json.dump(
            {
                "n_buckets": n_buckets,
                "bucket_cols": bcols,
                "columns": columns,
                **(extra_meta or {}),
            },
            fh,
        )
    os.replace(tmp, meta)  # atomic; os.replace so fault-injection tests
    # counting os.rename syscalls see only the data-swap renames


def _write_schema_sidecar(target_path: str, schema_json: str) -> None:
    """Record the table schema at the root so an emptied table (every key
    tombstoned) still reads as a TYPED empty relation.  Metadata only —
    written via os.replace, not part of the crash-atomic data swaps."""
    tmp = os.path.join(target_path, f"._schema-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write(schema_json)
    os.replace(tmp, os.path.join(target_path, "_schema.json"))


def _sidecar_schema(target_path: str, with_kb: bool | None = None):
    """The table schema recorded by the last merge, as a StructType — or
    None when no sidecar exists (pre-sidecar tables, foreign dirs).
    Passing it to ``spark.read.schema(...)`` skips parquet schema
    INFERENCE, which is a whole Spark job per read: on an incremental
    pipeline doing dozens of small state reads per cycle, inference is
    pure scheduling overhead on data whose schema is enforced constant
    by _check_state_columns anyway.  ``with_kb`` forces the internal
    bucket-partition column in (True) or out (False) of the returned
    schema regardless of what the sidecar recorded."""
    import json as _json

    from pyspark.sql import types as T

    sidecar = os.path.join(target_path, "_schema.json")
    try:
        with open(sidecar) as fh:
            schema = T.StructType.fromJson(_json.load(fh))
    except (OSError, ValueError, KeyError):
        return None
    has_kb = any(f.name == "kb" for f in schema.fields)
    if with_kb is True and not has_kb:
        schema = T.StructType(
            schema.fields + [T.StructField("kb", T.IntegerType())]
        )
    elif with_kb is False and has_kb:
        schema = T.StructType([f for f in schema.fields if f.name != "kb"])
    return schema


def _list_data_files(target_path: str) -> list[str]:
    """The table's CURRENT committed data files, pinned into the read
    plan — snapshot semantics, the from-scratch equivalent of reading a
    table format's manifest.  Part-file names carry a uuid, so any
    merge/swap yields a DIFFERENT list: a plan (or a CacheManager entry
    derived from one) built before a swap can never be mistaken for a
    post-swap read, killing the stale-cache hazard by construction —
    while an UNCHANGED table still produces the identical plan and keeps
    its legitimate cache hits.  Flat layouts list part files at the
    root; bucketed/salted layouts list inside the kb= directories."""
    out: list[str] = []
    try:
        entries = sorted(os.listdir(target_path))
    except FileNotFoundError:
        return out
    for d in entries:
        p = os.path.join(target_path, d)
        if d.startswith("kb=") and os.path.isdir(p):
            out.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
        elif d.endswith(".parquet") and not d.startswith((".", "_")):
            out.append(p)
    return out


def _merge_salt_partials(df: DataFrame, meta: dict) -> DataFrame:
    """Collapse a salted additive table's per-salt PARTIAL rows back to
    the logical one-row-per-key table, using the combine recorded at
    table creation.  Column order is preserved (minus the salt)."""
    agg_fn = {"sum": F.sum, "min": F.min, "max": F.max, "bit_or": F.bit_or}[
        meta.get("combine", "sum")
    ]
    sum_cols = meta["sum_cols"]
    group = [c for c in df.columns if c not in sum_cols and c != SALT_COL]
    out = df.groupBy(*group).agg(
        *[agg_fn(c).cast("long").alias(c) for c in sum_cols]
    )
    return out.select(*[c for c in df.columns if c != SALT_COL])


def read_state_table(spark: SparkSession, target_path: str) -> DataFrame:
    """Read a keyed state table regardless of layout, hiding the internal
    ``kb`` bucket column of bucketed tables — and, for salted additive
    tables, merging the per-salt partials so callers always see the
    logical one-row-per-key table.  A table whose keys were all
    tombstoned reads as a typed empty relation via the schema sidecar."""
    from pyspark.sql import types as T

    try:
        # bucketed tables need kb in the explicit schema (it is a
        # partition-directory column the files themselves don't carry)
        schema = _sidecar_schema(
            target_path,
            with_kb=True if _read_meta(target_path) else None,
        )
        reader = spark.read.schema(schema) if schema is not None else spark.read
        files = _list_data_files(target_path)
        if files:
            # snapshot read: the current file set IS the plan identity
            # (see _list_data_files) — basePath keeps kb partition
            # discovery working over explicitly-listed leaf files
            df = reader.option("basePath", target_path).parquet(*files)
        elif schema is not None:
            # no data files but a sidecar: a genuinely emptied table
            # reads as a typed empty relation without touching Spark IO
            df = spark.createDataFrame([], schema)
        else:
            df = reader.parquet(target_path)
    except Exception:
        # the typed-empty fallback is ONLY for a genuinely emptied table
        # (every key tombstoned: no data files at all, just the sidecar).
        # A table that HAS data files but failed to read — corrupt
        # footer, permission error, transient FS fault — must raise, not
        # silently become "no state" and poison downstream merges.
        sidecar = os.path.join(target_path, "_schema.json")
        has_data = False
        for _root, dirs, fs in os.walk(target_path):
            # prune metadata/staging subtrees (_snap, _changes, ._swap…):
            # only committed data layout counts as "has data"
            dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
            if any(
                f.endswith(".parquet") and not f.startswith((".", "_"))
                for f in fs
            ):
                has_data = True
                break
        if os.path.exists(sidecar) and not has_data:
            import json

            with open(sidecar) as fh:
                schema = T.StructType.fromJson(json.load(fh))
            df = spark.createDataFrame([], schema)
        else:
            raise
    df = df.drop("kb") if "kb" in df.columns else df
    if SALT_COL in df.columns:
        meta = _read_meta(target_path)
        if not (meta and meta.get("n_salt") and meta.get("sum_cols")):
            # a _salt column IS the salted layout: silently returning the
            # per-salt partials (multiple rows per logical key, internal
            # column leaked) would feed duplicates downstream — the meta
            # must say how to merge them, so its absence is corruption
            raise ValueError(
                f"{target_path} has a {SALT_COL} column but no readable "
                "salted-layout meta (n_salt/sum_cols in _table_meta.json) "
                "— cannot merge the partials; restore the table meta"
            )
        df = _merge_salt_partials(df, meta)
    return df


def lookup_state_keys(
    spark: SparkSession,
    target_path: str,
    key_cols: list[str],
    key_values: list[tuple],
) -> DataFrame:
    """Point/multi-key lookup on a BUCKETED state table that scans ONLY
    the bucket directories the requested keys hash into — the read-side
    payoff of the kb layout: a B-API point query (Queries.java:9-14
    getCount) against a 100 TB cache table touches O(|keys|) buckets, not
    the whole table.  ``n_buckets`` comes from the table's
    ``_table_meta.json``, so callers never re-supply (or mis-supply) it.

    The kb computation reuses ``_with_kb`` on a literal DataFrame of the
    requested keys — the exact write-side Murmur3 expression, so read and
    write can never disagree on a key's bucket.

    Salted additive tables route each requested key to ALL of its
    n_salt possible buckets (a bounded n_salt-fold expansion of the key
    list, never a full scan) and merge the partials before returning —
    callers still see one row per stored key."""
    keys_df = spark.createDataFrame(
        [tuple(v) if isinstance(v, (tuple, list)) else (v,) for v in key_values],
        key_cols,
    )
    meta = _read_meta(target_path)
    n_salt = (meta or {}).get("n_salt")
    if n_salt:
        salts = spark.createDataFrame([(s,) for s in range(n_salt)], f"{SALT_COL} int")
        keys_df = keys_df.crossJoin(salts)
    stored = _read_touched(spark, target_path, keys_df, key_cols)
    if stored is None:
        return read_state_table(spark, target_path).limit(0)
    pruned, keys_cast = stored
    if 0 < len(key_values) <= 1000:
        # per-column IN filters (a superset of the composite key set) are
        # PUSHABLE predicates: merges write each bucket as one key-sorted
        # file, so the parquet scan skips row groups via min/max stats
        # before the exact semi-join below — sub-bucket pruning.
        # Rendered as ONE parsed SQL IN per column (_in_set_pred):
        # isin() pays a py4j round trip per literal, ~3 s just to build
        # a 1000-key predicate
        from streamsum_spark.util import _in_set_pred

        rows = keys_cast.collect()
        for c in key_cols:
            vals = {r[c] for r in rows}
            vals.discard(None)
            if not vals:
                continue
            pred = _in_set_pred(c, vals)
            pruned = pruned.where(
                pred if pred is not None else F.col(c).isin(list(vals))
            )
    out = pruned.join(
        F.broadcast(keys_cast.drop(SALT_COL) if n_salt else keys_cast),
        on=key_cols,
        how="left_semi",
    )
    if n_salt:
        out = _merge_salt_partials(out, meta)
    return out


def read_touched_buckets(
    spark: SparkSession,
    target_path: str,
    keys_df: DataFrame,
    exclude_epoch: int | None = None,
) -> DataFrame:
    """Read ONLY the bucket directories that ``keys_df``'s rows hash into
    — the DISTRIBUTED sibling of lookup_state_keys for batch-sized key
    sets: nothing but the bucket IDS is collected to the driver (bounded
    by n_buckets, not by |keys|), the key rows themselves never leave
    the cluster, and the returned DataFrame is the pruned stored rows
    for the caller to join/filter.

    ``keys_df`` must carry the table's bucket columns (recorded in
    ``_table_meta.json``); extra columns are ignored for routing.  This
    is what keeps an incremental pipeline's per-batch READ cost
    O(touched buckets) instead of O(total accumulated state) — e.g. the
    streaming near-dup verifier fetching candidate docs' shingle rows,
    or the LSH join fetching only the signature buckets a batch's
    (band, mh) pairs collide into.

    ``exclude_epoch`` hides files an append_batch call wrote under that
    epoch id UNLESS the epoch carries a completion marker
    (mark_epoch_complete) — the read-your-PRE-epoch-writes view a
    replayed micro-batch needs: a batch that probes a store it also
    appends to must see the same state on replay as the crashed attempt
    did, no matter which of the attempt's files landed."""
    got = _read_touched(
        spark, target_path, keys_df, list(keys_df.columns),
        exclude_epoch=exclude_epoch,
    )
    if got is None:
        return read_state_table(spark, target_path).limit(0)
    return got[0]


def _read_touched(
    spark: SparkSession,
    target_path: str,
    keys_df: DataFrame,
    key_cols: list[str],
    exclude_epoch: int | None = None,
) -> tuple[DataFrame, DataFrame] | None:
    """Shared pruned-read body: route ``keys_df`` to its buckets via the
    table's recorded bucket_cols, refuse crashed buckets, and return
    (pruned stored rows without kb, type-cast keys_df) — or None when no
    routed bucket exists on disk."""
    import glob as g

    if not os.path.isdir(target_path):
        parent, base = os.path.split(os.path.abspath(target_path))
        if g.glob(os.path.join(parent, f"._old-{base}-*")):
            # a whole-table swap (rebucket/compaction) crashed between its
            # two renames: the complete table sits in the aside dir.  The
            # meta check below would misdiagnose this as "not a bucketed
            # table"; refuse with the same repair pointer the per-bucket
            # aside refusal uses (readers don't repair — single-writer)
            raise RuntimeError(
                f"{target_path} has a crashed swap (aside dir present); run "
                "recover_state_table or the next merge before reading"
            )
    meta = _read_meta(target_path)
    if meta is None:
        raise ValueError(
            f"{target_path} has no _table_meta.json; bucket-pruned reads "
            "require a bucketed table (use read_state_table + filter)"
        )
    n_buckets = meta["n_buckets"]
    bcols = meta.get("bucket_cols") or key_cols
    missing = [c for c in bcols if c not in keys_df.columns]
    if missing:
        raise ValueError(
            f"keys are missing the table's bucket columns {missing} "
            f"(bucket_cols={bcols}); routing needs every bucket column"
        )
    # Murmur3 hashes int and long (etc.) DIFFERENTLY, so the lookup keys
    # must carry the table's exact key types or they route to the wrong
    # bucket: cast to the stored schema — from the sidecar when present
    # (zero Spark jobs), else one bucket's footer
    stored_schema = _sidecar_schema(target_path, with_kb=True)
    if stored_schema is not None:
        stored_types = {f.name: f.dataType for f in stored_schema.fields}
    else:
        any_bucket = next(
            (d for d in sorted(os.listdir(target_path)) if d.startswith("kb=")),
            None,
        )
        stored_types = (
            {
                f.name: f.dataType
                for f in spark.read.parquet(
                    os.path.join(target_path, any_bucket)
                ).schema
            }
            if any_bucket is not None
            else {}
        )
    if stored_types:
        keys_df = keys_df.select(
            *[
                F.col(c).cast(stored_types[c]).alias(c) if c in stored_types else F.col(c)
                for c in keys_df.columns
            ]
        )
    want = _with_kb(keys_df, bcols, n_buckets)
    # driver-held key sets (LocalRelation) route without a Spark job
    buckets = _distinct_kbs(want)
    for b in buckets:
        bdir = os.path.join(target_path, f"kb={b}")
        if not os.path.exists(bdir) and g.glob(
            os.path.join(target_path, f"._old-kb={b}-*")
        ):
            # a crashed swap left this bucket's data in its aside dir;
            # silently treating its keys as absent would be a WRONG
            # answer — readers don't repair (single-writer protocol), so
            # refuse until the writer's next merge (or
            # recover_state_table) runs
            raise RuntimeError(
                f"{bdir} has a crashed swap (aside dir present); run "
                "recover_state_table or the next merge before reading"
            )
    drop_pfx: tuple[str, ...] | None = None
    if exclude_epoch is not None and not epoch_is_complete(
        target_path, exclude_epoch
    ):
        # an UNCOMMITTED epoch's files are a crashed attempt's partial
        # writes: hide them so a replay probes the deterministic
        # pre-epoch state (a marked-complete epoch is included — that
        # replay's batch was fully applied and must read as seen)
        drop_pfx = (f"ep-{exclude_epoch}.", f"ep-{exclude_epoch}-")
    files = [
        os.path.join(d, f)
        for d in (os.path.join(target_path, f"kb={b}") for b in buckets)
        if os.path.exists(d)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
        and not f.startswith((".", "_"))
        and not (drop_pfx is not None and f.startswith(drop_pfx))
    ]
    if not files:
        return None
    # snapshot read (see _list_data_files): the touched buckets' current
    # files pin the plan identity
    reader = spark.read.option("basePath", target_path)
    if stored_schema is not None:
        reader = reader.schema(stored_schema)
    stored = reader.parquet(*files)
    return stored.drop("kb"), keys_df


def upsert_batch(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    order_col: str | list[str],
    n_buckets: int | None = None,
    bucket_cols: list[str] | None = None,
) -> None:
    """MERGE-emulation: newest row per key wins (by ``order_col`` — a
    single column or an ordered list forming a composite order key; ties
    beyond it are broken by the remaining value columns so replays are
    deterministic — two updates for a key sharing an order value always
    resolve the same way, preserving the exactly-once-observable
    property).

    The order key must be strictly monotone per key across upserts for
    newest-wins to mean arrival-order-newest: a non-decreasing-but-tying
    column (e.g. an event timestamp with duplicate ts) needs a
    monotone tie-breaker appended (e.g. ``["latest_ts", "latest_seq"]``)
    or the value-column tie-break can resurrect a stale value.

    Swap protocol: write to tmp, rename target aside, rename tmp into
    place, delete the old copy — readers see either the old or the new
    complete table, never partial data, and the target-missing window is
    two rename syscalls (not a full recursive delete).  A transactional
    table format (Delta/Iceberg MERGE INTO) replaces this body with a
    genuinely atomic commit; the foreachBatch wiring is identical.

    ``n_buckets`` switches the table to a HASH-BUCKETED layout
    (``kb=N`` partition directories on ``hash(key_cols) % n_buckets``):
    the merge then reads, rewrites, and swaps ONLY the buckets the batch
    touches, so per-micro-batch cost is O(|batch| + touched-bucket rows),
    not O(total accumulated state) — the shape that keeps incremental
    state maintenance viable when the accumulated table is 1000× any
    batch.  Each bucket swap is itself atomic; upsert is idempotent, so a
    crash between bucket swaps is repaired by replaying the batch.  The
    layout is fixed at table creation: pass the same n_buckets for the
    table's lifetime (a flat table is refused).

    ``bucket_cols`` (default: the full key) narrows the kb hash to a
    SUBSET of the key columns so bucket routing matches a read-side
    access path — e.g. an LSH signature store keyed
    ``(band, mh, doc_id)`` but bucketed on ``(band, mh)``, letting
    read_touched_buckets prune a join on the (band, mh) collision key to
    the colliding buckets.  Recorded in the table meta and enforced for
    the table's lifetime like n_buckets."""
    if n_buckets is not None:
        # table-level recovery first: a whole-table swap (rebucket,
        # compaction) crashed between its two renames leaves the target
        # missing with the complete table in the aside dir — without this
        # the meta check would create a fresh EMPTY table and strand the
        # entire pre-crash state
        _recover(target_path)
        _assert_bucketed_layout(target_path)
        _check_bucket_meta(
            spark, target_path, n_buckets, key_cols, bucket_cols,
            columns=[c for c in updates.columns if c != DELETED_COL],
        )
        upd = _with_kb(updates, _resolve_bucket_cols(key_cols, bucket_cols), n_buckets)
        # the touched probe and the merge write would otherwise each
        # evaluate the batch chain (guide §1.2: don't compute things
        # twice): a lazy checkpoint makes the probe's full scan double
        # as the materialization and the write read blocks.  Skipped
        # when the chain already bottoms out in collected/checkpointed
        # data — there the second evaluation IS a block read.
        ckpt = not _cheap_to_reevaluate(upd)
        if ckpt:
            upd = upd.localCheckpoint(eager=False)
        try:
            touched = _distinct_kbs(upd)
            if not touched:
                # an all-empty stream still yields a READABLE (typed
                # empty) table: record the schema so read_state_table
                # has a fallback
                _write_schema_sidecar(
                    target_path, upd.drop("kb").schema.json()
                )
                return
            _merge_buckets(
                spark, target_path, upd, key_cols, order_col, touched
            )
        finally:
            if ckpt:
                from streamsum_spark.util import unpersist_checkpoint

                unpersist_checkpoint(upd)
        return
    _recover(target_path)
    if os.path.exists(target_path):
        fschema = _sidecar_schema(target_path)
        freader = (
            spark.read.schema(fschema) if fschema is not None else spark.read
        )
        ffiles = _list_data_files(target_path)
        existing = (
            freader.parquet(*ffiles) if ffiles else freader.parquet(target_path)
        )
        _check_state_columns(existing.columns, updates.columns, target_path)
        existing, has_del = _align_tombstones(existing, updates)
        merged = existing.unionByName(updates)
    else:
        merged, has_del = updates, DELETED_COL in updates.columns
    deduped = _drop_deleted(_newest_wins(merged, key_cols, order_col), has_del)
    tmp = target_path + f".tmp-{uuid.uuid4().hex[:8]}"
    deduped.write.mode("overwrite").parquet(tmp)
    _atomic_swap(target_path, tmp)
    _write_schema_sidecar(target_path, deduped.schema.json())


def append_batch(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    epoch_id: int,
    n_buckets: int,
    bucket_cols: list[str] | None = None,
) -> None:
    """Append-only bucketed write for ADD-ONLY keyed relations — the
    write path for state whose keys are written at most once for the
    table's lifetime (an LSH signature store, a shingle store, a
    verified-pair store under the immutable-document ingest model).

    upsert_batch pays O(touched-bucket ROWS) per merge: it reads every
    touched bucket, re-reduces, and rewrites it — right for mutable
    keys, pure write amplification for add-only ones (a batch that
    touches every bucket rewrites the entire accumulated store).  This
    path writes each bucket's NEW rows as one additional file named by
    the epoch (``ep-{epoch}.parquet``) and never reads or rewrites
    existing data: per-batch cost is O(|batch|) regardless of how much
    state has accumulated.  The read side is unchanged —
    read_state_table / read_touched_buckets / lookup_state_keys list
    every data file in a bucket, so multi-file buckets serve
    identically (and file lists are pinned into plans, so appends
    invalidate stale cached plans by construction).

    Exactly-once: the epoch-named file makes a replayed micro-batch
    (same epoch, deterministically identical rows under the file-source
    checkpoint contract) OVERWRITE its own files via atomic
    ``os.replace`` instead of duplicating rows.  The caller owns the
    add-only contract: appending an existing key creates a duplicate
    row (this function cannot see stored keys by design); use
    upsert_batch for keys that can be re-written.

    Layout, meta, and schema sidecar match upsert_batch's bucketed
    form, so the two paths interoperate on one table (e.g. periodic
    compaction via compact_parquet or a corrective upsert)."""
    _recover(target_path)
    _assert_bucketed_layout(target_path)
    if os.path.isdir(target_path):
        _recover_buckets(target_path)
    _check_bucket_meta(
        spark, target_path, n_buckets, key_cols, bucket_cols,
        columns=list(updates.columns),
    )
    upd = _with_kb(updates, _resolve_bucket_cols(key_cols, bucket_cols), n_buckets)
    tmp = target_path + f".tmp-{uuid.uuid4().hex[:8]}"
    # one job: route to buckets and write one file per touched bucket,
    # key-sorted so parquet min/max stats serve point lookups like the
    # merged files do
    (
        upd.repartition("kb")
        .sortWithinPartitions("kb", *key_cols)
        .write.mode("overwrite")
        .partitionBy("kb")
        .parquet(tmp)
    )
    _write_schema_sidecar(target_path, upd.schema.json())
    import glob as g

    for srcdir in sorted(g.glob(os.path.join(tmp, "kb=*"))):
        bucket = os.path.basename(srcdir)
        bdir = os.path.join(target_path, bucket)
        os.makedirs(bdir, exist_ok=True)
        parts = sorted(
            f for f in os.listdir(srcdir)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        for i, f in enumerate(parts):
            suffix = f"-{i}" if i else ""
            os.replace(
                os.path.join(srcdir, f),
                os.path.join(bdir, f"ep-{epoch_id}{suffix}.parquet"),
            )
    shutil.rmtree(tmp, ignore_errors=True)


def mark_epoch_complete(target_path: str, epoch_id: int) -> None:
    """Commit marker for a MULTI-STORE append transaction: a caller
    appending one micro-batch to several stores writes this marker on
    its probe store after the LAST append, making "did this epoch fully
    apply" a single atomic fact.  read_touched_buckets(exclude_epoch=N)
    hides ep-N files while the marker is absent — so a replayed batch
    (crash at ANY point, including mid-append) probes the deterministic
    pre-epoch state and recomputes/overwrites identically, while a
    redelivered-but-completed epoch (fresh checkpoint over the same
    files) reads its own writes and no-ops.  Idempotent."""
    os.makedirs(target_path, exist_ok=True)
    tmp = os.path.join(target_path, f"._ep-{epoch_id}.done.tmp-{os.getpid()}")
    with open(tmp, "w") as fh:
        fh.write("")
    os.replace(tmp, os.path.join(target_path, f"_ep-{epoch_id}.done"))


def epoch_is_complete(target_path: str, epoch_id: int) -> bool:
    return os.path.exists(os.path.join(target_path, f"_ep-{epoch_id}.done"))


def _newest_wins(
    merged: DataFrame, key_cols: list[str], order_col: str | list[str]
) -> DataFrame:
    """One row per key: max_by on the order key, remaining value columns
    as deterministic tie-breakers (see upsert_batch docstring)."""
    group_cols = list(key_cols) + (["kb"] if "kb" in merged.columns else [])
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    value_cols = [c for c in merged.columns if c not in group_cols]
    if not value_cols:
        # every column is a key (e.g. an index relation like the LSH
        # signature store keyed (band, mh, doc_id)): a row IS its key,
        # so newest-wins degenerates to distinct
        return merged.dropDuplicates(group_cols)
    tie_break = order_cols + [c for c in value_cols if c not in order_cols]
    return merged.groupBy(*group_cols).agg(
        F.expr(
            f"max_by(struct({', '.join(value_cols)}), struct({', '.join(tie_break)}))"
        ).alias("_v")
    ).select(*group_cols, "_v.*")


def _merge_buckets(
    spark: SparkSession,
    target_path: str,
    upd: DataFrame,
    key_cols: list[str],
    order_col: str | list[str],
    touched: list[int],
    manifests: dict[int, list] | None = None,
    agg=None,
) -> None:
    """Shared bucketed-merge body: union the batch slice with ONLY the
    touched buckets' stored rows, reduce per key, write partitioned by
    kb, and swap each touched bucket directory atomically.  ``agg``
    overrides the per-key reduction (newest-wins by default);
    ``manifests`` (bucket -> applied-marker list) is written into each
    bucket so it commits atomically WITH that bucket's data."""
    import json

    if os.path.isdir(target_path):
        _recover_buckets(target_path)
        # schema guard against the TABLE, not just the touched buckets —
        # a batch routed to a brand-new bucket must not smuggle a drifted
        # schema into the layout.  The column list rides in the table
        # meta (zero Spark jobs); legacy tables without it fall back to
        # one footer read
        meta_now = _read_meta(target_path)
        tbl_cols = (meta_now or {}).get("columns")
        if tbl_cols is None:
            any_b = next(
                (d for d in sorted(os.listdir(target_path)) if d.startswith("kb=")),
                None,
            )
            if any_b is not None:
                tbl_cols = spark.read.parquet(
                    os.path.join(target_path, any_b)
                ).columns
        if tbl_cols is not None:
            _check_state_columns(tbl_cols, upd.columns, target_path)
    existing_files = [
        os.path.join(d, f)
        for d in (os.path.join(target_path, f"kb={b}") for b in touched)
        if os.path.exists(d)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    if existing_files:
        # snapshot read (see _list_data_files)
        reader = spark.read.option("basePath", target_path)
        sschema = _sidecar_schema(target_path, with_kb=True)
        if sschema is not None:
            reader = reader.schema(sschema)
        existing = reader.parquet(*existing_files)
        existing, has_del = _align_tombstones(existing, upd)
        merged = existing.unionByName(upd)
    else:
        merged, has_del = upd, DELETED_COL in upd.columns
    reduced = agg(merged) if agg is not None else _drop_deleted(
        _newest_wins(merged, key_cols, order_col), has_del
    )
    tmp = target_path + f".tmp-{uuid.uuid4().hex[:8]}"
    # one writer task per bucket, rows sorted by key: each rewritten
    # bucket is ONE key-sorted file, so (a) file count stays bounded at
    # one per bucket instead of one per shuffle partition per bucket,
    # and (b) parquet min/max stats on the key columns let point lookups
    # skip row groups inside a bucket (lookup_state_keys pushes key
    # IN-filters into the scan) — the file-level pruning a transactional
    # table format would provide, emulated with layout
    (
        reduced.repartition("kb")
        .sortWithinPartitions("kb", *key_cols)
        .write.mode("overwrite")
        .partitionBy("kb")
        .parquet(tmp)
    )
    os.makedirs(target_path, exist_ok=True)
    _write_schema_sidecar(target_path, reduced.schema.json())
    for b in touched:
        src = os.path.join(tmp, f"kb={b}")
        if not os.path.exists(src):
            os.makedirs(src)  # bucket emptied: swap in an empty directory
        if manifests is not None:
            with open(os.path.join(src, "_applied_epochs.json"), "w") as fh:
                json.dump(manifests[b], fh)
        _atomic_swap(os.path.join(target_path, f"kb={b}"), src)
    shutil.rmtree(tmp, ignore_errors=True)


def _atomic_swap(target_path: str, tmp: str) -> None:
    """Rename-aside swap: readers see either the old or the new complete
    table, never partial data; the target-missing window is two rename
    syscalls.  The aside dir is DOT-prefixed so a crash can never leave a
    directory that Spark's listing would misread (bucket dirs live inside
    a partitioned table, where a stray ``kb=3.old-x`` would corrupt
    partition discovery); ``_recover`` repairs any crash point before the
    next merge."""
    parent, base = os.path.split(os.path.abspath(target_path))
    old = os.path.join(parent, f"._old-{base}-{uuid.uuid4().hex[:8]}")
    had_old = os.path.exists(target_path)
    if had_old:
        os.rename(target_path, old)
    os.rename(tmp, target_path)
    if had_old:
        shutil.rmtree(old)


def _recover(target_path: str) -> None:
    """Repair a crashed swap before the next merge (single-writer
    protocol, as foreachBatch guarantees): a crash between the two
    renames leaves the target missing and its old-aside complete —
    restore it, so a replayed micro-batch merges against the pre-crash
    state instead of mistaking its updates for the whole table.  A crash
    after the second rename leaves a stale aside next to the already-new
    target — delete it.  Stale tmps (crash before any rename) are
    discarded; the batch that produced them replays."""
    import glob as g

    parent, base = os.path.split(os.path.abspath(target_path))
    olds = sorted(g.glob(os.path.join(parent, f"._old-{base}-*")))
    if olds and not os.path.exists(target_path):
        os.rename(olds[0], target_path)
        olds = olds[1:]
    for stale in olds:
        shutil.rmtree(stale, ignore_errors=True)
    for tmp in g.glob(target_path + ".tmp-*"):
        shutil.rmtree(tmp, ignore_errors=True)


def _recover_buckets(target_path: str) -> None:
    """Per-bucket swap recovery for bucketed tables: restore any bucket
    directory whose swap crashed between renames, drop stale asides."""
    import glob as g

    for old in g.glob(os.path.join(target_path, "._old-kb=*")):
        bdir = os.path.join(
            target_path, os.path.basename(old)[len("._old-") :].rsplit("-", 1)[0]
        )
        if os.path.exists(bdir):
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(old, bdir)
    for tmp in g.glob(target_path + ".tmp-*"):
        shutil.rmtree(tmp, ignore_errors=True)


def recover_state_table(target_path: str) -> None:
    """Public crash repair for a keyed state table (flat or bucketed):
    restore any swap that crashed between its two renames and drop stale
    asides/tmps.  The merge entry points run this automatically; it is
    exposed for readers that hit the crashed-swap refusal (single-writer
    protocol — call only when no writer is running)."""
    _recover(target_path)
    if os.path.isdir(target_path):
        _recover_buckets(target_path)


def rebucket_state_table(
    spark: SparkSession,
    target_path: str,
    key_cols: list[str],
    new_n_buckets: int,
) -> None:
    """Change a bucketed state table's bucket count in one atomic rewrite
    — the scale-up path when a table outgrows its creation-time
    n_buckets (per-bucket rows grow with total state, so a long-lived
    table eventually wants more buckets; merges with the old count are
    refused by the meta check, and this is the sanctioned rewrite the
    refusal points at).

    ``key_cols`` must be the columns the table's merges hash — verified,
    not trusted: the old kb is recomputed from them and compared to the
    stored kb for every row before anything is written, so a wrong key
    set fails loudly instead of baking wrong routing into the new table.

    Requires a QUIESCED table (single-writer, no in-flight epoch — stop
    the stream, rebucket, restart): every bucket's replay manifest is
    unioned into every new bucket, which preserves replay-idempotence
    exactly when each recorded epoch had committed in full.  That
    precondition is ENFORCED as far as it is detectable: any crash litter
    (a whole-table aside, per-bucket asides, or stale tmp dirs) means a
    merge or swap was interrupted — some touched buckets may carry an
    epoch marker the others never received, and unioning manifests now
    would permanently mark that epoch applied everywhere, silently
    dropping the uncommitted buckets' deltas.  Rebucket therefore REFUSES
    on litter instead of repairing it: after any crash, restart the
    stream first (the replayed epoch folds into the uncommitted buckets
    and clears the litter), or run recover_state_table for a crashed
    whole-table swap; only then rebucket.  The whole table swaps
    atomically, so a crash mid-rebucket leaves the old table intact and
    recoverable."""
    import glob as g
    import json

    parent, base = os.path.split(os.path.abspath(target_path))
    litter = (
        g.glob(os.path.join(parent, f"._old-{base}-*"))
        + g.glob(target_path + ".tmp-*")
        + (
            g.glob(os.path.join(target_path, "._old-kb=*"))
            if os.path.isdir(target_path)
            else []
        )
    )
    if litter:
        raise RuntimeError(
            f"{target_path} has crash litter ({os.path.basename(litter[0])}, "
            f"{len(litter)} item(s)): an interrupted merge or swap may have "
            "committed an epoch in some buckets only, and rebucketing now "
            "would mark it applied everywhere (silent partial loss).  "
            "Restart the stream so the replay folds in (or run "
            "recover_state_table for a crashed whole-table swap), then "
            "rebucket."
        )
    _assert_bucketed_layout(target_path)
    stored_meta = _read_meta(target_path)
    if stored_meta is None:
        raise ValueError(f"{target_path} has no _table_meta.json (not a bucketed table)")
    old_n_buckets = stored_meta["n_buckets"]
    # route on the table's recorded bucket columns (a key subset); the
    # caller's key_cols is the legacy fallback for pre-bucket_cols metas
    bcols = stored_meta.get("bucket_cols") or list(key_cols)
    if not set(bcols) <= set(key_cols):
        raise ValueError(
            f"wrong key_cols {key_cols} for {target_path}: the table's "
            f"recorded bucket columns are {bcols}"
        )
    stored = spark.read.parquet(target_path)  # includes the kb column
    recomputed = F.pmod(F.hash(*bcols), F.lit(old_n_buckets)).cast("int")
    n_bad = stored.where(F.col("kb") != recomputed).count()
    if n_bad:
        raise ValueError(
            f"{n_bad} rows' stored kb disagree with hash({bcols}) % "
            f"{old_n_buckets}; wrong key_cols for {target_path}"
        )
    markers: list = []
    for d in sorted(os.listdir(target_path)):
        mpath = os.path.join(target_path, d, "_applied_epochs.json")
        if d.startswith("kb=") and os.path.exists(mpath):
            with open(mpath) as fh:
                markers += [m for m in json.load(fh) if m not in markers]
    markers = markers[-_MANIFEST_CAP:]
    rekeyed = _with_kb(stored.drop("kb"), bcols, new_n_buckets)
    tmp = target_path + f".tmp-{uuid.uuid4().hex[:8]}"
    rekeyed.write.mode("overwrite").partitionBy("kb").parquet(tmp)
    with open(os.path.join(tmp, "_table_meta.json"), "w") as fh:
        json.dump({"n_buckets": new_n_buckets, "bucket_cols": bcols}, fh)
    if markers:
        for d in os.listdir(tmp):
            if d.startswith("kb="):
                with open(os.path.join(tmp, d, "_applied_epochs.json"), "w") as fh:
                    json.dump(markers, fh)
    _atomic_swap(target_path, tmp)


def compact_parquet(
    spark: SparkSession,
    target_path: str,
    max_records_per_file: int = 1_000_000,
    partition_cols: list[str] | None = None,
) -> None:
    """Small-file compaction for a parquet table: rewrite with bounded
    records per file and swap atomically.

    Incremental pipelines (the foreachBatch MERGE sink, per-micro-batch
    appends, the IVF layout writer) accrete files over time; scan cost at
    100 TB is dominated by file/footer count long before byte count.
    ``maxRecordsPerFile`` bounds file sizes from above while the
    pre-write repartition bounds the file COUNT from below (without it,
    every input split re-emits its own file and compaction is a no-op).
    Partitioned layouts keep their partitioning: pass ``partition_cols``
    and each partition directory is compacted in the same pass.

    Bucketed STATE tables (kb= layout from upsert_batch/accumulate_batch)
    must be compacted with ``partition_cols=["kb"]`` — a flat rewrite
    would destroy the bucket routing (refused rather than corrupted) —
    and their sidecars ride along: per-bucket ``_applied_epochs.json``
    replay manifests and the root ``_table_meta.json`` are copied into
    the compacted table before the swap, so replay-idempotence and the
    bucket-count check survive compaction."""
    _recover(target_path)  # a crashed swap must be repaired before the
    # compaction read, or incomplete state gets baked into the rewrite
    is_bucketed = os.path.isdir(target_path) and any(
        d.startswith("kb=") for d in os.listdir(target_path)
    )
    if is_bucketed:
        _recover_buckets(target_path)
    if is_bucketed and (not partition_cols or "kb" not in partition_cols):
        raise ValueError(
            f"{target_path} is a bucketed state table; compact with "
            'partition_cols=["kb"] to keep the bucket layout'
        )
    df = spark.read.parquet(target_path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // max_records_per_file))
    tmp = target_path + f".tmp-{uuid.uuid4().hex[:8]}"
    writer = (
        df.repartition(n_files, *partition_cols)
        if partition_cols
        else df.repartition(n_files)
    ).write.mode("overwrite").option("maxRecordsPerFile", str(max_records_per_file))
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    if is_bucketed:
        meta = os.path.join(target_path, "_table_meta.json")
        if os.path.exists(meta):
            shutil.copy(meta, os.path.join(tmp, "_table_meta.json"))
        for d in os.listdir(target_path):
            mpath = os.path.join(target_path, d, "_applied_epochs.json")
            if d.startswith("kb=") and os.path.exists(mpath):
                os.makedirs(os.path.join(tmp, d), exist_ok=True)
                shutil.copy(mpath, os.path.join(tmp, d, "_applied_epochs.json"))
    _atomic_swap(target_path, tmp)


def accumulate_batch(
    spark: SparkSession,
    target_path: str,
    deltas: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    combine: str = "sum",
    epoch_id: int | None = None,
    run_id: str | None = None,
    n_buckets: int | None = None,
    bucket_cols: list[str] | None = None,
    n_salt: int | None = None,
) -> None:
    """MERGE-emulation for ADDITIVE state: per-key counters summed with
    the stored table (vs upsert_batch's newest-wins for replacement
    state).  The additive form is what incremental index maintenance
    needs — term/gram counts are associative, so each micro-batch ships
    only its delta counts and the table stays one row per key.  On a
    transactional format this is MERGE INTO ... UPDATE SET c = t.c + s.c;
    the swap protocol is the same as upsert_batch.

    Replay safety: SUM-merge is NOT idempotent (newest-wins is), so a
    foreachBatch redelivery after a partial failure would double-count.
    ``epoch_id`` (when given) is recorded in an ``_applied_epochs.json``
    manifest INSIDE the table directory — underscore files are invisible
    to parquet readers, and the manifest swaps atomically WITH the data,
    so a replayed epoch is a no-op and a crash between merge and marker
    cannot happen (they are one rename).  This is the standard
    foreachBatch exactly-once recipe, with the transactional commit
    emulated by the directory swap.

    Spark epoch ids restart at 0 for every NEW checkpoint, so a table fed
    by more than one stream lifetime must distinguish runs: pass
    ``run_id`` (any stable per-stream-start token — stream_accumulate_counts
    generates one per .start()) and the manifest records (run_id, epoch_id)
    pairs; epoch 0 of a fresh run is then folded in, not mistaken for a
    replay of the previous run's epoch 0.

    ``n_buckets`` switches to the hash-bucketed layout (see upsert_batch):
    only touched buckets are read, re-summed, and swapped, and the replay
    manifest becomes PER-BUCKET — each bucket's marker list commits
    atomically with that bucket's data, so a crash after swapping some of
    a batch's buckets is repaired by replay: already-committed buckets
    skip (their manifest has the marker), the rest fold in exactly once.

    ``n_salt`` (opt-in, requires n_buckets) is the hot-key skew
    treatment: additive state is associative, so the key can widen with
    a salt and a celebrity key's rows land as up to n_salt PARTIAL rows
    in up to n_salt different buckets instead of concentrating one
    bucket to 50% of the table's bytes.  Salt-aware reads
    (read_state_table, lookup_state_keys) merge the partials back via
    the combine recorded in the table meta, so the logical table is
    unchanged; only the layout spreads.

    The salt MUST be deterministic per row: it routes rows to buckets
    whose per-bucket replay markers assume a redelivered batch re-routes
    identically, and the merge evaluates the deltas more than once
    (touched-bucket collect, then write) — a nondeterministic salt
    (partition id, rand) could re-route between evaluations and lose or
    double-count rows.  So the salt is xxhash64 of the row's full
    content PLUS the epoch marker: replays reproduce it exactly, while
    a hot key's per-epoch partials still spread across epochs (within
    one epoch its delta rows collapse into one partial per merge
    anyway).  Epoch-less merges of byte-identical delta rows keep one
    salt forever — pass epochs if spread matters there."""
    import json

    marker = None if epoch_id is None else f"{run_id or ''}:{epoch_id}"
    if n_salt is not None:
        if n_buckets is None:
            raise ValueError("n_salt requires the bucketed layout (n_buckets)")
        deltas = deltas.withColumn(
            SALT_COL,
            F.pmod(
                F.xxhash64(F.lit(marker or ""), *deltas.columns), F.lit(n_salt)
            ).cast("int"),
        )
        key_cols = list(key_cols) + [SALT_COL]
        if bucket_cols is not None:
            bucket_cols = list(bucket_cols) + [SALT_COL]
    # bit_or serves mergeable bitmap state (e.g. incremental Bloom-filter
    # words): like min/max it is idempotent per value, but the epoch
    # manifest still guards it for uniformity
    agg_fn = {"sum": F.sum, "min": F.min, "max": F.max, "bit_or": F.bit_or}[combine]

    if n_buckets is not None:
        _recover(target_path)  # whole-table swap crash (see upsert_batch)
        _assert_bucketed_layout(target_path)
        _check_bucket_meta(
            spark, target_path, n_buckets, key_cols, bucket_cols,
            columns=list(deltas.columns),
            extra_meta=(
                {"n_salt": n_salt, "sum_cols": list(sum_cols), "combine": combine}
                if n_salt is not None
                else None
            ),
        )
        if os.path.isdir(target_path):
            _recover_buckets(target_path)  # manifests must be read post-repair
        upd = _with_kb(deltas, _resolve_bucket_cols(key_cols, bucket_cols), n_buckets)
        # same single-evaluation trade as upsert_batch: the probe
        # materializes the lazy checkpoint, the merge reads blocks
        ckpt = not _cheap_to_reevaluate(upd)
        if ckpt:
            upd = upd.localCheckpoint(eager=False)
        touched = _distinct_kbs(upd)
        manifests: dict[int, list] = {}
        todo = []
        for b in touched:
            mpath = os.path.join(target_path, f"kb={b}", "_applied_epochs.json")
            applied_b: list = []
            if os.path.exists(mpath):
                with open(mpath) as fh:
                    applied_b = json.load(fh)
            if marker is not None and marker in applied_b:
                continue  # this bucket already committed this micro-batch
            todo.append(b)
            # an epoch-less merge still carries the bucket's existing
            # manifest into the rewrite — dropping it would let a later
            # redelivery of an already-committed epoch double-count
            manifests[b] = (applied_b + ([marker] if marker is not None else []))[
                -_MANIFEST_CAP:
            ]
        upd_ck = upd if ckpt else None
        try:
            if not todo:
                return
            upd = upd.where(F.col("kb").isin([int(b) for b in todo]))

            def _sum_agg(merged: DataFrame) -> DataFrame:
                return merged.groupBy("kb", *key_cols).agg(
                    *[agg_fn(c).cast("long").alias(c) for c in sum_cols]
                )

            _merge_buckets(
                spark, target_path, upd, key_cols, order_col=None,
                touched=todo, manifests=manifests, agg=_sum_agg,
            )
        finally:
            if upd_ck is not None:
                from streamsum_spark.util import unpersist_checkpoint

                unpersist_checkpoint(upd_ck)
        return

    _recover(target_path)
    manifest = os.path.join(target_path, "_applied_epochs.json")
    applied: list = []
    if os.path.exists(manifest):
        with open(manifest) as fh:
            applied = json.load(fh)
        if marker is not None and marker in applied:
            return  # replayed micro-batch of the SAME run: already folded in
    if marker is None and applied:
        # epoch-less merge on a manifest-bearing table: carry the history
        # into the rewrite so a later epoch redelivery still no-ops
        marker_keep_only = True
    else:
        marker_keep_only = False
    if os.path.exists(target_path):
        existing = spark.read.parquet(target_path)
        _check_state_columns(existing.columns, deltas.columns, target_path)
        merged = existing.unionByName(deltas)
    else:
        merged = deltas
    acc = merged.groupBy(*key_cols).agg(
        *[agg_fn(c).cast("long").alias(c) for c in sum_cols]
    )
    tmp = target_path + f".tmp-{uuid.uuid4().hex[:8]}"
    acc.write.mode("overwrite").parquet(tmp)
    if marker is not None or marker_keep_only:
        with open(os.path.join(tmp, "_applied_epochs.json"), "w") as fh:
            new_applied = applied + ([marker] if marker is not None else [])
            json.dump(new_applied[-_MANIFEST_CAP:], fh)
    _atomic_swap(target_path, tmp)


def stream_accumulate_counts(
    df: DataFrame,
    target_path: str,
    key_cols: list[str],
    sum_cols: list[str],
    pre_agg,
    combine: str = "sum",
    n_buckets: int | None = 16,
    bucket_cols: list[str] | None = None,
) -> None:
    """Run an append-mode availableNow stream into an ADDITIVE cache table:
    ``pre_agg`` (static DataFrame -> per-key delta counts) runs inside
    foreachBatch on each micro-batch, and the deltas sum-merge into the
    stored table (hash-bucketed by default, so each merge rewrites only
    the buckets the batch touches — read back with read_state_table).

    This is the bounded-state alternative to a streaming groupBy over an
    unbounded key space (per-(doc, term) counts would otherwise grow
    state forever): per-batch work is O(batch), cross-batch state lives
    in the keyed table, and no aggregation state store is needed at all —
    the stream itself stays stateless."""
    spark = df.sparkSession
    ckpt = os.path.join(tempfile.gettempdir(), f"streamsum_acc_ckpt_{uuid.uuid4().hex[:10]}")
    run_id = uuid.uuid4().hex  # per-stream-start token: epoch 0 of a later
    # run against the same table must not look like a replay of this one's

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        accumulate_batch(
            spark, target_path, pre_agg(batch_df), key_cols, sum_cols, combine, epoch_id,
            run_id=run_id, n_buckets=n_buckets, bucket_cols=bucket_cols,
        )

    q = (
        df.writeStream.foreachBatch(merge)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_to_cache_table(
    df: DataFrame,
    target_path: str,
    key_cols: list[str],
    order_col: str | list[str],
    n_buckets: int | None = 16,
    bucket_cols: list[str] | None = None,
) -> None:
    """Run an availableNow update-mode stream into a keyed parquet cache
    table via foreachBatch upsert (hash-bucketed by default, so each
    micro-batch rewrites only touched buckets — read back with
    read_state_table)."""
    spark = df.sparkSession
    ckpt = os.path.join(tempfile.gettempdir(), f"streamsum_sink_ckpt_{uuid.uuid4().hex[:10]}")

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        upsert_batch(
            spark, target_path, batch_df, key_cols, order_col,
            n_buckets=n_buckets, bucket_cols=bucket_cols,
        )

    q = (
        df.writeStream.foreachBatch(merge)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
