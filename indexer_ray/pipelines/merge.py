"""LSM-style index merge / compaction — closes the incremental lifecycle.

After `incremental.build_delta_index` the corpus is covered by TWO indexes
(base + delta), and a re-indexed url exists in BOTH: the delta has its
fresh postings, the base still has its stale ones.  `merge_indexes`
compacts the pair into ONE fresh index with newest-url-wins semantics:

    merged corpus = (base docs whose url is NOT in the delta docmap)
                    union (all delta docs)

The merge works at the POSTINGS level — documents are never re-extracted
or re-tokenized.  At web scale tokenization dominates build cost, so a
merge moves only (term, doc_id, tf, dl) rows: decode both indexes' posting
blocks (stages/codec.py) as streaming Datasets, drop the superseded base
postings, re-route every posting to its output partition with the SAME
routing functions the build uses (functions/hashing.py — including
salted hot-term runs), write the partitioned raw layout, and reuse the
build's phase-2 encoder verbatim (`build.encode_partition`), inheriting
its per-partition checkpoints, `_meta.json` lineage and byte-determinism.
The manifest is written atomically LAST (state/manifest.py commit rule).

Superseded-doc handling is two-regime, like the dedup pair routing:
  * broadcast (delta docmap <= `broadcast_urls_threshold` urls): the
    superseded base doc_ids collect to a sorted numpy array, `ray.put`
    ONCE, and every postings batch drops hits with one vectorized
    searchsorted — no shuffle of the base postings at all;
  * join (larger deltas): the base postings and docmap are LEFT OUTER
    hash-joined against the delta url/doc_id sets and the matches
    dropped — everything stays distributed (a merge with a delta of
    this size is doing rebuild-scale data movement by necessity).

Doc-id space: for hash ids (blake2b(url)) and native `id_column` ids a
re-indexed url keeps the SAME id, so dropping superseded base postings
makes the union collision-free with no remapping.  Dense row-number ids
collide across independently built indexes, so delta ids shift by
(max base docmap id + 1) — gaps left by superseded docs are fine, the
block codec stores deltas.

Reference anchor: the reference mutates a single in-memory tree per run
(lib.rs:251-256 re-index on mtime; tree.rs:186-247 segment flush) and
never compacts segments; this operator is the engine's own design for the
north rule's resumable 10^12-doc lifecycle.

Deletions are out of scope (as in the reference): a url whose new
version became empty is skipped by the delta build (A2 empty-skip) and
its stale base entry survives the merge.

`merge_many` extends the rule to a generation CHAIN (L0..Lk compaction):
a url's postings come from the last generation containing it — one
streaming pass over all generations' postings in the broadcast regime, a
pairwise distributed cascade above the url threshold.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from indexer_ray.functions.hashing import (
    hot_term_partitions,
    salt_of_doc,
    term_partition,
)
from indexer_ray.pipelines.build import (
    BuildConfig,
    _auto_partitions,
    _docmap_stats,
    _encode_partition_batch,
)
from indexer_ray.stages.codec import decode_blocks
from indexer_ray.state.manifest import (
    IndexManifest,
    load_progress,
    part_complete,
    save_progress,
)


def _blocks_files(index_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(index_dir, "parts", "*", "blocks.parquet")))


def _docmap_files(index_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(index_dir, "docmap", "*.parquet")))


_EMPTY_POSTINGS = pa.table(
    {
        "term": pa.array([], type=pa.string()),
        "doc_id": pa.array([], type=pa.uint64()),
        "tf": pa.array([], type=pa.uint32()),
        "dl": pa.array([], type=pa.uint32()),
    }
)


def postings_ds(index_dir: str):
    """Streaming Dataset of decoded postings (term, doc_id, tf, dl) from an
    index's block files — the read half of the merge.  One vectorized
    decode per batch of block rows (stages/codec.decode_blocks); terms
    repeat via an Arrow take, never a Python loop per posting."""
    import ray.data as rd

    files = _blocks_files(index_dir)
    if not files:
        return rd.from_arrow(_EMPTY_POSTINGS)

    def _decode(batch: pa.Table) -> pa.Table:
        ns = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        first = (
            batch.column("first_doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        doc, tf, dl, _ = decode_blocks(batch.column("payload"), ns, first)
        idx = np.repeat(np.arange(len(ns), dtype=np.int64), ns)
        terms = batch.column("term").combine_chunks().take(pa.array(idx))
        return pa.table(
            {
                "term": terms,
                "doc_id": pa.array(doc, type=pa.uint64()),
                "tf": pa.array(tf.astype(np.uint32), type=pa.uint32()),
                "dl": pa.array(dl.astype(np.uint32), type=pa.uint32()),
            }
        )

    # ~1024 block rows/batch = up to ~128k postings per decode call
    return rd.read_parquet(
        files, columns=["term", "n", "first_doc_id", "payload"]
    ).map_batches(_decode, batch_format="pyarrow", zero_copy_batch=True, batch_size=1024)


def _docmap_rows(docmap_dir_files: list[str]) -> int:
    """Total docmap rows from parquet METADATA only (no data read)."""
    return sum(pq.ParquetFile(f).metadata.num_rows for f in docmap_dir_files)


def _max_docmap_id(index_dir: str) -> int:
    """Max doc_id across an index's docmap fragments, from parquet
    row-group statistics (metadata-only)."""
    mx = 0
    for f in _docmap_files(index_dir):
        md = pq.ParquetFile(f)
        ci = md.schema_arrow.get_field_index("doc_id")
        for rg in range(md.metadata.num_row_groups):
            st = md.metadata.row_group(rg).column(ci).statistics
            if st is not None and st.max is not None:
                mx = max(mx, int(st.max))
    return mx


def _route_batch(
    batch: pa.Table, hot_salts: dict[str, int], n_partitions: int, id_space
) -> pa.Table:
    """Assign each posting row its output partition — the same routing rule
    as the build's tokenize stage (stages/tokenize.py `_part_of` + salt
    runs), applied to already-tokenized rows.  Vectorized per distinct
    term (parquet block tables are term-dictionary-heavy)."""
    enc = batch.column("term").combine_chunks().dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    base_parts = np.fromiter(
        (term_partition(t, n_partitions) for t in uniq),
        dtype=np.int32,
        count=len(uniq),
    )
    part = base_parts[codes] if len(codes) else np.empty(0, dtype=np.int32)
    hot_here = [(ui, t) for ui, t in enumerate(uniq) if t in hot_salts]
    if hot_here:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        for ui, t in hot_here:
            s = int(hot_salts[t])
            rows = codes == ui
            hp = np.array(hot_term_partitions(t, s, n_partitions), dtype=np.int32)
            part[rows] = hp[salt_of_doc(ids[rows], s, id_space)]
    return batch.append_column("part_id", pa.array(part, type=pa.int32()))


def _jkey(t: pa.Table, col: str = "doc_id") -> pa.Table:
    """int64 two's-complement view of a uint64 id column — Dataset.join /
    groupby keys above 2^63 fall into a pickled-object path; the signed
    view is bijective and hash-join-friendly."""
    ids = t.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
    return t.append_column("jkey", pa.array(ids.view(np.int64), type=pa.int64()))


def merge_indexes(
    base_dir: str,
    delta_dir: str,
    out_dir: str,
    resume: bool = False,
    n_partitions: int | None = None,
    broadcast_urls_threshold: int = 1 << 20,
    join_partitions: int | None = None,
) -> IndexManifest:
    """Compact base + delta indexes into a fresh index at `out_dir` with
    newest-url-wins semantics.  Ray must already be initialised (driver
    contract).  Returns the merged manifest.

    Resumable like `build_index`: phase 1 (decode/filter/route/write-raw +
    docmap) is marked complete in progress.json; phase 2 reuses the
    per-partition `_meta.json` checkpoints; manifest.json commits last."""
    import ray
    import ray.data as rd

    base_m = IndexManifest.load(base_dir)
    delta_m = IndexManifest.load(delta_dir)
    for k in ("mode", "stem_tokens", "stop_filter", "source", "extract"):
        if base_m.config.get(k) != delta_m.config.get(k):
            raise ValueError(
                f"merge_indexes: tokenizer config mismatch on {k!r}: "
                f"{base_m.config.get(k)!r} vs {delta_m.config.get(k)!r} — "
                "merging indexes with different token semantics would mix "
                "incomparable postings"
            )

    if not resume and (
        os.path.exists(os.path.join(out_dir, "progress.json"))
        or os.path.exists(os.path.join(out_dir, "manifest.json"))
    ):
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    raw_root = os.path.join(out_dir, "raw")
    docmap_dir = os.path.join(out_dir, "docmap")
    progress = load_progress(out_dir) if resume else {}

    dense = bool(base_m.config.get("id_assign") == "dense") and not base_m.config.get(
        "id_column"
    )
    delta_offset = (_max_docmap_id(base_dir) + 1) if dense else 0

    # output sizing + routing tables (persisted so resumes route identically)
    if "n_partitions" in progress:
        P = int(progress["n_partitions"])
        hot_out = dict(progress["hot_terms"])
        id_space = progress["id_space"]
        delta_offset = int(progress["delta_offset"])
    else:
        total_postings = sum(
            int(m.get("n_postings", 0)) for m in base_m.partitions.values()
        ) + sum(int(m.get("n_postings", 0)) for m in delta_m.partitions.values())
        tgt = int(base_m.config.get("target_partition_postings", 4 << 20))
        P = n_partitions or _auto_partitions(total_postings, tgt)
        hot_out = dict(base_m.hot_terms)
        for t, s in delta_m.hot_terms.items():
            hot_out[t] = max(int(hot_out.get(t, 0)), int(s))
        # salt ranges split the merged id space for dense/native ids; hash
        # ids span the full 2^64 space (id_space=None)
        if dense or base_m.config.get("id_column"):
            id_space = max(
                _max_docmap_id(base_dir), delta_offset + _max_docmap_id(delta_dir)
            ) + 1
        else:
            id_space = None
        progress.update(
            {
                "n_partitions": P,
                "hot_terms": hot_out,
                "id_space": id_space,
                "delta_offset": delta_offset,
            }
        )
        save_progress(out_dir, progress)

    t0 = time.monotonic()
    if not progress.get("phase1_complete"):
        # idempotent rewrite: a crashed phase 1 leaves partial raw/docmap
        shutil.rmtree(raw_root, ignore_errors=True)
        shutil.rmtree(docmap_dir, ignore_errors=True)

        base_dm_files = _docmap_files(base_dir)
        delta_dm_files = _docmap_files(delta_dir)
        n_delta_urls = _docmap_rows(delta_dm_files)
        base_post = postings_ds(base_dir)
        base_dm = (
            rd.read_parquet(base_dm_files)
            if base_dm_files
            else rd.from_arrow(pa.table({"doc_id": pa.array([], type=pa.uint64())}))
        )

        if n_delta_urls <= broadcast_urls_threshold:
            # ---- broadcast regime: superseded ids as one sorted array ----
            delta_urls = (
                set(
                    r["url"]
                    for r in rd.read_parquet(delta_dm_files, columns=["url"]).take_all()
                )
                if delta_dm_files
                else set()
            )
            # the DELTA url set is threshold-gated (small); the filter runs
            # over the UNBOUNDED base side, so it must be a vectorized
            # pc.is_in, not a per-row Python membership loop
            urls_ref = ray.put(pa.array(sorted(delta_urls), type=pa.string()))

            def _sup_ids(t: pa.Table) -> pa.Table:
                us = ray.get(urls_ref)
                mask = pc.is_in(t.column("url"), value_set=us)
                return pa.table({"doc_id": t.column("doc_id").filter(mask)})

            sup = (
                np.sort(
                    np.array(
                        [
                            r["doc_id"]
                            for r in base_dm.map_batches(
                                _sup_ids, batch_format="pyarrow"
                            ).take_all()
                        ],
                        dtype=np.uint64,
                    )
                )
                if delta_urls
                else np.empty(0, dtype=np.uint64)
            )
            sup_ref = ray.put(sup)

            def _drop_superseded(t: pa.Table) -> pa.Table:
                s = ray.get(sup_ref)
                if not len(s) or not t.num_rows:
                    return t
                ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
                pos = np.minimum(np.searchsorted(s, ids), len(s) - 1)
                return t.filter(pa.array(~(s[pos] == ids)))

            base_post = base_post.map_batches(
                _drop_superseded, batch_format="pyarrow", zero_copy_batch=True
            )

            def _drop_superseded_dm(t: pa.Table) -> pa.Table:
                us = ray.get(urls_ref)
                return t.filter(pc.invert(pc.is_in(t.column("url"), value_set=us)))

            base_dm_keep = base_dm.map_batches(
                _drop_superseded_dm, batch_format="pyarrow"
            )
        else:
            # ---- join regime: everything stays distributed ----
            jp = join_partitions or max(
                2, int(ray.cluster_resources().get("CPU", 8)) // 2
            )
            marker = rd.read_parquet(delta_dm_files, columns=["url"]).map_batches(
                lambda t: t.append_column(
                    "m", pa.array(np.ones(t.num_rows, dtype=np.int8), type=pa.int8())
                ),
                batch_format="pyarrow",
            )
            # materialized: consumed twice (kept rows + superseded keys)
            dm_joined = base_dm.join(marker, "left_outer", jp, on=("url",)).materialize()
            base_dm_keep = dm_joined.map_batches(
                lambda t: t.filter(pa.compute.is_null(t.column("m"))).drop_columns(
                    ["m"]
                ),
                batch_format="pyarrow",
            )

            def _sup_keys(t: pa.Table) -> pa.Table:
                kept = t.filter(pa.compute.is_valid(t.column("m")))
                ids = (
                    kept.column("doc_id")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.uint64)
                )
                return pa.table(
                    {
                        "jkey": pa.array(ids.view(np.int64), type=pa.int64()),
                        "m2": pa.array(
                            np.ones(len(ids), dtype=np.int8), type=pa.int8()
                        ),
                    }
                )

            sup_keys = dm_joined.map_batches(_sup_keys, batch_format="pyarrow")
            base_post = (
                base_post.map_batches(_jkey, batch_format="pyarrow")
                .join(sup_keys, "left_outer", jp, on=("jkey",))
                .map_batches(
                    lambda t: t.filter(pa.compute.is_null(t.column("m2"))).drop_columns(
                        ["jkey", "m2"]
                    ),
                    batch_format="pyarrow",
                )
            )

        delta_post = postings_ds(delta_dir)
        delta_dm = (
            rd.read_parquet(delta_dm_files)
            if delta_dm_files
            else None
        )
        if dense and delta_offset:
            off = np.uint64(delta_offset)

            def _remap(t: pa.Table) -> pa.Table:
                ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
                return t.set_column(
                    t.schema.get_field_index("doc_id"),
                    "doc_id",
                    pa.array(ids + off, type=pa.uint64()),
                )

            delta_post = delta_post.map_batches(
                _remap, batch_format="pyarrow", zero_copy_batch=True
            )
            if delta_dm is not None:
                delta_dm = delta_dm.map_batches(_remap, batch_format="pyarrow")

        # normalize column order before union (the join regime's joins can
        # reorder columns; Dataset.union requires matching schemas)
        _POST_COLS = ["term", "doc_id", "tf", "dl"]
        base_post = base_post.map_batches(
            lambda t: t.select(_POST_COLS), batch_format="pyarrow"
        )
        delta_post = delta_post.map_batches(
            lambda t: t.select(_POST_COLS), batch_format="pyarrow"
        )
        merged = base_post.union(delta_post).map_batches(
            _route_batch,
            fn_kwargs={
                "hot_salts": hot_out,
                "n_partitions": P,
                "id_space": id_space,
            },
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        merged.write_parquet(raw_root, partition_cols=["part_id"])

        if delta_dm is None:
            dm_out = base_dm_keep
        else:
            dm_cols = pq.ParquetFile(
                (base_dm_files or delta_dm_files)[0]
            ).schema_arrow.names
            base_dm_keep = base_dm_keep.map_batches(
                lambda t: t.select(dm_cols), batch_format="pyarrow"
            )
            delta_dm = delta_dm.map_batches(
                lambda t: t.select(dm_cols), batch_format="pyarrow"
            )
            dm_out = base_dm_keep.union(delta_dm)
        dm_out.write_parquet(docmap_dir)
        os.makedirs(docmap_dir, exist_ok=True)  # 0-row write creates no dir
        progress["phase1_complete"] = True
        progress["phase1_sec"] = round(time.monotonic() - t0, 3)
        save_progress(out_dir, progress)

    return _encode_and_commit(
        out_dir, base_m.config, P, hot_out, progress, [base_dir, delta_dir]
    )


def _encode_and_commit(
    out_dir: str,
    base_config: dict,
    P: int,
    hot_out: dict[str, int],
    progress: dict,
    input_files: list[str],
) -> IndexManifest:
    """Shared merge tail: phase-2 encode (per-partition checkpoints, the
    build's encoder) + docmap stats + manifest-last commit."""
    import ray
    import ray.data as rd

    raw_root = os.path.join(out_dir, "raw")
    docmap_dir = os.path.join(out_dir, "docmap")
    t2 = time.monotonic()
    existing = {
        int(os.path.basename(d).split("=")[1])
        for d in glob.glob(os.path.join(raw_root, "part_id=*"))
    }
    all_parts = sorted(existing)
    pending = [p for p in all_parts if not part_complete(out_dir, p)]
    if pending:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        block_size = int(base_config.get("block_size", 128))
        tgt = int(base_config.get("target_partition_postings", 4 << 20))
        rd.from_items([{"part_id": p} for p in pending]).map_batches(
            _encode_partition_batch,
            fn_args=(out_dir, raw_root, block_size, tgt),
            batch_size=1,
            num_cpus=max(1, n_cpus // 8),
        ).materialize()
    progress["phase2_sec"] = round(time.monotonic() - t2, 3)
    save_progress(out_dir, progress)

    n_docs, total_dl, _ = _docmap_stats(docmap_dir)
    part_metas = {}
    for p in all_parts:
        import json

        from indexer_ray.state.manifest import part_dir

        with open(os.path.join(part_dir(out_dir, p), "_meta.json")) as f:
            part_metas[str(p)] = json.load(f)
    out_config = dict(base_config)
    out_config["n_partitions"] = P
    manifest = IndexManifest(
        n_docs=n_docs,
        total_doc_len=total_dl,
        n_partitions=P,
        hot_terms=hot_out,
        config=out_config,
        partitions=part_metas,
        input_files=input_files,
    )
    manifest.save(out_dir)
    shutil.rmtree(raw_root, ignore_errors=True)
    return manifest


def merge_many(
    index_dirs: list[str],
    out_dir: str,
    n_partitions: int | None = None,
    broadcast_urls_threshold: int = 1 << 20,
) -> IndexManifest:
    """Compact a GENERATION CHAIN of indexes (oldest first, newest last)
    into one fresh index: a url's postings come from the LAST index that
    contains it — the n-way extension of `merge_indexes`' newest-wins rule,
    i.e. L0..Lk LSM compaction.

    Two regimes, keyed on the total non-base docmap size:
      * single-pass broadcast (<= `broadcast_urls_threshold` urls across
        generations 1..k): per-generation superseded-id arrays come from
        cumulative newer-url sets built newest-to-oldest; all generations'
        surviving postings stream through ONE route + encode — the raw
        postings are read exactly once.
      * generational cascade (larger): pairwise `merge_indexes` folds,
        oldest first, each fully distributed — G-1 passes, but each pass
        is the already-scale-safe two-index merge (a multi-generation
        backlog this large is rebuild-scale data movement by necessity;
        compact more often).

    Dense row-number ids shift by cumulative per-generation id spaces;
    hash / native ids keep their shared ids (superseded copies drop)."""
    import ray
    import ray.data as rd

    if len(index_dirs) < 2:
        raise ValueError("merge_many needs at least two indexes")
    if len(index_dirs) == 2:
        return merge_indexes(
            index_dirs[0],
            index_dirs[1],
            out_dir,
            n_partitions=n_partitions,
            broadcast_urls_threshold=broadcast_urls_threshold,
        )
    manifests = [IndexManifest.load(d) for d in index_dirs]
    m0 = manifests[0]
    for d, m in zip(index_dirs[1:], manifests[1:]):
        for k in ("mode", "stem_tokens", "stop_filter", "source", "extract"):
            if m0.config.get(k) != m.config.get(k):
                raise ValueError(
                    f"merge_many: tokenizer config mismatch on {k!r} "
                    f"between {index_dirs[0]!r} and {d!r}"
                )

    non_base_urls = sum(_docmap_rows(_docmap_files(d)) for d in index_dirs[1:])
    if non_base_urls > broadcast_urls_threshold:
        # generational cascade: fold pairwise, oldest first
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir, ignore_errors=True)
        cur = index_dirs[0]
        tmp_dirs = []
        for gi, d in enumerate(index_dirs[1:]):
            last = gi == len(index_dirs) - 2
            nxt = out_dir if last else os.path.join(out_dir + "_gen", str(gi))
            m = merge_indexes(
                cur,
                d,
                nxt,
                n_partitions=n_partitions if last else None,
                broadcast_urls_threshold=broadcast_urls_threshold,
            )
            if cur not in index_dirs:
                tmp_dirs.append(cur)
            cur = nxt
        for t in tmp_dirs:
            shutil.rmtree(t, ignore_errors=True)
        shutil.rmtree(out_dir + "_gen", ignore_errors=True)
        return m

    # ---- single-pass broadcast n-way ----
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    raw_root = os.path.join(out_dir, "raw")
    docmap_dir = os.path.join(out_dir, "docmap")
    progress: dict = {}

    dense = bool(m0.config.get("id_assign") == "dense") and not m0.config.get(
        "id_column"
    )
    G = len(index_dirs)
    offsets = [0] * G
    if dense:
        for g in range(1, G):
            offsets[g] = offsets[g - 1] + _max_docmap_id(index_dirs[g - 1]) + 1

    # cumulative newer-url sets, newest to oldest: newer[g] = urls of g+1..k
    newer: list[set] = [set() for _ in range(G)]
    for g in range(G - 2, -1, -1):
        s = set(newer[g + 1])
        files = _docmap_files(index_dirs[g + 1])
        if files:
            t = pq.read_table(files, columns=["url"])
            s.update(t.column("url").to_pylist())
        newer[g] = s

    total_postings = sum(
        int(pm.get("n_postings", 0))
        for m in manifests
        for pm in m.partitions.values()
    )
    tgt = int(m0.config.get("target_partition_postings", 4 << 20))
    P = n_partitions or _auto_partitions(total_postings, tgt)
    hot_out: dict[str, int] = {}
    for m in manifests:
        for t_, s_ in m.hot_terms.items():
            hot_out[t_] = max(int(hot_out.get(t_, 0)), int(s_))
    if dense or m0.config.get("id_column"):
        id_space = max(
            offsets[g] + _max_docmap_id(index_dirs[g]) for g in range(G)
        ) + 1
    else:
        id_space = None
    progress.update(
        {"n_partitions": P, "hot_terms": hot_out, "id_space": id_space}
    )
    save_progress(out_dir, progress)

    def _gen_postings(g: int):
        """Generation g's surviving postings (superseded drop + remap)."""
        post = postings_ds(index_dirs[g])
        sup = _superseded_ids_of(index_dirs[g], newer[g])
        if len(sup):
            sup_ref = ray.put(sup)

            def _drop(t: pa.Table) -> pa.Table:
                s = ray.get(sup_ref)
                if not t.num_rows:
                    return t
                ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
                pos = np.minimum(np.searchsorted(s, ids), len(s) - 1)
                return t.filter(pa.array(~(s[pos] == ids)))

            post = post.map_batches(_drop, batch_format="pyarrow", zero_copy_batch=True)
        if dense and offsets[g]:
            off = np.uint64(offsets[g])

            def _remap(t: pa.Table) -> pa.Table:
                ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
                return t.set_column(
                    t.schema.get_field_index("doc_id"),
                    "doc_id",
                    pa.array(ids + off, type=pa.uint64()),
                )

            post = post.map_batches(_remap, batch_format="pyarrow", zero_copy_batch=True)
        return post.map_batches(
            lambda t: t.select(["term", "doc_id", "tf", "dl"]),
            batch_format="pyarrow",
        )

    def _gen_docmap(g: int):
        files = _docmap_files(index_dirs[g])
        if not files:
            return None
        dm = rd.read_parquet(files)
        if newer[g]:
            drop_ref = ray.put(pa.array(sorted(newer[g]), type=pa.string()))

            def _keep(t: pa.Table) -> pa.Table:
                us = ray.get(drop_ref)
                return t.filter(pc.invert(pc.is_in(t.column("url"), value_set=us)))

            dm = dm.map_batches(_keep, batch_format="pyarrow")
        if dense and offsets[g]:
            off = np.uint64(offsets[g])

            def _remap_dm(t: pa.Table) -> pa.Table:
                ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
                return t.set_column(
                    t.schema.get_field_index("doc_id"),
                    "doc_id",
                    pa.array(ids + off, type=pa.uint64()),
                )

            dm = dm.map_batches(_remap_dm, batch_format="pyarrow")
        dm_cols = pq.ParquetFile(files[0]).schema_arrow.names
        return dm.map_batches(lambda t: t.select(dm_cols), batch_format="pyarrow")

    merged = _gen_postings(0)
    for g in range(1, G):
        merged = merged.union(_gen_postings(g))
    merged = merged.map_batches(
        _route_batch,
        fn_kwargs={"hot_salts": hot_out, "n_partitions": P, "id_space": id_space},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    merged.write_parquet(raw_root, partition_cols=["part_id"])

    dm_out = None
    for g in range(G):
        dmg = _gen_docmap(g)
        if dmg is None:
            continue
        dm_out = dmg if dm_out is None else dm_out.union(dmg)
    if dm_out is not None:
        dm_out.write_parquet(docmap_dir)
    os.makedirs(docmap_dir, exist_ok=True)
    progress["phase1_complete"] = True
    save_progress(out_dir, progress)

    return _encode_and_commit(out_dir, m0.config, P, hot_out, progress, list(index_dirs))


def _superseded_ids_of(index_dir: str, newer_urls: set) -> np.ndarray:
    """Sorted uint64 doc_ids of an index whose url appears in a newer
    generation (driver-side scan of the docmap url/doc_id columns — the
    broadcast regime's bound: |newer_urls| <= broadcast_urls_threshold)."""
    if not newer_urls:
        return np.empty(0, dtype=np.uint64)
    vs = pa.array(sorted(newer_urls), type=pa.string())
    parts: list[np.ndarray] = []
    for f in _docmap_files(index_dir):
        t = pq.read_table(f, columns=["doc_id", "url"])
        kept = t.column("doc_id").filter(pc.is_in(t.column("url"), value_set=vs))
        parts.append(kept.to_numpy(zero_copy_only=False).astype(np.uint64))
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.sort(np.concatenate(parts))


def delete_docs(
    base_dir: str,
    urls,
    out_dir: str,
    resume: bool = False,
    n_partitions: int | None = None,
    broadcast_urls_threshold: int = 1 << 20,
    join_partitions: int | None = None,
) -> IndexManifest:
    """Tombstone deletion as compaction: produce a fresh index at
    `out_dir` equal to `base_dir` minus the documents whose url is in
    `urls` — the LSM lifecycle step merge_indexes does NOT cover
    (takedowns / GDPR erasure / opt-out lists delete docs without a
    replacement delta).  No re-tokenization: base postings stream through
    a doc-id filter and re-encode with the base's own hot-term salting,
    partitioning and checkpointed phase-2 tail.

    `urls` is a list[str] (driver-sized, always broadcast) or a Dataset
    with a `url` column (regime-gated like merge_indexes: broadcast set
    under `broadcast_urls_threshold`, distributed LEFT OUTER marker join
    above).  Deleting a url absent from the index is a no-op, like the
    reference's skip semantics.  Resumable exactly like merge/build."""
    import ray
    import ray.data as rd

    base_m = IndexManifest.load(base_dir)
    if not resume and (
        os.path.exists(os.path.join(out_dir, "progress.json"))
        or os.path.exists(os.path.join(out_dir, "manifest.json"))
    ):
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    raw_root = os.path.join(out_dir, "raw")
    docmap_dir = os.path.join(out_dir, "docmap")
    progress = load_progress(out_dir) if resume else {}

    if "n_partitions" in progress:
        P = int(progress["n_partitions"])
        hot_out = dict(progress["hot_terms"])
        id_space = progress["id_space"]
    else:
        # deletion only SHRINKS content, so the base's partition count is
        # the right default (autosizing would bounce a 4-part index to the
        # 32-part floor)
        P = n_partitions or int(base_m.n_partitions)
        hot_out = dict(base_m.hot_terms)
        dense_or_col = bool(base_m.config.get("id_assign") == "dense") or bool(
            base_m.config.get("id_column")
        )
        id_space = (_max_docmap_id(base_dir) + 1) if dense_or_col else None
        progress.update(
            {"n_partitions": P, "hot_terms": hot_out, "id_space": id_space}
        )
        save_progress(out_dir, progress)

    t0 = time.monotonic()
    if not progress.get("phase1_complete"):
        shutil.rmtree(raw_root, ignore_errors=True)
        shutil.rmtree(docmap_dir, ignore_errors=True)

        base_dm_files = _docmap_files(base_dir)
        base_post = postings_ds(base_dir)
        base_dm = (
            rd.read_parquet(base_dm_files)
            if base_dm_files
            else rd.from_arrow(pa.table({"doc_id": pa.array([], type=pa.uint64())}))
        )

        url_list = None
        if isinstance(urls, (list, tuple, set, frozenset)):
            url_list = sorted(str(u) for u in urls)
        elif hasattr(urls, "count"):  # Dataset with a url column
            if urls.count() <= broadcast_urls_threshold:
                url_list = sorted(
                    str(r["url"]) for r in urls.select_columns(["url"]).take_all()
                )
        else:
            raise TypeError(f"urls must be a list or a Dataset, got {type(urls)}")

        if url_list is not None:
            # ---- broadcast regime (same kernels as merge_indexes) ----
            urls_ref = ray.put(pa.array(url_list, type=pa.string()))

            def _del_ids(t: pa.Table) -> pa.Table:
                us = ray.get(urls_ref)
                mask = pc.is_in(t.column("url"), value_set=us)
                return pa.table({"doc_id": t.column("doc_id").filter(mask)})

            sup = (
                np.sort(
                    np.array(
                        [
                            r["doc_id"]
                            for r in base_dm.map_batches(
                                _del_ids, batch_format="pyarrow"
                            ).take_all()
                        ],
                        dtype=np.uint64,
                    )
                )
                if url_list
                else np.empty(0, dtype=np.uint64)
            )
            sup_ref = ray.put(sup)

            def _drop_deleted(t: pa.Table) -> pa.Table:
                s = ray.get(sup_ref)
                if not len(s) or not t.num_rows:
                    return t
                ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
                pos = np.minimum(np.searchsorted(s, ids), len(s) - 1)
                return t.filter(pa.array(~(s[pos] == ids)))

            base_post = base_post.map_batches(
                _drop_deleted, batch_format="pyarrow", zero_copy_batch=True
            )

            def _drop_deleted_dm(t: pa.Table) -> pa.Table:
                us = ray.get(urls_ref)
                return t.filter(pc.invert(pc.is_in(t.column("url"), value_set=us)))

            dm_out = base_dm.map_batches(_drop_deleted_dm, batch_format="pyarrow")
        else:
            # ---- join regime: the url Dataset stays distributed ----
            jp = join_partitions or max(
                2, int(ray.cluster_resources().get("CPU", 8)) // 2
            )
            marker = urls.select_columns(["url"]).map_batches(
                lambda t: t.append_column(
                    "m", pa.array(np.ones(t.num_rows, dtype=np.int8), type=pa.int8())
                ),
                batch_format="pyarrow",
            )
            dm_joined = base_dm.join(marker, "left_outer", jp, on=("url",)).materialize()
            dm_out = dm_joined.map_batches(
                lambda t: t.filter(pc.is_null(t.column("m"))).drop_columns(["m"]),
                batch_format="pyarrow",
            )

            def _del_keys(t: pa.Table) -> pa.Table:
                kept = t.filter(pc.is_valid(t.column("m")))
                ids = (
                    kept.column("doc_id")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.uint64)
                )
                return pa.table(
                    {
                        "jkey": pa.array(ids.view(np.int64), type=pa.int64()),
                        "m2": pa.array(
                            np.ones(len(ids), dtype=np.int8), type=pa.int8()
                        ),
                    }
                )

            del_keys = dm_joined.map_batches(_del_keys, batch_format="pyarrow")
            base_post = (
                base_post.map_batches(_jkey, batch_format="pyarrow")
                .join(del_keys, "left_outer", jp, on=("jkey",))
                .map_batches(
                    lambda t: t.filter(pc.is_null(t.column("m2"))).drop_columns(
                        ["jkey", "m2"]
                    ),
                    batch_format="pyarrow",
                )
            )

        _POST_COLS = ["term", "doc_id", "tf", "dl"]
        routed = base_post.map_batches(
            lambda t: t.select(_POST_COLS), batch_format="pyarrow"
        ).map_batches(
            _route_batch,
            fn_kwargs={
                "hot_salts": hot_out,
                "n_partitions": P,
                "id_space": id_space,
            },
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        routed.write_parquet(raw_root, partition_cols=["part_id"])
        if base_dm_files:
            dm_cols = pq.ParquetFile(base_dm_files[0]).schema_arrow.names
            dm_out = dm_out.map_batches(
                lambda t: t.select(dm_cols), batch_format="pyarrow"
            )
        dm_out.write_parquet(docmap_dir)
        os.makedirs(docmap_dir, exist_ok=True)  # 0-row write creates no dir
        progress["phase1_complete"] = True
        progress["phase1_sec"] = round(time.monotonic() - t0, 3)
        save_progress(out_dir, progress)

    return _encode_and_commit(out_dir, base_m.config, P, hot_out, progress, [base_dir])
