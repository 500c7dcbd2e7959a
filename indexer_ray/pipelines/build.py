"""Distributed inverted-index build (the rebuild of reference lib.rs:292-342
`index_documents` + tree.rs:186-247 `flush_segment`, re-architected for Ray
Data; SURVEY.md §3.1/§7.1 M2-M3-M5).

Two phases, both resumable (state/manifest.py):

Phase 1 — tokenize + route (narrow, streaming):
    ray.data.read_parquet(pages, columns=pruned)
      -> map_batches(TokenizeStage, batch_format="pyarrow",
        zero_copy_batch=True, actor pool)
      -> write_parquet(<index>/raw/, partition_cols=["part_id"])
    The partitioned write IS the groupby-term shuffle, materialized to
    storage: every posting lands in the partition dir owned by its term
    (hot terms: by (term, salt), see functions/hashing.py).  Compared to an
    object-store shuffle this costs one disk round-trip but buys per-batch
    idempotence, bounded memory at any corpus size, and restartability —
    the properties the north rule's checkpoint/resume demands at 10^12 docs.
    Docmap fragments are side-written by the actors with content-hash names
    (idempotent under retries).

Phase 2 — per-partition encode (embarrassingly parallel, checkpointed):
    ray.data.from_items(pending partitions)
      -> map_batches(encode_partition, stateless tasks)
    Each task reads ONLY its partition's raw files, dedups (term, doc_id)
    (retried phase-1 batches may have double-written), sorts by
    (term, doc_id) with numpy, delta+varbyte block-encodes
    (stages/codec.py), writes parts/K/{blocks,dict}.parquet and an atomic
    _meta.json completion marker carrying metrics + lineage.  A resumed
    build skips completed partitions; output bytes are a pure function of
    the raw partition content, so retries/resumes are byte-identical.

Skew: hot-head terms (stopword-grade; punctuation and markup tokens survive
the stop filter, SURVEY.md §2.8) are detected on a driver-side sample and
salted across `n_salts` doc_id-range runs, each routed to its own partition.
Runs are disjoint doc_id ranges, so the term's global posting list is the
concatenation of its runs — the merge step the reference needed per segment
disappears by construction.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import time
from collections import Counter
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from indexer_ray.conformance.extract import extract_text, extract_visible_text
from indexer_ray.conformance.lexer import tokenize, tokenize_plain
from indexer_ray.stages.codec import BLOCK_SIZE, encode_term_postings
from indexer_ray.stages.tokenize import TokenizeFileTask, TokenizeStage
from indexer_ray.state.manifest import (
    IndexManifest,
    load_progress,
    mark_part_complete,
    part_complete,
    part_dir,
    save_progress,
)


@dataclasses.dataclass
class BuildConfig:
    # None (the DEFAULT) -> auto-sized from estimated total postings so one
    # partition always fits a phase-2 encode task (see _auto_partitions;
    # floor 32).  A fixed count is an explicit opt-in — at 10^12 docs a
    # fixed 32 would put ~1/32 of ALL postings into one encode task.
    n_partitions: int | None = None
    block_size: int = BLOCK_SIZE
    mode: str = "conformance"  # or "plain"
    stem_tokens: bool = True  # tokenizer-config surface (SURVEY.md §2.7)
    stop_filter: bool = True
    source: str = "text"  # or "html"
    id_column: str | None = None  # native int doc ids (e.g. documents.doc_id)
    # "dense": doc_id = global row number (gap-compressible, ~2.5 B/posting;
    # see stages/tokenize.py:TokenizeFileTask).  "hash": blake2b-64(url)
    # (coordination-free, ~10 B/posting).  id_column overrides both.
    id_assign: str = "dense"
    # doc-sharded corpora: each shard's dense ids start at its offset so ids
    # stay globally unique across independently-built shard indexes
    id_offset: int = 0
    extract: str = "conformance"  # or "visible"
    verify_extract: bool = False
    # skew handling
    # sample_docs is a FLOOR: the effective sample grows with the corpus
    # (n_docs_estimate/250, capped at 8192) so mid-head ratios stay
    # resolvable at scale
    sample_docs: int = 400
    # cap on the DISTRIBUTED hot-term sample (engaged when the resolution
    # the scale-aware threshold demands exceeds the 8192-doc driver-sample
    # ceiling); 2^23 docs resolve df-ratios down to ~1e-6 — the
    # target_run_postings/n_docs ratio of a 2^20-budget run at 10^12 docs
    max_sample_docs: int = 1 << 23
    # UPPER clamp on the hot threshold; the effective threshold is
    # min(hot_df_ratio, target_run_postings/n_docs_estimate) — a term whose
    # expected df exceeds one run's budget gets salted no matter how small
    # its ratio (clamped below by what the sample can resolve)
    hot_df_ratio: float = 0.25
    target_run_postings: int = 1 << 20  # max postings per (term, salt) run
    max_salts: int = 64
    # phase-2 encode reads one whole partition; this bounds its size
    target_partition_postings: int = 4 << 20
    # execution
    batch_size: int = 8192  # upper clamp; builds target ~4 map tasks/cpu
    tokenize_actors: tuple[int, int] | int | None = None  # None -> autoscale
    keep_raw: bool = False
    verify_doc_ids: bool = True
    # cpus reserved per phase-2 encode task; None -> n_cpus/8 (cap ~8
    # concurrent encodes per node: measured on the sandbox VM, per-task CPU
    # time inflates 6x beyond ~8 concurrent memory-heavy numpy tasks — a
    # shared-memory-system ceiling; on a multi-node cluster each node runs
    # its own <=8 encodes, so the cap costs nothing at scale)
    encode_cpus: float | None = None

    def tokenizer_config(self, hot_terms: dict[str, int], docmap_dir: str) -> dict:
        return {
            "mode": self.mode,
            "stem_tokens": self.stem_tokens,
            "stop_filter": self.stop_filter,
            "source": self.source,
            "extract": self.extract,
            "verify_extract": self.verify_extract,
            "n_partitions": self.n_partitions,
            "hot_terms": hot_terms,
            "docmap_dir": docmap_dir,
            "id_column": self.id_column,
            "id_space": None,  # build_index fills for dense/native ids
        }


def _input_columns(cfg: BuildConfig) -> list[str]:
    cols = [cfg.id_column] if cfg.id_column else ["url", "warc_ts"]
    cols.append("html" if cfg.source == "html" else "text")
    if cfg.source == "html" and cfg.verify_extract:
        cols.append("text")
    return cols


def _tokenize_fn(cfg: BuildConfig):
    if cfg.stem_tokens and cfg.stop_filter:
        return tokenize if cfg.mode == "conformance" else tokenize_plain
    from indexer_ray.conformance.lexer import make_tokenizer
    from indexer_ray.conformance.stopwords import STOP_WORDS

    return make_tokenizer(
        cfg.mode,
        stem_tokens=cfg.stem_tokens,
        stop_words=STOP_WORDS if cfg.stop_filter else None,
    )


def _effective_sample_docs(cfg: BuildConfig, n_docs_estimate: int) -> int:
    """Corpus-scaled sample size: cfg.sample_docs is the floor; larger
    corpora sample more docs so mid-head df-ratios stay resolvable."""
    return int(np.clip(n_docs_estimate // 250, cfg.sample_docs, 8192))


def _effective_hot_threshold(cfg: BuildConfig, n_docs_estimate: int, got: int) -> float:
    """Sample-df-ratio above which a term is salted.

    A (term, salt) run must fit ~target_run_postings, so any term with
    expected df > target_run_postings — ratio > target/N — needs salting,
    however small its ratio (at 10^12 docs a df-ratio-0.1 term is 10^11
    postings, 10^5 runs).  cfg.hot_df_ratio is only an upper clamp;
    the floor is what `got` sampled docs can resolve (>=8 hits)."""
    scale_thresh = cfg.target_run_postings / max(n_docs_estimate, 1)
    min_resolvable = 8.0 / max(got, 1)
    return max(min(cfg.hot_df_ratio, scale_thresh), min_resolvable)


def _auto_partitions(est_postings: int, target_partition_postings: int) -> int:
    """Partition count sized so one partition's raw postings fit a single
    phase-2 encode task's memory, growing linearly with the corpus
    (floor 32 — the historical fixed default, now only the small end)."""
    return int(np.clip(-(-est_postings // max(target_partition_postings, 1)), 32, 65536))


def _required_sample_docs(cfg: BuildConfig, n_docs_estimate: int) -> int:
    """Sample size that RESOLVES the scale-aware hot threshold (>=8 expected
    hits for a term right at min(hot_df_ratio, target_run_postings/N)) —
    the round-2 driver sampler capped at 8192 docs, so at 10^12 docs a
    df-ratio-1e-4 term (10^8 postings, 100x one run's budget) was invisible
    and landed unsalted in one partition."""
    thresh_target = min(
        cfg.hot_df_ratio, cfg.target_run_postings / max(n_docs_estimate, 1)
    )
    return int(np.ceil(8.0 / max(thresh_target, 1e-12)))


def _sample_hot_terms_driver(
    paths: list[str], cfg: BuildConfig, n_docs_estimate: int
) -> tuple[dict[str, int], dict[str, float]]:
    """Driver-side sample of the term-frequency head (SURVEY.md §2.8).

    Reads a corpus-scaled sample spread across the input files, tokenizes
    it, and marks terms whose sample df-ratio exceeds the scale-aware hot
    threshold (`_effective_hot_threshold`).  n_salts sizes each run to
    ~target_run_postings expected postings.

    Returns (hot_terms, sample_stats) where sample_stats carries the
    sampled avg distinct-terms/doc — the input to partition autosizing.
    """
    tok = _tokenize_fn(cfg)
    extract = extract_text if cfg.extract == "conformance" else extract_visible_text
    # spread the sample across the input list — a single-file sample could
    # miss distribution drift between shards (e.g. time-ordered crawls)
    n_files = len(paths)
    sample_files = sorted({0, n_files // 3, (2 * n_files) // 3, n_files - 1})
    need = _effective_sample_docs(cfg, n_docs_estimate)
    per_file = -(-need // len(sample_files))
    text_col = "html" if cfg.source == "html" else "text"
    got = 0
    sum_unique = 0
    df: Counter = Counter()
    for fi in sample_files:
        f = pq.ParquetFile(paths[fi])
        taken = 0
        for rb in f.iter_batches(batch_size=min(per_file, 1024), columns=[text_col]):
            col = rb.column(0).to_pylist()
            for v in col:
                text = extract(v) if cfg.source == "html" else v
                if not text:
                    continue
                uniq = set(tok(text))
                df.update(uniq)
                sum_unique += len(uniq)
                got += 1
                taken += 1
                if taken >= per_file or got >= need:
                    break
            if taken >= per_file or got >= need:
                break
        if got >= need:
            break
    stats = {
        "sampled_docs": float(got),
        "avg_unique_terms": (sum_unique / got) if got else 0.0,
    }
    if got == 0:
        return {}, stats
    thresh = _effective_hot_threshold(cfg, n_docs_estimate, got)
    hot: dict[str, int] = {}
    for term, d in df.items():
        ratio = d / got
        if ratio >= thresh:
            expected = ratio * max(n_docs_estimate, got)
            n_salts = int(np.ceil(expected / cfg.target_run_postings))
            n_salts = max(2, min(cfg.max_salts, n_salts))  # >=2 so salting is real
            hot[term] = n_salts
    return hot, stats


#: sentinel "terms" carrying sample stats through the term-df groupby
#: (\x00 cannot appear in tokenizer output)
_SENT_DOCS = "\x00sampled_docs"
_SENT_UNIQ = "\x00sum_unique"


def _select_sample_row_groups(
    paths: list[str], need: int
) -> tuple[list[tuple[str, int]], int]:
    """Deterministic stride selection of (path, row_group) descriptors
    spread across the whole input, totalling >= `need` rows (metadata-only:
    nothing is read here)."""
    descs: list[tuple[str, int, int]] = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        for rg in range(md.num_row_groups):
            descs.append((p, rg, md.row_group(rg).num_rows))
    total = sum(r for _, _, r in descs)
    if total <= need:
        return [(p, rg) for p, rg, _ in descs], total
    k = max(1, int(np.ceil(need / max(total / len(descs), 1.0))))
    while True:
        idx = np.unique(
            np.linspace(0, len(descs) - 1, num=min(k, len(descs))).round().astype(int)
        )
        rows = int(sum(descs[i][2] for i in idx))
        if rows >= need or len(idx) == len(descs):
            return [(descs[i][0], descs[i][1]) for i in idx], rows
        k *= 2


class _SampleDFStage:
    """Actor body for the distributed hot-term sample: one (path, row_group)
    descriptor per batch -> partial-df rows (term, df) for that row group,
    plus sentinel rows carrying (sampled docs, sum of per-doc unique terms)
    so the downstream groupby also reduces the sample stats."""

    def __init__(self, cfg: BuildConfig):
        self.tok = _tokenize_fn(cfg)
        self.extract = (
            extract_text if cfg.extract == "conformance" else extract_visible_text
        )
        self.is_html = cfg.source == "html"
        self.text_col = "html" if self.is_html else "text"

    def __call__(self, batch: dict) -> pa.Table:
        df: Counter = Counter()
        got = 0
        sum_unique = 0
        for path, rg in zip(batch["path"], batch["row_group"]):
            t = pq.ParquetFile(str(path)).read_row_group(
                int(rg), columns=[self.text_col]
            )
            for v in t.column(0).to_pylist():
                text = self.extract(v) if self.is_html else v
                if not text:
                    continue
                uniq = set(self.tok(text))
                df.update(uniq)
                sum_unique += len(uniq)
                got += 1
        terms = list(df.keys()) + [_SENT_DOCS, _SENT_UNIQ]
        counts = list(df.values()) + [got, sum_unique]
        return pa.table(
            {
                "term": pa.array(terms, type=pa.string()),
                "df": pa.array(counts, type=pa.int64()),
            }
        )


def sample_hot_terms_distributed(
    paths: list[str], cfg: BuildConfig, n_docs_estimate: int
) -> tuple[dict[str, int], dict[str, float]]:
    """Distributed hot-term sample for corpora whose scale-aware threshold
    needs more resolution than a driver-side sample can give (VERDICT r2
    #3): stride-selected row groups stream through an actor pool emitting
    per-row-group partial df Counters, a SMALL groupby sums them (the
    shuffle moves (term, count) rows for sampled vocabulary only, never
    documents), and ONLY the terms above the threshold reach the driver.

    Same contract as the driver path: returns (hot_terms, sample_stats)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    need = min(
        max(_required_sample_docs(cfg, n_docs_estimate), cfg.sample_docs),
        cfg.max_sample_docs,
        n_docs_estimate,
    )
    chosen, _rows = _select_sample_row_groups(paths, need)
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    agg = (
        rd.from_items([{"path": p, "row_group": rg} for p, rg in chosen])
        .map_batches(
            _SampleDFStage,
            fn_constructor_args=(cfg,),
            batch_size=1,
            concurrency=(1, max(1, n_cpus - 2)),
            num_cpus=1,
        )
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .materialize()
    )
    import pyarrow.compute as pc

    sent = {
        r["term"]: int(r["df"])
        for r in agg.map_batches(
            lambda t: t.filter(
                pc.is_in(t.column("term"), value_set=pa.array([_SENT_DOCS, _SENT_UNIQ]))
            ),
            batch_format="pyarrow",
        ).take_all()
    }
    got = sent.get(_SENT_DOCS, 0)
    stats = {
        "sampled_docs": float(got),
        "avg_unique_terms": (sent.get(_SENT_UNIQ, 0) / got) if got else 0.0,
    }
    if got == 0:
        return {}, stats
    thresh = _effective_hot_threshold(cfg, n_docs_estimate, got)
    cut = int(np.ceil(thresh * got))
    hot_rows = agg.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("df"), pa.scalar(cut, type=pa.int64())),
                pc.invert(
                    pc.is_in(
                        t.column("term"),
                        value_set=pa.array([_SENT_DOCS, _SENT_UNIQ]),
                    )
                ),
            )
        ),
        batch_format="pyarrow",
    ).take_all()
    hot: dict[str, int] = {}
    for r in hot_rows:
        ratio = r["df"] / got
        expected = ratio * max(n_docs_estimate, got)
        n_salts = int(np.ceil(expected / cfg.target_run_postings))
        hot[str(r["term"])] = max(2, min(cfg.max_salts, n_salts))
    return hot, stats


def sample_hot_terms(
    paths: list[str], cfg: BuildConfig, n_docs_estimate: int
) -> tuple[dict[str, int], dict[str, float]]:
    """Hot-term detection dispatch: the driver-side sampler while the
    required resolution fits its 8192-doc ceiling (small/mid corpora — no
    Ray stages to pay for), else the distributed sampler whose size tracks
    target_run_postings / n_docs_estimate (web scale)."""
    if _required_sample_docs(cfg, n_docs_estimate) <= 8192:
        return _sample_hot_terms_driver(paths, cfg, n_docs_estimate)
    return sample_hot_terms_distributed(paths, cfg, n_docs_estimate)


_TERM_HASH_MEMO: dict[str, int] = {}


def _chunk_term_hashes(
    chunk: pa.Array, memo: dict[str, int], seen: set[str] | None = None
) -> np.ndarray:
    """uint64 hash per row of a term chunk, hashing each DISTINCT term once.

    Parquet already dictionary-encodes the term column; we read it back as
    DictionaryArray so only the (small, Zipf-headed) per-chunk vocabulary is
    hashed in Python — the per-row work is a single numpy gather.  This keeps
    phase 2 free of per-posting string handling (the previous
    dictionary_encode + object-dtype vocab sort was the dominant cost AND the
    main memory-bandwidth contender under high task concurrency)."""
    from indexer_ray.functions.hashing import hash64_str

    if isinstance(chunk, pa.DictionaryArray):
        dict_vals = chunk.dictionary.to_pylist()
        if seen is not None:
            seen.update(dict_vals)
        lut = np.empty(len(dict_vals), dtype=np.uint64)
        for i, t in enumerate(dict_vals):
            h = memo.get(t)
            if h is None:
                h = hash64_str(t)
                memo[t] = h
            lut[i] = h
        idx = chunk.indices.to_numpy(zero_copy_only=False)
        return lut[idx]
    vals = chunk.to_pylist()
    if seen is not None:
        seen.update(vals)
    out = np.empty(len(vals), dtype=np.uint64)
    for i, t in enumerate(vals):
        h = memo.get(t)
        if h is None:
            h = hash64_str(t)
            memo[t] = h
        out[i] = h
    return out


def encode_partition(
    index_dir: str,
    raw_root: str,
    part_id: int,
    block_size: int,
    target_postings: int | None = None,
) -> dict[str, Any]:
    """Phase-2 body: one partition raw -> encoded blocks + dict (pure).

    Terms are grouped by their 64-bit hash (numeric lexsort; dict/blocks are
    stored in hash order — lookups are point queries, so no order is needed).
    Collisions would merge two terms' postings: probability ~V²/2^65 (~3e-8
    for a 1M-term partition); detected below by comparing distinct-hash vs
    distinct-string counts and raised loudly rather than silently merged."""
    t0 = time.monotonic()
    pdir = os.path.join(raw_root, f"part_id={part_id}")
    files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
    out_dir = part_dir(index_dir, part_id)
    os.makedirs(out_dir, exist_ok=True)
    if files:
        tbl = pq.read_table(
            files, columns=["term", "doc_id", "tf", "dl"], read_dictionary=["term"]
        )
    else:
        tbl = pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.uint64()),
                "tf": pa.array([], type=pa.uint32()),
                "dl": pa.array([], type=pa.uint32()),
            }
        )
    memo: dict[str, int] = _TERM_HASH_MEMO
    part_terms: set[str] = set()
    term_col = tbl.column("term")
    if term_col.num_chunks:
        thash = np.concatenate(
            [_chunk_term_hashes(c, memo, part_terms) for c in term_col.chunks]
        )
    else:
        thash = np.empty(0, dtype=np.uint64)
    doc_ids = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
    tf = tbl.column("tf").to_numpy(zero_copy_only=False).astype(np.uint64)
    dl = tbl.column("dl").to_numpy(zero_copy_only=False).astype(np.uint64)
    perm = np.lexsort((doc_ids, thash))
    thash, doc_ids, tf, dl = thash[perm], doc_ids[perm], tf[perm], dl[perm]
    # dedup (term, doc_id): duplicates only arise from retried phase-1 tasks
    # rewriting a batch; duplicate rows are identical, keep the first.
    if len(doc_ids):
        keep = np.r_[True, (thash[1:] != thash[:-1]) | (doc_ids[1:] != doc_ids[:-1])]
        n_dups = int((~keep).sum())
        if n_dups:
            thash, doc_ids, tf, dl = thash[keep], doc_ids[keep], tf[keep], dl[keep]
    else:
        n_dups = 0

    hash2term = {h: t for t, h in memo.items()}
    n_distinct_hashes = int((np.r_[True, thash[1:] != thash[:-1]]).sum()) if len(thash) else 0
    if n_distinct_hashes != len(part_terms):
        raise RuntimeError(
            f"term-hash collision in partition {part_id}: "
            f"{len(part_terms)} distinct terms -> {n_distinct_hashes} hashes; "
            "widen the digest (functions/hashing.py)"
        )

    cols = encode_term_postings(thash, doc_ids, tf, dl, block_size=block_size)
    block_terms = pa.array(
        [hash2term[h] for h in np.asarray(cols["term_code"], dtype=np.uint64)],
        type=pa.string(),
    )
    blocks = pa.table(
        {
            "term": block_terms,
            "block_id": pa.array(cols["block_id"], type=pa.uint32()),
            "first_doc_id": pa.array(cols["first_doc_id"], type=pa.uint64()),
            "last_doc_id": pa.array(cols["last_doc_id"], type=pa.uint64()),
            "n": pa.array(cols["n"], type=pa.uint32()),
            "max_tf": pa.array(cols["max_tf"], type=pa.uint32()),
            "min_dl": pa.array(cols["min_dl"], type=pa.uint32()),
            "sum_tf": pa.array(cols["sum_tf"], type=pa.uint64()),
            "payload": cols["payload"],
        }
    )
    # postings were grouped by term HASH; re-sort the (small) block table
    # alphabetically so parquet row-group stats prune term point-lookups
    blocks = blocks.sort_by([("term", "ascending"), ("block_id", "ascending")])
    pq.write_table(blocks, os.path.join(out_dir, "blocks.parquet"), row_group_size=16384)
    # per-term dict: df (postings in THIS partition), cf, n_blocks
    if len(thash):
        t_starts = np.flatnonzero(np.r_[True, thash[1:] != thash[:-1]])
        t_ends = np.r_[t_starts[1:], len(thash)]
        dict_tbl = pa.table(
            {
                "term": pa.array([hash2term[h] for h in thash[t_starts]], type=pa.string()),
                "df": pa.array((t_ends - t_starts).astype(np.uint64), type=pa.uint64()),
                "cf": pa.array(np.add.reduceat(tf, t_starts).astype(np.uint64), type=pa.uint64()),
            }
        )
    else:
        dict_tbl = pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "df": pa.array([], type=pa.uint64()),
                "cf": pa.array([], type=pa.uint64()),
            }
        )
    dict_tbl = dict_tbl.sort_by([("term", "ascending")])
    pq.write_table(dict_tbl, os.path.join(out_dir, "dict.parquet"), row_group_size=16384)
    # length-banded dict sidecar: (term_len, term)-sorted with small row
    # groups, so edit-distance candidate scans (fuzzy_suggest) prune to the
    # |len - len(q)| <= max_dist band via row-group stats instead of reading
    # every dict row group — the same pruning prefix_suggest gets from the
    # term sort.  Tiny relative to blocks.parquet (terms + df only).
    import pyarrow.compute as pc

    dict_len = pa.table(
        {
            "term_len": pc.utf8_length(dict_tbl.column("term")).cast(pa.int32()),
            "term": dict_tbl.column("term"),
            "df": dict_tbl.column("df"),
        }
    ).sort_by([("term_len", "ascending"), ("term", "ascending")])
    pq.write_table(
        dict_len, os.path.join(out_dir, "dict_len.parquet"), row_group_size=2048
    )
    # no-silent-caps: a partition whose raw postings dwarf the sizing target
    # means a hot term escaped the sample (all its postings hash-route
    # here); surface it loudly in the lineage instead of just being slow
    oversized = bool(target_postings and len(doc_ids) > 4 * target_postings)
    if oversized:
        print(
            f"[encode_partition] WARNING: partition {part_id} holds "
            f"{len(doc_ids)} postings (> 4x target {target_postings}) — "
            "likely an unsalted hot term; raise max_sample_docs or max_salts"
        )
    meta = {
        "part_id": part_id,
        "oversized": oversized,
        "n_postings": int(len(doc_ids)),
        "n_terms": int(dict_tbl.num_rows),
        "n_blocks": int(blocks.num_rows),
        "n_dup_postings_removed": n_dups,
        "payload_bytes": int(len(cols["payload"].buffers()[2] or b"")) if blocks.num_rows else 0,
        "elapsed_sec": round(time.monotonic() - t0, 4),
        "lineage": {"raw_files": [os.path.basename(f) for f in files]},
    }
    mark_part_complete(index_dir, part_id, meta)
    return meta


def _encode_partition_batch(
    batch: dict, index_dir: str, raw_root: str, block_size: int,
    target_postings: int | None = None,
) -> dict:
    """map_batches body over partition-descriptor rows (phase 2).  A plain
    function -> stateless Ray tasks: no actor-pool startup cost, and encode
    tasks start the moment a cpu frees up."""
    metas = []
    for pid in batch["part_id"]:
        m = encode_partition(index_dir, raw_root, int(pid), block_size, target_postings)
        metas.append(m)
    return {
        "part_id": np.array([m["part_id"] for m in metas], dtype=np.int64),
        "n_postings": np.array([m["n_postings"] for m in metas], dtype=np.int64),
        "n_terms": np.array([m["n_terms"] for m in metas], dtype=np.int64),
        "n_blocks": np.array([m["n_blocks"] for m in metas], dtype=np.int64),
    }


def _reduce_fragment_stats(parts: list[dict], files: list[str]) -> tuple[int, int, int]:
    """Reduce per-fragment stats rows (n, sum_dl, lo, hi, uniq): if all
    fragments are internally unique and their id-ranges pairwise disjoint
    (the dense layout), sums are exact with no shuffle; otherwise fall
    back to a distributed groupby(doc_id) dedup pass."""
    import ray.data as rd

    # empty fragments carry no ids: drop them BEFORE the adjacency check
    # (an empty file sorted between two overlapping fragments must not
    # break the chain and hide the overlap)
    filled = [p for p in parts if p["n"]]
    order = sorted(range(len(filled)), key=lambda i: filled[i]["lo"])
    disjoint = all(bool(p["uniq"]) for p in filled) and all(
        filled[order[i]]["hi"] < filled[order[i + 1]]["lo"]
        for i in range(len(order) - 1)
    )
    if disjoint:
        return (
            int(sum(p["n"] for p in parts)),
            int(sum(p["sum_dl"] for p in parts)),
            1 if any(p["n"] for p in parts) else 0,
        )

    # overlap: dedup by doc_id (shuffle moves only (doc_id, doc_len) pairs).
    # Group on the int64 two's-complement VIEW of the uint64 id: url-hash
    # ids above 2^63 would otherwise fall into Ray's pickled-object key
    # path (distinctness is preserved bijectively; the id value itself is
    # not needed here, only counts and lengths).
    from ray.data.aggregate import Count, Min

    def _signed_ids(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(ids.view(np.int64), type=pa.int64()),
                "doc_len": t.column("doc_len"),
            }
        )

    per_doc = (
        rd.read_parquet(files, columns=["doc_id", "doc_len"])
        .map_batches(_signed_ids, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(Count(alias_name="c"), Min("doc_len", alias_name="doc_len"))
    )

    def _partial(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy(zero_copy_only=False)
        dl = b.column("doc_len").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_docs": pa.array([len(c)], type=pa.int64()),
                "sum_dl": pa.array([int(dl.sum()) if len(dl) else 0], type=pa.int64()),
                "max_c": pa.array([int(c.max()) if len(c) else 0], type=pa.int64()),
            }
        )

    out = per_doc.map_batches(_partial, batch_format="pyarrow").take_all()
    return (
        sum(r["n_docs"] for r in out),
        sum(r["sum_dl"] for r in out),
        max((r["max_c"] for r in out), default=0),
    )


def _docmap_stats(docmap_dir: str) -> tuple[int, int, int]:
    """(n_docs, total_doc_len, max_rows_per_doc_id) — distributed, driver
    memory O(#fragments) regardless of corpus size (the round-1 version
    pulled every doc_id into one driver numpy array).

    Fast path (no shuffle): stateless Ray tasks scan one fragment each,
    returning (rows, sum_dl, min/max doc_id, within-file uniqueness).  If
    every fragment is internally unique AND fragment id-ranges are pairwise
    disjoint — the dense-id layout by construction — global uniqueness is
    proven and the raw sums are exact.  Overlapping ranges (hash/native
    ids span the whole 64-bit space) fall back to a groupby(doc_id) dedup
    pass per the manifest retry contract (readers dedup by doc_id)."""
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(docmap_dir, "*.parquet")))
    if not files:
        return 0, 0, 0

    # fastest path: the tokenize actors side-write one tiny stats sidecar
    # per fragment at extract time (stages/tokenize.py) — commit then only
    # reads #fragments small jsons, no data scan at all.  Sidecars are
    # optional (older indexes / external docmaps fall through).
    sidecars = []
    for f in files:
        mp = f[: -len(".parquet")] + ".meta.json"
        if not os.path.exists(mp):
            sidecars = None
            break
        import json as _json

        with open(mp) as fh:
            sidecars.append(_json.load(fh))
    if sidecars is not None:
        return _reduce_fragment_stats(sidecars, files)

    def _per_file(batch: dict) -> dict:
        ns, sums, los, his, uniq = [], [], [], [], []
        for path in batch["path"]:
            t = pq.read_table(path, columns=["doc_id", "doc_len"])
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            dl = t.column("doc_len").to_numpy(zero_copy_only=False)
            ns.append(len(ids))
            sums.append(int(dl.sum()) if len(dl) else 0)
            los.append(int(ids.min()) if len(ids) else 0)
            his.append(int(ids.max()) if len(ids) else 0)
            uniq.append(bool(len(np.unique(ids)) == len(ids)))
        return {
            "n": np.array(ns, dtype=np.int64),
            "sum_dl": np.array(sums, dtype=np.int64),
            "lo": np.array(los, dtype=np.uint64),
            "hi": np.array(his, dtype=np.uint64),
            "uniq": np.array(uniq, dtype=np.bool_),
        }

    parts = (
        rd.from_items([{"path": f} for f in files])
        .map_batches(_per_file, batch_size=8)
        .take_all()
    )
    return _reduce_fragment_stats(parts, files)


def build_index(
    paths: list[str] | str,
    index_dir: str,
    config: BuildConfig | None = None,
    resume: bool = False,
) -> IndexManifest:
    """Build (or resume building) an index over pages/documents parquet.

    Ray must already be initialised by the caller (driver contract)."""
    import ray
    import ray.data as rd

    cfg = config or BuildConfig()
    if isinstance(paths, str):
        paths = sorted(glob.glob(os.path.join(paths, "*.parquet"))) if os.path.isdir(paths) else [paths]
    if not resume and os.path.exists(os.path.join(index_dir, "progress.json")):
        # fresh build into a used dir: clear stale state so checkpoints can't
        # mix two builds (resume=True is the path that reuses state)
        import shutil

        shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)
    raw_root = os.path.join(index_dir, "raw")
    docmap_dir = os.path.join(index_dir, "docmap")
    progress = load_progress(index_dir) if resume else {}

    n_docs_estimate = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)

    # hot-term set AND partition count must be identical across resumes
    # (both determine routing)
    if "hot_terms" in progress:
        hot_terms = progress["hot_terms"]
        if progress.get("n_partitions"):
            cfg = dataclasses.replace(cfg, n_partitions=int(progress["n_partitions"]))
    else:
        hot_terms, sample_stats = sample_hot_terms(paths, cfg, n_docs_estimate)
        if cfg.n_partitions is None:
            est_postings = int(
                n_docs_estimate * max(sample_stats["avg_unique_terms"], 1.0)
            )
            cfg = dataclasses.replace(
                cfg,
                n_partitions=_auto_partitions(
                    est_postings, cfg.target_partition_postings
                ),
            )
        progress = {
            "hot_terms": hot_terms,
            "n_partitions": cfg.n_partitions,
            "input_files": paths,
            "config": dataclasses.asdict(cfg),
        }
        save_progress(index_dir, progress)

    t_build0 = time.monotonic()
    if not progress.get("phase1_complete"):
        tok_cfg = cfg.tokenizer_config(hot_terms, docmap_dir)
        dense = cfg.id_assign == "dense" and not cfg.id_column
        if dense or cfg.id_column:
            tok_cfg["id_space"] = cfg.id_offset + n_docs_estimate
        if dense:
            # descriptor per row group, with exact global row offsets from
            # parquet metadata (driver-side, cheap) — see TokenizeFileTask
            descriptors = []
            offset = cfg.id_offset
            for p in paths:
                md = pq.ParquetFile(p).metadata
                for rg in range(md.num_row_groups):
                    descriptors.append(
                        {"path": p, "row_group": rg, "row_offset": offset}
                    )
                    offset += md.row_group(rg).num_rows
            ds = rd.from_items(descriptors)
        else:
            from indexer_ray.sources.tables import read_parquet_clean

            # metadata-stripped read: pandas-written parquet schemas are
            # unhashable and defeat Ray's schema-dedup fast path
            ds = read_parquet_clean(paths, columns=_input_columns(cfg))
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        # Task granularity: Ray sizes map tasks at ~max(block rows, batch
        # rows), so clamp batch_size to ~corpus/(4*cpus) rows — small corpora
        # then still fan out across every cpu, while at web scale the clamp
        # is a no-op (read_parquet already splits files into many blocks).
        eff_batch = int(np.clip(n_docs_estimate // (4 * n_cpus), 64, cfg.batch_size))
        # Actor pool: leave cpus for read/write tasks (a pool sized to the
        # whole cluster starves its own input and DEADLOCKS — seen at both
        # 32 cpus/32 actors and 2 cpus/2 actors), and pre-start roughly one
        # actor per 4 pending tasks — demand-driven ramp-up otherwise
        # wastes most of the run on short jobs.
        if n_cpus >= 6:
            actor_cpus = 1
            max_actors = max(1, n_cpus - 2)
        else:
            # tiny clusters: fractional-cpu actors so a 2-cpu cluster still
            # runs 2 tokenizers while leaving headroom for read/write tasks
            # (1 whole-cpu actor would idle half the cluster)
            actor_cpus = 0.75
            max_actors = max(1, int((n_cpus - 0.5) / actor_cpus))
        min_actors = int(np.clip(n_docs_estimate // (4 * eff_batch), 1, max_actors))
        concurrency = cfg.tokenize_actors or (min_actors, max_actors)
        if dense:
            postings = ds.map_batches(
                TokenizeFileTask,
                fn_constructor_args=(tok_cfg,),
                batch_size=1,
                concurrency=concurrency,
                num_cpus=actor_cpus,
            )
        else:
            postings = ds.map_batches(
                TokenizeStage,
                fn_constructor_args=(tok_cfg,),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=eff_batch,
                concurrency=concurrency,
                num_cpus=actor_cpus,
            )
        postings.write_parquet(raw_root, partition_cols=["part_id"])
        progress["phase1_complete"] = True
        progress["phase1_sec"] = round(time.monotonic() - t_build0, 3)
        save_progress(index_dir, progress)

    # phase 2: encode partitions that aren't checkpointed yet
    t2 = time.monotonic()
    existing = {
        int(os.path.basename(d).split("=")[1])
        for d in glob.glob(os.path.join(raw_root, "part_id=*"))
    }
    all_parts = sorted(existing)
    pending = [p for p in all_parts if not part_complete(index_dir, p)]
    if pending:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        encode_cpus = cfg.encode_cpus or max(1, n_cpus // 8)
        rd.from_items([{"part_id": p} for p in pending]).map_batches(
            _encode_partition_batch,
            fn_args=(index_dir, raw_root, cfg.block_size, cfg.target_partition_postings),
            batch_size=1,
            num_cpus=encode_cpus,
        ).materialize()
    progress["phase2_sec"] = round(time.monotonic() - t2, 3)
    save_progress(index_dir, progress)

    n_docs, total_dl, max_rows_per_id = _docmap_stats(docmap_dir)
    if max_rows_per_id > 1 and cfg.verify_doc_ids and not (
        cfg.id_assign == "dense" and not cfg.id_column
    ):
        # dense row-number ids are unique by construction (duplicates there
        # are retry artifacts the stats already deduplicated); for
        # hash/native ids a duplicate means a collision or duplicate url
        raise RuntimeError(
            "doc_id collision or duplicate url in docmap "
            f"(max {max_rows_per_id} rows per doc_id); "
            "widen the digest or dedup the input by url"
        )
    part_metas = {}
    for p in all_parts:
        import json

        with open(os.path.join(part_dir(index_dir, p), "_meta.json")) as f:
            part_metas[str(p)] = json.load(f)
    manifest = IndexManifest(
        n_docs=n_docs,
        total_doc_len=total_dl,
        n_partitions=cfg.n_partitions,
        hot_terms=hot_terms,
        config=dataclasses.asdict(cfg),
        partitions=part_metas,
        input_files=list(paths),
    )
    manifest.save(index_dir)
    if not cfg.keep_raw:
        import shutil

        shutil.rmtree(raw_root, ignore_errors=True)
    return manifest
