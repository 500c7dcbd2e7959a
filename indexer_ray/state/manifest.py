"""On-disk index layout, manifest and checkpoint/resume bookkeeping.

Layout of an index directory (the distributed analogue of the reference's
`segment_<id>/term.dict` + `postings.bin` + `docstore.bin`, tree.rs:195-240,
369-374 — but partitioned by term hash instead of by write order):

    <index_dir>/
      raw/part_id=K/*.parquet      phase-1 output: (term, doc_id, tf, dl)
                                   rows routed to partition K  (deleted or
                                   kept per config after phase 2)
      parts/K/blocks.parquet       encoded posting blocks for partition K
      parts/K/dict.parquet         per-term stats for partition K
                                   (term, df, cf, n_blocks)
      parts/K/_meta.json           per-partition metrics + lineage record
      docmap/*.parquet             (doc_id, url, warc_ts, doc_len) fragments
                                   side-written by phase-1 actors; may contain
                                   duplicate doc_ids after task retries —
                                   readers dedup by doc_id
      manifest.json                commit point, written atomically LAST

Resume contract (north rule "resumable from per-partition checkpoints"):
  * phase 1 is idempotent per input batch (postings rows are deduped by
    (term, doc_id) in phase 2; docmap rows deduped by doc_id at read);
    `phase1_complete` in progress.json marks it done.
  * phase 2 is checkpointed per partition: a partition is complete iff
    `parts/K/_meta.json` exists (written atomically after its parquet
    files); resumed builds skip complete partitions.
  * manifest.json is written last; an index is valid iff it exists.
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile
from typing import Any


def atomic_write_json(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


@dataclasses.dataclass
class IndexManifest:
    n_docs: int
    total_doc_len: int
    n_partitions: int
    hot_terms: dict[str, int]  # term -> n_salts
    config: dict[str, Any]
    partitions: dict[str, dict[str, Any]]  # part_id -> metrics/lineage
    input_files: list[str]
    version: int = 1

    @property
    def avgdl(self) -> float:
        return self.total_doc_len / self.n_docs if self.n_docs else 0.0

    def save(self, index_dir: str) -> None:
        atomic_write_json(os.path.join(index_dir, "manifest.json"), dataclasses.asdict(self))

    @classmethod
    def load(cls, index_dir: str) -> "IndexManifest":
        with open(os.path.join(index_dir, "manifest.json")) as f:
            d = json.load(f)
        return cls(**d)


def part_dir(index_dir: str, part_id: int) -> str:
    return os.path.join(index_dir, "parts", str(part_id))


def part_complete(index_dir: str, part_id: int) -> bool:
    return os.path.exists(os.path.join(part_dir(index_dir, part_id), "_meta.json"))


def mark_part_complete(index_dir: str, part_id: int, meta: dict[str, Any]) -> None:
    atomic_write_json(os.path.join(part_dir(index_dir, part_id), "_meta.json"), meta)


def load_progress(index_dir: str) -> dict[str, Any]:
    p = os.path.join(index_dir, "progress.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def save_progress(index_dir: str, progress: dict[str, Any]) -> None:
    atomic_write_json(os.path.join(index_dir, "progress.json"), progress)
