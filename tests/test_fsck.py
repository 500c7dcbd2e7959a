"""Index fsck tests: a fresh build verifies clean (shallow + deep), and
each class of corruption — missing completion marker, tampered posting
payload, duplicated docmap rows, manifest/count drift — is detected."""

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from indexer_ray.pipelines.build import BuildConfig, build_index
from indexer_ray.pipelines.fsck import verify_index
from indexer_ray.sources.pages import generate_pages_parquet


@pytest.fixture(scope="module")
def built_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("fsck")
    pages = str(root / "pages.parquet")
    generate_pages_parquet(pages, n_rows=300, seed=11)
    idx = str(root / "index")
    build_index([pages], idx, BuildConfig(n_partitions=8))
    return idx, root


def _copy(idx, root, name):
    dst = str(root / name)
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(idx, dst)
    return dst


def test_clean_index_verifies(built_index):
    idx, _ = built_index
    r = verify_index(idx)
    assert r["ok"], r["errors"]
    r = verify_index(idx, deep=True)
    assert r["ok"], r["errors"]
    assert r["stats"]["n_postings"] > 0
    assert r["stats"]["docmap_rows"] == r["stats"]["n_docs"]


def test_missing_part_marker_fails_shallow(built_index):
    idx, root = built_index
    bad = _copy(idx, root, "bad_marker")
    os.unlink(os.path.join(bad, "parts", "3", "_meta.json"))
    r = verify_index(bad)
    assert not r["ok"] and any("partition 3" in e for e in r["errors"])


def test_tampered_payload_fails_deep(built_index):
    idx, root = built_index
    bad = _copy(idx, root, "bad_payload")
    # rewrite one partition's blocks with a truncated payload column
    target = None
    for pdir in sorted(glob.glob(os.path.join(bad, "parts", "*"))):
        t = pq.read_table(os.path.join(pdir, "blocks.parquet"))
        if t.num_rows:
            target = (pdir, t)
            break
    pdir, t = target
    import pyarrow as pa

    payloads = t.column("payload").to_pylist()
    payloads[0] = payloads[0][: max(0, len(payloads[0]) - 3)]  # clip varints
    t = t.set_column(
        t.schema.get_field_index("payload"),
        "payload",
        pa.array(payloads, type=pa.large_binary()),
    )
    pq.write_table(t, os.path.join(pdir, "blocks.parquet"))
    assert verify_index(bad)["ok"]  # shallow can't see it
    r = verify_index(bad, deep=True)
    assert not r["ok"]
    assert any("decode failed" in e or "postings" in e for e in r["errors"])


def test_duplicate_docmap_rows_fail_deep(built_index):
    idx, root = built_index
    bad = _copy(idx, root, "bad_docmap")
    f = glob.glob(os.path.join(bad, "docmap", "*.parquet"))[0]
    t = pq.read_table(f)
    pq.write_table(t.slice(0, 1), os.path.join(bad, "docmap", "zz_dup.parquet"))
    r = verify_index(bad)  # shallow: row count drifts from manifest
    assert not r["ok"]
    # fix the manifest count so only the deep uniqueness check can catch it
    m = json.load(open(os.path.join(bad, "manifest.json")))
    m["n_docs"] += 1
    json.dump(m, open(os.path.join(bad, "manifest.json"), "w"))
    r = verify_index(bad, deep=True)
    assert not r["ok"]
    assert any("duplicate doc_ids" in e for e in r["errors"])


def test_cli_verify_exit_codes(built_index, capsys):
    idx, root = built_index
    from indexer_ray.cli import main

    assert main(["verify", "-i", idx, "--deep"]) == 0
    out = capsys.readouterr().out
    assert "OK" in out
    bad = _copy(idx, root, "bad_cli")
    os.unlink(os.path.join(bad, "parts", "1", "_meta.json"))
    assert main(["verify", "-i", bad]) == 1


def test_fsck_deep_over_merge_delete_remap_lineage(
    built_index, tmp_path_factory, ray_session
):
    """The three lifecycle ops compose: build -> merge -> delete -> remap,
    with verify --deep green after every step and the final docmap being
    the dense url rank (the remap contract)."""
    from indexer_ray.pipelines.merge import delete_docs, merge_indexes
    from indexer_ray.pipelines.remap import remap_docids

    idx, _ = built_index
    work = tmp_path_factory.mktemp("lineage")

    delta_pages = str(work / "delta.parquet")
    # start=300: disjoint url space from the base fixture's 300 rows
    generate_pages_parquet(delta_pages, n_rows=120, seed=11, start=300)
    delta_idx = str(work / "delta_idx")
    build_index([delta_pages], delta_idx, BuildConfig(n_partitions=8))
    r = verify_index(delta_idx, deep=True)
    assert r["ok"], r["errors"]

    merged = str(work / "merged")
    merge_indexes(idx, delta_idx, merged)
    r = verify_index(merged, deep=True)
    assert r["ok"], r["errors"]

    dm = pq.read_table(
        sorted(glob.glob(os.path.join(merged, "docmap", "*.parquet"))),
        columns=["url"],
    )
    urls = sorted(dm.column("url").to_pylist())[::17][:25]
    assert urls
    deleted = str(work / "deleted")
    delete_docs(merged, urls, deleted)
    r = verify_index(deleted, deep=True)
    assert r["ok"], r["errors"]

    remapped = str(work / "remapped")
    remap_docids(deleted, remapped, key_cols=("url",))
    r = verify_index(remapped, deep=True)
    assert r["ok"], r["errors"]

    dm2 = (
        pq.read_table(
            sorted(glob.glob(os.path.join(remapped, "docmap", "*.parquet"))),
            columns=["doc_id", "url"],
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert dm2["doc_id"].tolist() == list(range(len(dm2)))
    assert dm2["url"].tolist() == sorted(dm2["url"])
    assert len(dm2) == 300 + 120 - len(urls)
    for u in urls:
        assert u not in set(dm2["url"])
