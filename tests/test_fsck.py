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
