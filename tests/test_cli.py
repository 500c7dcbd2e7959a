"""CLI surface tests (reference main.rs:38-89 analogue)."""

import pyarrow.parquet as pq

from indexer_ray.cli import _resolve_inputs, main


def test_resolve_inputs_skip_basenames(tmp_path):
    for name in ("a.parquet", "b.parquet", "skipme.parquet"):
        (tmp_path / name).write_bytes(b"")
    got = _resolve_inputs(str(tmp_path), ["skipme.parquet"])
    assert [b.split("/")[-1] for b in got] == ["a.parquet", "b.parquet"]


def test_search_cli_over_prebuilt_index(tmp_path, ray_session, tiny_pages, capsys):
    # build via the library (the session fixture owns Ray; cmd_index would
    # try to init its own), then exercise the search command end-to-end
    from indexer_ray.pipelines.build import BuildConfig, build_index

    idx = str(tmp_path / "idx")
    build_index([tiny_pages], idx, BuildConfig(n_partitions=4))
    rc = main(["search", "-i", idx, "-q", "needle17", "-c", "3"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) >= 1
    score, url = out[0].split(": ", 1)
    float(score)
    assert "000000000017" in url

    # --output writes one "score: url" per line (reference main.rs:200-207;
    # the separator-less file join quirk Q12 is intentionally not replicated)
    out_file = tmp_path / "results.txt"
    rc = main(["search", "-i", idx, "-q", "needle17", "-o", str(out_file)])
    assert rc == 0
    assert out_file.read_text().strip().splitlines()[0].split(": ")[1].endswith("17")


def test_file_corpus_end_to_end(tmp_path, ray_session, capsys):
    """The reference's primary input mode: a directory of mixed-type files
    -> discover -> extension-dispatch extract -> index -> search (S1-S4 +
    P1-P5 live in one pipeline)."""
    import zlib

    from indexer_ray.pipelines.build import BuildConfig
    from indexer_ray.pipelines.query import IndexSearcher
    from indexer_ray.sources.files import index_file_corpus

    root = tmp_path / "corpus"
    (root / "sub").mkdir(parents=True)
    (root / "a.txt").write_text("zebrahide in plain text")
    (root / "sub" / "b.md").write_text("markdown zebrahide again")
    (root / "c.csv").write_text("h1,h2\ncsvzebra,hide\n")
    (root / "d.html").write_bytes(b"<p>htmlzebra</p>")
    (root / "e.xml").write_text("<r>xmlzebra</r>")
    (root / ".hidden.txt").write_text("hiddenzebra")
    (root / "f.bin").write_bytes(b"unregistered extension")
    body = zlib.compress(b"BT (pdfzebra shows) Tj ET")
    (root / "g.pdf").write_bytes(
        b"%PDF-1.4\n4 0 obj <</Filter /FlateDecode /Length "
        + str(len(body)).encode()
        + b">>\nstream\n"
        + body
        + b"endstream endobj\n%%EOF"
    )

    idx = str(tmp_path / "fidx")
    m, n_files = index_file_corpus(root=str(root), index_dir=idx, config=BuildConfig(n_partitions=4))
    assert n_files == 6  # hidden + unregistered dropped
    assert m.n_docs == 6

    s = IndexSearcher(idx)
    for term, fname in [
        ("zebrahide", "a.txt"),
        # quirk Q1: csv fields fuse separator-less -> the fused run is the
        # ONLY token; "csvzebra" alone must NOT match
        ("csvzebrahide", "c.csv"),
        ("htmlzebra", "d.html"),
        ("xmlzebra", "e.xml"),
        ("pdfzebra", "g.pdf"),
    ]:
        hits = s.search_urls(term, k=3)
        assert hits and any(fname in u for u, _ in hits), (term, hits)
    assert s.search_urls("csvzebra", k=3) == []
    assert s.search_urls("hiddenzebra", k=3) == []


def test_file_corpus_runtime_registered_extractor(tmp_path, ray_session):
    """register_extractor must reach Ray workers: the extractor registry is
    snapshotted on the DRIVER and shipped with the task (round-2 review:
    worker-side get_extractor saw a fresh module and crashed the job)."""
    from indexer_ray.functions.extractors import register_extractor
    from indexer_ray.sources.files import read_file_corpus

    register_extractor("rstx", lambda b: "customtoken " + (b.decode() if isinstance(b, bytes) else b))
    try:
        root = tmp_path / "c2"
        root.mkdir()
        (root / "x.rstx").write_text("body")
        out = read_file_corpus(str(root)).to_pandas()
        assert len(out) == 1
        assert out.iloc[0]["text"] == "customtoken body"
    finally:
        from indexer_ray.functions.extractors import _EXTRACTORS

        _EXTRACTORS.pop("rstx", None)


def test_file_corpus_dangling_symlink_skipped(tmp_path, ray_session):
    import os

    from indexer_ray.sources.files import discover_files

    root = tmp_path / "c3"
    root.mkdir()
    (root / "ok.txt").write_text("fine")
    os.symlink(str(root / "gone.txt"), str(root / "dangling.txt"))
    got = discover_files(str(root))
    assert [os.path.basename(d["path"]) for d in got] == ["ok.txt"]


def test_file_corpus_resume_rejects_partial_extraction(tmp_path, ray_session):
    """A crash mid-extraction leaves parquet fragments but no completion
    marker; resume=True must re-extract everything instead of silently
    indexing a partial corpus."""
    import glob
    import os

    from indexer_ray.pipelines.build import BuildConfig
    from indexer_ray.sources.files import index_file_corpus

    root = tmp_path / "c4"
    root.mkdir()
    for i in range(6):
        (root / f"f{i}.txt").write_text(f"resumetoken{i} body text")
    idx = str(tmp_path / "f4idx")
    m1, n1 = index_file_corpus(str(root), idx, BuildConfig(n_partitions=2))
    assert (n1, m1.n_docs) == (6, 6)
    # simulate crash: remove the marker and HALF the extracted fragments
    pages_dir = idx + "_pages"
    os.remove(os.path.join(pages_dir, "_EXTRACTION_COMPLETE"))
    frags = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    for f in frags[: max(1, len(frags) // 2)]:
        os.remove(f)
    m2, n2 = index_file_corpus(
        str(root), idx, BuildConfig(n_partitions=2), resume=True
    )
    assert (n2, m2.n_docs) == (6, 6)  # full re-extraction, nothing dropped


def test_discover_files_skip_dir_and_full_path(tmp_path):
    """Skip entries match basenames OR full paths and prune directories
    during recursion (lib.rs:158-179)."""
    import os

    from indexer_ray.sources.files import discover_files

    root = tmp_path / "c5"
    (root / "sub").mkdir(parents=True)
    (root / "sub" / "inner.txt").write_text("x")
    (root / "keep.txt").write_text("x")
    (root / "drop.txt").write_text("x")
    got = discover_files(str(root), skip_paths=["sub"])  # directory by name
    assert [os.path.basename(d["path"]) for d in got] == ["drop.txt", "keep.txt"]
    got = discover_files(str(root), skip_paths=[str(root / "drop.txt")])
    names = [os.path.basename(d["path"]) for d in got]
    assert "drop.txt" not in names and "inner.txt" in names
    got = discover_files(str(root), skip_paths=[str(root / "sub")])  # dir by path
    assert [os.path.basename(d["path"]) for d in got] == ["drop.txt", "keep.txt"]


def test_cli_partitions_default_autosizes(tmp_path, ray_session, tiny_pages, capsys):
    """Omitting --partitions must leave BuildConfig.n_partitions=None so the
    build auto-sizes (floor 32) — the 10^12-doc default; a fixed CLI default
    of 32 would silently cap encode-task parallelism (VERDICT r2 #2)."""
    import json

    idx = str(tmp_path / "idx_auto")
    rc = main(["index", "-p", tiny_pages, "-o", idx])
    assert rc == 0
    with open(f"{idx}/manifest.json") as f:
        m = json.load(f)
    # tiny corpus -> the floor engages; the point is the autosize path ran
    # (the manifest records the RESOLVED count — _auto_partitions' floor)
    assert m["n_partitions"] == 32


def test_init_ray_address_resolution(monkeypatch):
    """--ray-address > $RAY_ADDRESS > 'local' (the `ray job submit` contract:
    the job server exports RAY_ADDRESS, so the submitted command needs no
    flag to join the cluster)."""
    import indexer_ray.cli as cli

    calls = {}

    class FakeRay:
        @staticmethod
        def is_initialized():
            return False

        @staticmethod
        def init(address=None, **kw):
            calls["address"] = address
            calls["kw"] = kw

    monkeypatch.setitem(__import__("sys").modules, "ray", FakeRay)
    monkeypatch.setenv("RAY_ADDRESS", "ray://head:10001")
    cli._init_ray()
    assert calls["address"] == "ray://head:10001"
    assert calls["kw"] == {}  # cluster connect: no local-only kwargs

    cli._init_ray("auto")
    assert calls["address"] == "auto"

    monkeypatch.delenv("RAY_ADDRESS")
    cli._init_ray()
    assert calls["address"] == "local"
    assert calls["kw"] == {"include_dashboard": False}


def test_cli_delete_lifecycle(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from indexer_ray.cli import main
    from indexer_ray.pipelines.query import IndexSearcher

    pages = pa.table(
        {
            "url": pa.array([f"u://{i}" for i in range(20)], type=pa.string()),
            "warc_ts": pa.array([0] * 20, type=pa.timestamp("us")),
            "html": pa.array([b""] * 20, type=pa.binary()),
            # kept docs alternate keepword/otherword so keepword's idf
            # stays positive after deletion (a term in EVERY remaining doc
            # scores ln(1)=0 and zero scores drop, per reference Q5/Q6)
            "text": pa.array(
                [
                    ("dropword filler" if i % 2 == 0
                     else ("keepword filler" if i % 4 == 1 else "otherword filler"))
                    for i in range(20)
                ]
            ),
        }
    )
    src = str(tmp_path / "pages.parquet")
    pq.write_table(pages, src)
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "idx_del")
    urls_file = str(tmp_path / "urls.txt")
    with open(urls_file, "w") as f:
        f.write("\n".join(f"u://{i}" for i in range(0, 20, 2)) + "\n")

    assert main(["index", "-p", src, "-o", idx, "--mode", "plain", "--partitions", "4"]) == 0
    assert main(["delete", "-i", idx, "-u", urls_file, "-o", out]) == 0
    s = IndexSearcher(out)
    assert s.search("dropword", k=20) == []  # even docs (dropword) deleted
    assert len(s.search("keepword", k=20)) == 5  # odd i with i%4==1
