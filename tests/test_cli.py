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
