"""Command-line driver: ``python -m indexer_ray {index,search,serve}``.

Mirrors the reference's CLI surface (main.rs:38-89) where it still makes
sense for a parquet-corpus engine:

  index   — reference `index --path --output --hidden --skip-paths`
            (main.rs:41-64): `--corpus parquet` (default) indexes
            pages/documents parquet; `--corpus files` is the reference's
            own input mode — a directory tree of txt/md/csv/html/xml/pdf
            files with recursive discovery, extension dispatch, hidden
            skip and `--skip-paths` (sources/files.py; the exec-bit rule
            is quirk Q10, consciously excluded).
  search  — reference `search --index --query --output --count`
            (main.rs:66-79): prints "score: url" lines (main.rs:200-207);
            `--output` writes one result per LINE — the reference's
            separator-less file join (main.rs:208-209, quirk Q12) is
            consciously not replicated.
  serve   — reference `serve --index --port` (main.rs:80-89): a minimal
            stdlib HTTP loop over a warmed searcher: GET / -> search form,
            POST /query -> newline-joined urls (scores dropped, matching
            server.rs:70-75).

Beyond the reference surface, the index LIFECYCLE commands:

  merge   — compact a base + delta index pair (newest-url-wins) into a
            fresh index (pipelines/merge.merge_indexes).
  delete  — tombstone deletion as compaction: base index minus a url
            list (one per line) -> fresh index (merge.delete_docs).
  verify  — index fsck (pipelines/fsck.verify_index): shallow
            manifest/partition/docmap metadata checks, `--deep` decodes
            every posting block and re-checks the build invariants;
            exits non-zero on any error.

The CLI owns its Ray session (the library never calls ray.init; the
`__ray_entry__` driver contract owns the session there).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys


def _init_ray(address: str | None = None) -> None:
    """Connect to Ray.

    Address resolution (in order): explicit --ray-address flag, the
    RAY_ADDRESS env var, then "local".  Under ``ray job submit`` the job
    server exports RAY_ADDRESS pointing at the cluster, so the same CLI
    binary is the cluster job entrypoint with no flag needed:

        ray job submit --working-dir . -- \
            python -m indexer_ray index -p /data/pages -o /shared/index

    (north rule: "run via ray job submit on a fixed-size multi-node Ray
    cluster"; in this sandbox there is no job server, so the identical
    code path is exercised with address="local".)
    """
    import ray

    if not ray.is_initialized():
        addr = address or os.environ.get("RAY_ADDRESS", "local")
        kwargs = {} if addr != "local" else {"include_dashboard": False}
        ray.init(address=addr, **kwargs)


def _resolve_inputs(path: str, skip: list[str]) -> list[str]:
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    else:
        files = [path]
    skipset = set(skip or [])
    return [f for f in files if os.path.basename(f) not in skipset]


def cmd_index(args) -> int:
    from indexer_ray.pipelines.build import BuildConfig, build_index

    cfg = BuildConfig(
        mode=args.mode,
        source=args.source,
        n_partitions=args.partitions,
        id_column=args.id_column,
    )
    if args.corpus == "files":
        # reference-CLI mode: a directory of txt/md/csv/html/xml/pdf files
        # (recursive discovery + extension dispatch, lib.rs:150-258)
        from indexer_ray.sources.files import index_file_corpus

        _init_ray(args.ray_address)
        m, n_files = index_file_corpus(
            args.path,
            args.output,
            cfg,
            include_hidden=args.hidden,
            skip_paths=args.skip_paths,
            resume=args.resume,
        )
        if m is None:
            print("no indexable files found", file=sys.stderr)
            return 1
    elif args.corpus == "warc":
        # crawl-archive mode: .warc/.warc.gz shards (sources/warc.py)
        from indexer_ray.sources.warc import index_warc_corpus

        _init_ray(args.ray_address)
        m, n_pages = index_warc_corpus(
            args.path, args.output, cfg, resume=args.resume
        )
        if m is None:
            print("no WARC records found", file=sys.stderr)
            return 1
    elif args.corpus == "jsonl":
        # web-dump mode: .jsonl/.ndjson(.gz) shards (sources/jsonl.py);
        # JSONL docs carry native ids — default the build key to doc_id
        import dataclasses

        from indexer_ray.sources.jsonl import index_jsonl_corpus

        if cfg.id_column is None:
            cfg = dataclasses.replace(cfg, id_column="doc_id")
        _init_ray(args.ray_address)
        m, n_docs = index_jsonl_corpus(
            args.path,
            args.output,
            cfg,
            resume=args.resume,
            id_column=cfg.id_column,
        )
        if m is None:
            print("no JSONL records found", file=sys.stderr)
            return 1
    else:
        files = _resolve_inputs(args.path, args.skip_paths)
        if not files:
            print("no parquet inputs found", file=sys.stderr)
            return 1
        _init_ray(args.ray_address)
        m = build_index(files, args.output, cfg, resume=args.resume)
    total_postings = sum(p["n_postings"] for p in m.partitions.values())
    print(f"Indexed {m.n_docs} docs, {total_postings} postings, {m.n_partitions} partitions -> {args.output}")
    return 0


def cmd_merge(args) -> int:
    from indexer_ray.pipelines.merge import merge_indexes

    _init_ray(args.ray_address)
    m = merge_indexes(args.base, args.delta, args.output, resume=args.resume)
    print(f"Merged -> {args.output}: {m.n_docs} docs, {m.n_partitions} partitions")
    return 0


def cmd_delete(args) -> int:
    from indexer_ray.pipelines.merge import delete_docs

    with open(args.urls) as f:
        urls = [ln.strip() for ln in f if ln.strip()]
    _init_ray(args.ray_address)
    m = delete_docs(args.index, urls, args.output, resume=args.resume)
    print(
        f"Deleted {len(urls)} urls -> {args.output}: "
        f"{m.n_docs} docs remain, {m.n_partitions} partitions"
    )
    return 0


def cmd_verify(args) -> int:
    from indexer_ray.pipelines.fsck import verify_index

    if args.deep:
        _init_ray(args.ray_address)
    r = verify_index(args.index, deep=args.deep)
    for k, v in sorted(r["stats"].items()):
        print(f"{k}: {v}")
    for e in r["errors"]:
        print(f"ERROR: {e}", file=sys.stderr)
    print("OK" if r["ok"] else f"FAILED ({len(r['errors'])} errors)")
    return 0 if r["ok"] else 1


def cmd_search(args) -> int:
    from indexer_ray.pipelines.query import IndexSearcher

    s = IndexSearcher(args.index)
    hits = s.search_urls(args.query, k=args.count, scorer=args.scorer, algorithm=args.algorithm)
    lines = [f"{score}: {url}" for url, score in hits]
    if args.output:
        with open(args.output, "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
    else:
        for line in lines:
            print(line)
    return 0


def cmd_serve(args) -> int:
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from indexer_ray.pipelines.query import IndexSearcher

    searcher = IndexSearcher(args.index)
    page = (
        b"<!doctype html><html><body><h1>indexer_ray</h1>"
        b"<form method='post' action='/query'><input name='q'>"
        b"<button>Search</button></form></body></html>"
    )

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            if self.path == "/":
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(page)
            else:
                self.send_error(404)

        def do_POST(self):  # noqa: N802
            if self.path != "/query":
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            q = self.rfile.read(n).decode("utf-8", "replace")
            hits = searcher.search_urls(q, k=args.count)
            body = "\n".join(u for u, _ in hits).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", args.port), Handler)
    print(f"serving index {args.index} on http://127.0.0.1:{args.port}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="indexer_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("index", help="build an index over parquet pages/documents")
    p.add_argument("-p", "--path", required=True, help="parquet file or directory")
    p.add_argument("-o", "--output", required=True, help="index output directory")
    p.add_argument("-s", "--skip-paths", nargs="*", default=[], help="skip input files by basename")
    p.add_argument(
        "--corpus",
        default="parquet",
        choices=["parquet", "files", "warc", "jsonl"],
        help="'parquet' = pages/documents tables; 'files' = a directory of "
        "txt/md/csv/html/xml/pdf files (the reference CLI's input mode); "
        "'warc' = .warc/.warc.gz crawl archives (ISO 28500); "
        "'jsonl' = .jsonl/.ndjson(.gz) web-dump shards",
    )
    p.add_argument("--hidden", action="store_true", help="files corpus: include hidden files")
    p.add_argument("--mode", default="conformance", choices=["conformance", "plain"])
    p.add_argument("--source", default="text", choices=["text", "html"])
    p.add_argument("--id-column", default=None, help="native integer doc-id column")
    p.add_argument(
        "--partitions",
        type=int,
        default=None,
        help="fixed term-partition count; default auto-sizes from estimated "
        "postings so one partition fits a phase-2 encode task (floor 32)",
    )
    p.add_argument(
        "--ray-address",
        default=None,
        help="Ray cluster address; default $RAY_ADDRESS or 'local'. Under "
        "`ray job submit` the job server sets RAY_ADDRESS automatically",
    )
    p.add_argument("--resume", action="store_true", help="resume an interrupted build")
    p.set_defaults(fn=cmd_index)

    p = sub.add_parser("merge", help="compact base + delta indexes (newest url wins)")
    p.add_argument("-b", "--base", required=True)
    p.add_argument("-d", "--delta", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--ray-address", default=None)
    p.add_argument("--resume", action="store_true")
    p.set_defaults(fn=cmd_merge)

    p = sub.add_parser("delete", help="delete documents by url (compaction)")
    p.add_argument("-i", "--index", required=True)
    p.add_argument("-u", "--urls", required=True, help="file with one url per line")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--ray-address", default=None)
    p.add_argument("--resume", action="store_true")
    p.set_defaults(fn=cmd_delete)

    p = sub.add_parser("verify", help="index fsck: manifest/partition/docmap checks")
    p.add_argument("-i", "--index", required=True)
    p.add_argument(
        "--deep",
        action="store_true",
        help="also decode every posting block and re-check build invariants",
    )
    p.add_argument("--ray-address", default=None)
    p.set_defaults(fn=cmd_verify)

    p = sub.add_parser("search", help="query an index")
    p.add_argument("-i", "--index", required=True)
    p.add_argument("-q", "--query", required=True)
    p.add_argument("-o", "--output", default=None, help="write results to file")
    p.add_argument("-c", "--count", type=int, default=10)
    p.add_argument("--scorer", default="tfidf", choices=["tfidf", "bm25"])
    p.add_argument("--algorithm", default="exhaustive", choices=["exhaustive", "wand"])
    p.set_defaults(fn=cmd_search)

    p = sub.add_parser("serve", help="HTTP query service")
    p.add_argument("-i", "--index", required=True)
    p.add_argument("-p", "--port", type=int, default=8765)
    p.add_argument("-c", "--count", type=int, default=10)
    p.set_defaults(fn=cmd_serve)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
