"""CLI — mirrors the reference's ``mcpvectordb-ingest`` command
(/root/reference/src/mcpvectordb/cli.py:17-84) plus search/list/delete
verbs so the whole tool surface is drivable from a shell.

    python -m mcpvectordb_spark ingest <path> [--library L] [--store DIR]
    python -m mcpvectordb_spark search "query" [--top-k K] [--library L]
    python -m mcpvectordb_spark list-documents | list-libraries | info
    python -m mcpvectordb_spark get <doc_id> | delete <doc_id>
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mcpvectordb_spark")
    p.add_argument("--store", default=os.environ.get("MCPVECTORDB_STORE", "./chunks_store"))
    p.add_argument("--embedding-dim", type=int, default=64)
    sub = p.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser("ingest", help="ingest a file or folder")
    ing.add_argument("path")
    ing.add_argument("--library", default="default")
    ing.add_argument("--no-recursive", action="store_true")

    se = sub.add_parser("search")
    se.add_argument("query")
    se.add_argument("--top-k", type=int, default=5)
    se.add_argument("--library", default=None)
    se.add_argument("--filter", default=None, help="JSON equality filter dict")

    sub.add_parser("list-documents").add_argument("--library", default=None)
    sub.add_parser("list-libraries")
    sub.add_parser("info")
    sub.add_parser("get").add_argument("doc_id")
    sub.add_parser("delete").add_argument("doc_id")

    dw = sub.add_parser("delete-where", help="delete whole docs by equality filter")
    dw.add_argument("--library", default=None)
    dw.add_argument("--filter", default=None, help="JSON equality filter dict")

    sn = sub.add_parser("snapshot", help="create a zero-copy store snapshot")
    sn.add_argument("--tag", default=None)
    sub.add_parser("snapshots", help="list committed snapshots")
    sub.add_parser("restore").add_argument("version", type=int)

    args = p.parse_args(argv)

    from dataclasses import replace

    from mcpvectordb_spark.api import VectorDB
    from mcpvectordb_spark.config import DEFAULT
    from mcpvectordb_spark.session import get_spark

    cfg = replace(DEFAULT, embedding_dim=args.embedding_dim)
    db = VectorDB(get_spark("mcpvectordb_cli"), args.store, cfg)

    if args.cmd == "ingest":
        target = os.path.expanduser(args.path)
        if os.path.isdir(target):
            out = db.ingest_folder(target, library=args.library, recursive=not args.no_recursive)
        else:
            out = db.ingest_file(target, library=args.library)
    elif args.cmd == "search":
        out = db.search(args.query, top_k=args.top_k, library=args.library,
                        filter=json.loads(args.filter) if args.filter else None)
    elif args.cmd == "list-documents":
        out = db.list_documents(library=args.library)
    elif args.cmd == "list-libraries":
        out = db.list_libraries()
    elif args.cmd == "info":
        out = db.server_info()
    elif args.cmd == "get":
        out = db.get_document(args.doc_id)
    elif args.cmd == "delete-where":
        out = db.delete_where(library=args.library,
                              filter=json.loads(args.filter) if args.filter else None)
    elif args.cmd == "snapshot":
        out = db.snapshot(tag=args.tag)
    elif args.cmd == "snapshots":
        out = db.list_snapshots()
    elif args.cmd == "restore":
        out = db.restore(args.version)
    else:
        out = db.delete_document(args.doc_id)

    print(json.dumps(out, indent=2, default=str))
    return 0 if out.get("status") != "error" else 1


if __name__ == "__main__":
    sys.exit(main())
