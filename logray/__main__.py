"""CLI entry points: ``python -m logray <cmd>``.

The reference is a library with no CLI; pipeline users still need one.
Commands own their Ray session (library code never calls ray.init).

  gen   <sf> <out_dir>        deterministic transcript corpus
  run   <in_dir> <out_dir>    flagship parse→enrich→route→aggregate
                              (--rules <json> swaps in a user rule table)
  query <name> <sf_dir>       one catalogue query, results to stdout
  ls                          list the query catalogue
  rules <out.json|->          export the frozen rule table as editable JSON
  compact <out_dir>           merge small sink files (manifest-safe)
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None) -> None:
    import os

    import ray

    if not ray.is_initialized():
        # Under `ray job submit` the job runtime exports RAY_ADDRESS to the
        # cluster head — attach to it (forcing "local" there would spin a
        # private single-node Ray inside the job container). Standalone,
        # RAY_ADDRESS is unset (or preset to "local" in this sandbox) and
        # a local session starts as before.
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {} if address != "local" else {"num_cpus": num_cpus}
        ray.init(address=address, include_dashboard=False,
                 logging_level="ERROR", **kwargs)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="logray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate the deterministic corpus")
    g.add_argument("sf", type=float)
    g.add_argument("out_dir")

    r = sub.add_parser("run", help="run the flagship pipeline")
    r.add_argument("in_dir")
    r.add_argument("out_dir")
    r.add_argument("--no-resume", action="store_true")
    r.add_argument("--rules", default=None, metavar="RULES_JSON",
                   help="declarative rule-table file (rules_io JSON) replacing "
                        "the frozen transcript ruleset")
    r.add_argument("--follow", action="store_true",
                   help="streaming micro-batch mode: poll in_dir and process "
                        "newly-arrived partitions until idle")
    r.add_argument("--poll-s", type=float, default=2.0)
    r.add_argument("--max-idle-polls", type=int, default=3)

    x = sub.add_parser("rules", help="export the frozen rule table as JSON "
                                     "(edit + pass back via `run --rules`)")
    x.add_argument("out", help="output path, '-' for stdout")

    c = sub.add_parser("compact", help="merge small sink files per "
                                       "(partition, sink) via the manifest protocol")
    c.add_argument("out_dir")
    c.add_argument("--target-mb", type=int, default=128)

    q = sub.add_parser("query", help="run one catalogue query")
    q.add_argument("name")
    q.add_argument("sf_dir")
    q.add_argument("--limit", type=int, default=20)

    sub.add_parser("ls", help="list the query catalogue")

    qp = sub.add_parser("query-plan", help="run a declarative JSON plan "
                        "(logray.query_dsl) against the sf tables")
    qp.add_argument("plan", help="path to a plan .json, or a named "
                    "built-in plan from query_dsl.PLANS")
    qp.add_argument("sf_dir")
    qp.add_argument("--limit", type=int, default=20)

    t = sub.add_parser("table", help="versioned-table ops (time travel, "
                                     "compaction, retention)")
    t.add_argument("verb", choices=["log", "read", "merge", "delete",
                                    "compact", "vacuum"])
    t.add_argument("table_dir")
    t.add_argument("changes", nargs="?", default=None,
                   help="(merge) parquet file of upsert rows")
    t.add_argument("--version", type=int, default=None)
    t.add_argument("--limit", type=int, default=20)
    t.add_argument("--target-rows", type=int, default=1_000_000)
    t.add_argument("--keep-last", type=int, default=1)
    t.add_argument("--key", default=None,
                   help="merge key / stats column (keeps [min,max] "
                        "recorded through compaction)")
    t.add_argument("--values", default=None,
                   help="(delete) comma-separated key values to hide "
                        "via a deletion vector")

    args = ap.parse_args(argv)

    if args.cmd == "gen":
        from .gen import generate_corpus

        meta = generate_corpus(args.sf, args.out_dir)
        print(json.dumps(meta))
        return 0

    if args.cmd == "ls":
        from .pipelines.queries import QUERIES
        from .pipelines.oracles import ORACLE_SQL

        for name in QUERIES:
            print(f"{name}  [{'sql-oracle' if name in ORACLE_SQL else 'rows-only'}]")
        return 0

    if args.cmd == "rules":
        from .rules_io import ruleset_to_json
        from .rules_transcripts import TRANSCRIPT_PASSTHROUGH, TRANSCRIPT_RULES

        text = ruleset_to_json(TRANSCRIPT_RULES, TRANSCRIPT_PASSTHROUGH)
        if args.out == "-":
            print(text)
        else:
            from pathlib import Path

            Path(args.out).write_text(text + "\n")
        return 0

    import ray

    _init_ray(args.num_cpus)
    try:
        if args.cmd == "run":
            from .pipelines.flagship import run_flagship

            rules_json = None
            if args.rules is not None:
                from pathlib import Path

                rules_json = Path(args.rules).read_text()
            if args.follow:
                from .pipelines.flagship import follow_flagship

                metrics = follow_flagship(
                    args.in_dir, args.out_dir, poll_s=args.poll_s,
                    max_idle_polls=args.max_idle_polls,
                    rules_json=rules_json)
            else:
                metrics = run_flagship(args.in_dir, args.out_dir,
                                       resume=not args.no_resume,
                                       rules_json=rules_json)
            print(json.dumps(metrics, default=str))
            return 0

        if args.cmd == "compact":
            from .pipelines.compact import compact

            print(json.dumps(compact(args.out_dir, target_mb=args.target_mb)))
            return 0

        if args.cmd == "table":
            from .state import versioned

            if args.verb == "log":
                from .state.fsio import fspath

                d = fspath(args.table_dir)
                for v in versioned.versions(d):
                    m = json.loads(
                        (d / f"v{v:06d}.manifest.json").read_text())
                    print(json.dumps({
                        "version": v, "op": m["op"],
                        "files": len(m["files"]),
                        "added": len(m["added"]),
                        "removed": len(m["removed"])}))
            elif args.verb == "read":
                df = versioned.read(args.table_dir,
                                    args.version).to_pandas()
                print(df.head(args.limit).to_string(index=False))
                print(f"... {len(df)} rows")
            elif args.verb == "merge":
                import pyarrow.parquet as _pq

                if not args.changes or not args.key:
                    ap.error("table merge needs <changes.parquet> "
                             "and --key")
                v = versioned.merge_into(
                    args.table_dir, _pq.read_table(args.changes),
                    args.key)
                print(json.dumps({"version": v}))
            elif args.verb == "delete":
                if not args.values or not args.key:
                    ap.error("table delete needs --key and --values")
                # cast CLI tokens to the key column's ACTUAL Arrow type
                # (guessing from digit-shape would turn a string key of
                # zero-padded ids into int64 DVs that never match)
                import pyarrow as _pa
                import pyarrow.parquet as _pq2
                from pathlib import Path as _P

                tokens = args.values.split(",")
                d = _P(args.table_dir)
                vs = versioned.versions(d)
                files = (versioned._load(d, vs[-1])["files"]
                         if vs else [])
                if files:
                    typ = _pq2.read_schema(
                        d / files[0]).field(args.key).type
                    vals = _pa.array(tokens, type=_pa.string()).cast(
                        typ).to_pylist()
                else:
                    vals = tokens
                v = versioned.delete_keys(args.table_dir, vals,
                                          args.key)
                print(json.dumps({"version": v, "hidden": len(vals)}))
            elif args.verb == "compact":
                v = versioned.compact(args.table_dir,
                                      target_rows=args.target_rows,
                                      key=args.key)
                print(json.dumps({"version": v}))
            else:  # vacuum
                print(json.dumps(versioned.vacuum(
                    args.table_dir, keep_last=args.keep_last)))
            return 0

        if args.cmd == "query-plan":
            from pathlib import Path as _P2

            from .query_dsl import PLANS, execute

            if _P2(args.plan).exists():
                res = execute(_P2(args.plan).read_text(), args.sf_dir)
            else:
                res = execute(PLANS[args.plan], args.sf_dir)
            import pandas as pd
            import pyarrow as pa

            df = (res.to_pandas() if isinstance(res, pa.Table)
                  else res.limit(args.limit).to_pandas())
            print(df.head(args.limit).to_string())
            return 0

        if args.cmd == "query":
            from .pipelines.queries import QUERIES

            res = QUERIES[args.name](args.sf_dir)
            import pandas as pd
            import pyarrow as pa

            if isinstance(res, pa.Table):
                df = res.to_pandas()
            elif isinstance(res, pd.DataFrame):
                df = res
            else:
                df = res.limit(args.limit).to_pandas()
            print(df.head(args.limit).to_string())
            return 0
    finally:
        ray.shutdown()
    return 1


if __name__ == "__main__":
    sys.exit(main())
