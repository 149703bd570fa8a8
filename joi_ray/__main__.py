"""CLI: run the validation engine standalone.

    python -m joi_ray validate --schema schema.json --input data.parquet \
        --out /tmp/run [--id-column doc_id] [--catalog assets.parquet] \
        [--ref-path spans.media_ref] [--unique-key doc_id] [--shards 4] \
        [--baseline snapshot.json] [--resume]

    python -m joi_ray describe --schema schema.json     # pretty-print the IR
    python -m joi_ray check --schema schema.json --input data.parquet
        # one-shot: print violations to stdout (no files written)

Owns its Ray session (guarded init; never touches an existing one).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    from ._env import ensure_importable

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    ensure_importable()  # workers must import joi_ray from any cwd
    return ray


def _load_schema(path: str):
    from .spec import from_json

    with open(path) as f:
        return from_json(f.read())


def cmd_describe(args):
    schema = _load_schema(args.schema)
    print(json.dumps(schema.describe(), indent=2, sort_keys=True, default=str))
    return 0


def cmd_check(args):
    ray = _init_ray(args.num_cpus)
    try:
        from .pipelines.validate import validate_ds
        from .sources.io import read_documents

        ds = read_documents(args.input)
        viol = validate_ds(ds, _load_schema(args.schema), id_column=args.id_column)
        df = viol.to_pandas()
        if args.json:
            print(df.to_json(orient="records", lines=True))
        else:
            print(df.to_string(index=False) if len(df) else "no violations")
        return 1 if (df["severity"] == "error").any() else 0
    finally:
        ray.shutdown()


def cmd_infer(args):
    import pyarrow.parquet as pq

    from .infer import infer_schema

    schema = infer_schema(pq.read_table(args.input), slack=args.slack, enum_threshold=args.enum_threshold)
    print(json.dumps(schema.describe(), indent=2, sort_keys=True, default=str))
    return 0


def cmd_validate(args):
    ray = _init_ray(args.num_cpus)
    try:
        import pyarrow.parquet as pq
        import ray.data as rd

        from .pipelines.validate import validate_dataset

        catalog = pq.read_table(args.catalog) if args.catalog else None
        baseline = json.load(open(args.baseline)) if args.baseline else None

        files = args.input if isinstance(args.input, list) else [args.input]
        shards = max(1, args.shards)
        groups = [files[i::shards] for i in range(shards)]
        groups = [g for g in groups if g]

        def factory(paths):
            def f():
                return rd.read_parquet(paths)

            f.inputs = paths
            return f

        def uniq():
            return rd.read_parquet(files, columns=[args.unique_key])

        rep = validate_dataset(
            [factory(g) for g in groups],
            schema=_load_schema(args.schema),
            out_dir=args.out,
            id_column=args.id_column,
            catalog=catalog,
            catalog_key=args.catalog_key,
            ref_path=args.ref_path,
            stats_numeric=args.stats_numeric or None,
            stats_categorical=args.stats_categorical or None,
            stats_id=[args.id_column] if args.id_column else None,
            unique_key=args.unique_key,
            unique_ds_factory=uniq if args.unique_key else None,
            baseline_snapshot=baseline,
            resume=args.resume,
        )
        print(json.dumps(rep.to_dict(), indent=1, sort_keys=True))
        return 0 if rep.passed else 1
    finally:
        ray.shutdown()


def main(argv=None):
    p = argparse.ArgumentParser(prog="joi_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("describe", help="pretty-print a schema IR")
    d.add_argument("--schema", required=True)
    d.set_defaults(fn=cmd_describe)

    c = sub.add_parser("check", help="one-shot validation, violations to stdout")
    c.add_argument("--schema", required=True)
    c.add_argument("--input", required=True)
    c.add_argument("--id-column", default=None)
    c.add_argument("--num-cpus", type=int, default=None)
    c.add_argument("--json", action="store_true")
    c.set_defaults(fn=cmd_check)

    v = sub.add_parser("validate", help="full resumable pipeline run")
    v.add_argument("--schema", required=True)
    v.add_argument("--input", nargs="+", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--id-column", default="doc_id")
    v.add_argument("--catalog", default=None)
    v.add_argument("--catalog-key", default="media_ref")
    v.add_argument("--ref-path", default=None)
    v.add_argument("--unique-key", default=None)
    v.add_argument("--shards", type=int, default=4)
    v.add_argument("--stats-numeric", nargs="*", default=[])
    v.add_argument("--stats-categorical", nargs="*", default=[])
    v.add_argument("--baseline", default=None)
    v.add_argument("--resume", action="store_true")
    v.add_argument("--num-cpus", type=int, default=None)
    v.set_defaults(fn=cmd_validate)

    i = sub.add_parser("infer", help="infer a schema IR from a data sample")
    i.add_argument("--input", required=True)
    i.add_argument("--enum-threshold", type=int, default=16)
    i.add_argument("--slack", type=float, default=0.0)
    i.set_defaults(fn=cmd_infer)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
