"""Pipeline assembly and execution — ``runPipelineTask`` and the CLI.

Lifecycle parity with the reference (SURVEY §3.1):
1. task composition accumulates requirements statically (task.Task);
2. ``run_pipeline`` validates that the catalog covers them;
3. config (YAML file + CLI + ``-o`` overrides) binds virtual paths to
   physical locations/layers/variables (catalog.Catalog.bind);
4. binding validates serials/extensions ahead of execution;
5. the task runs: DataFrame plans build lazily, writes execute.

Subcommands (CLI.hs:393-439): ``run`` (default), ``show-tree``,
``write-config-template``, ``save`` (persist CLI overrides back into
the YAML, CLI.hs:215-235). ``--loc name=path`` (+ ``name+=path`` to
append a layer), ``--var name=value``, ``-o dotted.path=value``.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Any

from pyspark.sql import SparkSession

from porcupine_spark.cache import CacheStore
from porcupine_spark.catalog import Catalog
from porcupine_spark.config import (
    OptionsRecord,
    apply_dotted_overrides,
    config_template,
    dump_config,
    load_config_file,
    parse_config,
)
from porcupine_spark.task import RunCtx, Task


def run_pipeline(
    task: Task,
    catalog: Catalog,
    spark: SparkSession,
    root: str = ".",
    mappings: dict[str, Any] | None = None,
    variables: dict[str, Any] | None = None,
    input_: Any = None,
    cache_dir: str | None = None,
    cache_mirror: str | None = None,
    data: dict[str, list] | None = None,
) -> Any:
    """simpleRunPTask / runLocalPipelineTask (Run.hs:107-124): bind the
    catalog under a root with optional explicit mappings, run.
    ``cache_mirror`` layers a remote pull-fallback-push mirror over the
    local cache store (FunflowRemoteCache.hs:27-59)."""
    missing = {r for r in task.requirements if r not in catalog}
    if missing:
        raise KeyError(
            f"task requires datasets not in catalog: {sorted(missing)} "
            "(requirements are static — declared before execution, like the "
            "reference's VirtualTree)"
        )
    bound = catalog.bind(root, mappings, variables, data=data)
    # env-var engine config (PTask/Internal.hs:245-262 reads funflow's
    # store/coordinator opts from the environment): unset args fall
    # back to PORCUPINE_SPARK_STORE / PORCUPINE_SPARK_MIRROR
    cache_dir = cache_dir or os.environ.get(CacheStore.STORE_ENV)
    cache = CacheStore(spark, cache_dir, mirror_uri=cache_mirror) if cache_dir else None
    ctx = RunCtx(spark, bound, variables=dict(variables or {}), cache=cache)
    return task.run(ctx, input_)


def _parse_locs(loc_args: list[str]) -> dict[str, Any]:
    """--loc vpath=loc / vpath+=loc (layer append; PorcupineTree.hs:390-404)."""
    out: dict[str, Any] = {}
    for spec in loc_args:
        if "+=" in spec:
            name, _, path = spec.partition("+=")
            cur = out.get(name)
            if cur is None:
                out[name] = [path]
            elif isinstance(cur, list):
                cur.append(path)
            else:
                out[name] = [cur, path]
        elif "=" in spec:
            name, _, path = spec.partition("=")
            out[name] = None if path in ("null", "none", "") else path
        else:
            raise ValueError(f"--loc {spec!r}: expected name=path or name+=path")
    return out


def make_cli(
    task: Task,
    catalog: Catalog,
    records: list[OptionsRecord] | None = None,
    prog: str = "porcupine-spark",
):
    """Build the argparse CLI for a pipeline (one flag per option field,
    OptParse.hs:83-156) and return (parser, main)."""
    records = records or []
    parser = argparse.ArgumentParser(prog=prog)
    parser.add_argument("command", nargs="?", default="run",
                        choices=["run", "show-tree", "write-config-template", "save"])
    parser.add_argument("--config", "-c", default=None, help="YAML/JSON config file")
    parser.add_argument("--root", default=None, help="root dir for unmapped datasets")
    parser.add_argument("--loc", "-l", action="append", default=[],
                        help="bind vpath=loc (or vpath+=loc to add a layer)")
    parser.add_argument("--var", action="append", default=[], help="set path variable name=value")
    # show-tree display flags mirror the reference's (CLI.hs:393-427):
    # -m/-t/-a opt IN, -S/-F/-E opt OUT, -c is taken by --config so the
    # type-truncation knob is long-form --num-chars.
    parser.add_argument("--mappings", "-m", action="store_true",
                        help="show-tree: show bound locations of virtual files")
    parser.add_argument("--types", "-t", action="store_true",
                        help="show-tree: show types written to virtual files")
    parser.add_argument("--accesses", "-a", action="store_true",
                        help="show-tree: show how virtual files will be accessed")
    parser.add_argument("--no-serials", "-S", dest="serials", action="store_false",
                        help="show-tree: don't show source/sink capability")
    parser.add_argument("--no-fields", "-F", dest="fields", action="store_false",
                        help="show-tree: don't show option fields and docstrings")
    parser.add_argument("--no-extensions", "-E", dest="extensions", action="store_false",
                        help="show-tree: don't show possible physical-file extensions")
    parser.add_argument("--num-chars", type=int, default=60, metavar="N",
                        help="show-tree: characters of the type to show (default 60)")
    parser.add_argument("--verbose", "-v", action="count", default=0,
                        help="increase log verbosity (-v info, -vv debug)")
    parser.add_argument("--quiet", "-q", action="store_true", help="warnings only")
    parser.add_argument("-o", "--override", action="append", default=[],
                        help="dotted config override path.to.key=value")
    for rec in records:
        rec.add_cli_args(parser)

    def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> Any:
        ns = parser.parse_args(argv)
        import logging

        level = logging.WARNING if ns.quiet else (
            logging.DEBUG if ns.verbose >= 2 else logging.INFO if ns.verbose else logging.WARNING
        )
        logging.getLogger("porcupine_spark").setLevel(level)
        # remote (scheme'd) configs resolve through the accessors
        # (Run.hs:232-245); hadoop-scheme URIs need the session up front
        if ns.config and "://" in ns.config and not ns.config.startswith(("http://", "https://")):
            from porcupine_spark.session import get_spark

            spark = spark or get_spark("porcupine_run")
        raw = load_config_file(ns.config, spark=spark) if ns.config else {}
        raw = apply_dotted_overrides(raw, ns.override)
        cli_vals = {k: v for k, v in vars(ns).items()
                    if k not in {"command", "config", "root", "loc", "var", "override",
                                 "mappings", "types", "accesses", "serials", "fields",
                                 "extensions", "num_chars", "verbose", "quiet"}}
        cfg = parse_config(raw, records, cli_vals)
        if ns.root:
            cfg.root = ns.root
        cfg.locations.update(_parse_locs(ns.loc))
        for v in ns.var:
            name, _, val = v.partition("=")
            cfg.variables[name] = val

        if ns.command == "write-config-template":
            sys.stdout.write(config_template(catalog.names(), records))
            return None
        if ns.command == "show-tree":
            bound = catalog.bind(cfg.root, cfg.locations or None, cfg.variables,
                                 data=cfg.data or None)
            acc = (task.reads, task.writes) if ns.accesses else None
            sys.stdout.write(
                bound.show_tree(
                    types=ns.types, accesses=acc, mappings=ns.mappings,
                    serials=ns.serials, extensions=ns.extensions,
                    num_chars=ns.num_chars,
                ) + "\n"
            )
            if ns.fields:  # option fields shown by default (-F hides)
                for rec in records:
                    for fld in rec.fields:
                        sys.stdout.write(
                            f"  {rec.path}.{fld.name} :: {fld.type_.__name__}"
                            f" = {fld.default!r}  {fld.doc}\n"
                        )
            return None
        if ns.command == "save":
            merged = dict(raw)
            merged["root"] = cfg.root
            merged.setdefault("locations", {}).update(cfg.locations)
            merged.setdefault("variables", {}).update(cfg.variables)
            merged["options"] = cfg.options
            target = ns.config or "porcupine-config.yaml"
            with open(target, "w") as fh:
                fh.write(dump_config(merged))
            return None
        # run
        if spark is None:
            from porcupine_spark.session import get_spark

            spark = get_spark(prog)
        return run_pipeline(
            task, catalog, spark, root=cfg.root,
            mappings=cfg.locations or None, variables=cfg.variables,
            data=cfg.data or None,
        )

    return parser, main
