"""Typed, documented, defaulted options + YAML config + CLI generation.

The reference's docrecords layer: option records are fields with
(path, type, default, docstring) (docrecords/src/Data/DocRecord.hs:
240-294, 657-674 ``docField``); a CLI parser is derived one flag per
field (DocRecord/OptParse.hs:83-156); sources merge with priority
CLI > YAML > default (``chooseHighestPriority``, OptParse.hs:50-57,
DocRecord.hs:220-233); ad-hoc ``-o dotted.path=value`` overrides
(ConfigurationReader.hs:69-150); and the whole pipeline config YAML
has ``variables:`` / ``locations:`` / ``data:`` / ``options:``
sections (PorcupineTree.hs:297-304).

YAML parsing is driver-side (configs are small); if pyyaml is absent
a JSON fallback keeps the engine usable.
"""

from __future__ import annotations

import argparse
import json
from dataclasses import dataclass, field
from typing import Any

try:
    import yaml  # type: ignore

    _HAVE_YAML = True
except Exception:  # pragma: no cover
    _HAVE_YAML = False


@dataclass(frozen=True)
class OptionField:
    """docField @"name" default "doc" (DocRecord.hs:657-658)."""

    name: str
    default: Any
    doc: str = ""
    type_: type = str

    def __post_init__(self):
        if self.default is not None and self.type_ is str:
            object.__setattr__(self, "type_", type(self.default))


@dataclass
class OptionsRecord:
    """A typed options record bound at a catalog path (getOptions,
    System/TaskPipeline/Options.hs:68-84): values resolve
    CLI > YAML > default, field by field."""

    path: str  # virtual path, e.g. "options"
    fields: list[OptionField] = field(default_factory=list)

    def defaults(self) -> dict[str, Any]:
        return {f.name: f.default for f in self.fields}

    def add_cli_args(self, parser: argparse.ArgumentParser) -> None:
        """One flag per field (OptParse.hs:83-156); bools get
        --flag/--no-flag pairs. A field whose name collides with an
        engine flag is disambiguated with an ``--opt-`` prefix (the
        reference disambiguates colliding fields by path suffix,
        OptParse.hs:83-105)."""
        for f in self.fields:
            for flag in (f"--{f.name.replace('_', '-')}", f"--opt-{f.name.replace('_', '-')}"):
                kwargs: dict = {"dest": f.name, "default": None,
                                "help": f"{f.doc} (default: {f.default})"}
                if f.type_ is bool:
                    kwargs["action"] = argparse.BooleanOptionalAction
                else:
                    kwargs["type"] = _parse_scalar_factory(f.type_)
                try:
                    parser.add_argument(flag, **kwargs)
                    break
                except argparse.ArgumentError:
                    continue

    def resolve(self, yaml_values: dict[str, Any], cli_values: dict[str, Any]) -> dict[str, Any]:
        """chooseHighestPriority: CLI > YAML > default, per field."""
        out = {}
        for f in self.fields:
            if cli_values.get(f.name) is not None:
                out[f.name] = cli_values[f.name]
            elif f.name in yaml_values:
                v = yaml_values[f.name]
                if f.default is not None and not isinstance(v, f.type_) and not (
                    f.type_ is float and isinstance(v, int)
                ):
                    raise TypeError(
                        f"option {f.name!r}: config value {v!r} is not {f.type_.__name__} "
                        "(reference warns on type changes, ConfigurationReader.hs:120-150)"
                    )
                out[f.name] = float(v) if f.type_ is float and isinstance(v, int) else v
            else:
                out[f.name] = f.default
        return out


def _parse_scalar_factory(t: type):
    if t is list or t is dict:
        return json.loads
    return t


@dataclass
class PipelineConfig:
    """The resolved run configuration (VirtualTreeAndMappings analog,
    PorcupineTree.hs:330-333)."""

    root: str = "."
    locations: dict[str, Any] = field(default_factory=dict)  # name -> path | [paths] | None
    variables: dict[str, Any] = field(default_factory=dict)
    data: dict[str, Any] = field(default_factory=dict)  # embedded rows per dataset
    options: dict[str, Any] = field(default_factory=dict)  # per options-record path


def load_config_file(path: str, spark=None) -> dict[str, Any]:
    """Load a YAML/JSON config from a local path OR a remote URI —
    the reference reads remote config files through the location
    accessors (Run.hs:232-245: a remote URL resolves via the accessor
    record and is decoded as a YAML stream). Scheme routing:

    - ``http(s)://`` — driver-side fetch (configs are small);
    - any other ``scheme://`` — the Hadoop FileSystem for that scheme
      (s3a://, hdfs://, file://...; honors :func:`porcupine_spark.
      sources.s3.configure_s3a`), needs a live ``spark`` session;
    - no scheme — plain local file.
    """
    if path.startswith(("http://", "https://")):
        from porcupine_spark.sources.http import fetch_one

        status, body = fetch_one(path)
        if status != 200:
            raise IOError(f"config fetch {path} -> HTTP {status}")
        text = body.decode("utf-8")
    elif "://" in path:
        if spark is None:
            raise ValueError(
                f"remote config {path!r} needs a SparkSession for scheme resolution"
            )
        from porcupine_spark.sources.s3 import _fs_for

        fs, p = _fs_for(spark, path)
        stream = fs.open(p)
        try:
            # IOUtils drains the Hadoop input stream fully driver-side
            jvm = spark.sparkContext._jvm
            text = jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
    else:
        with open(path) as fh:
            text = fh.read()
    if _HAVE_YAML:
        return yaml.safe_load(text) or {}
    return json.loads(text or "{}")


def dump_config(cfg: dict[str, Any]) -> str:
    if _HAVE_YAML:
        return yaml.safe_dump(cfg, sort_keys=False)
    return json.dumps(cfg, indent=2)


def apply_dotted_overrides(cfg: dict[str, Any], overrides: list[str]) -> dict[str, Any]:
    """-o path.to.key=value (ConfigurationReader.hs:69-150): typed via
    YAML/JSON literal parse; warns via KeyError on unknown paths only
    at the leaf-creation level (typos create new keys loudly)."""
    out = json.loads(json.dumps(cfg))  # deep copy
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} is not of the form path.to.key=value")
        dotted, _, raw = ov.partition("=")
        try:
            value = yaml.safe_load(raw) if _HAVE_YAML else json.loads(raw)
        except Exception:
            value = raw
        node = out
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise TypeError(f"override {ov!r}: {p!r} is not a mapping")
        node[parts[-1]] = value
    return out


def parse_config(
    raw: dict[str, Any],
    records: list[OptionsRecord] | None = None,
    cli_values: dict[str, Any] | None = None,
) -> PipelineConfig:
    """Merge a raw config dict (YAML) + CLI values into a PipelineConfig.
    Sections mirror the reference YAML: ``locations`` (+ ``root``),
    ``variables``, ``data``, ``options``."""
    records = records or []
    cli_values = cli_values or {}
    opts: dict[str, Any] = {}
    raw_opts = raw.get("options", {})
    for rec in records:
        yaml_vals = raw_opts.get(rec.path, raw_opts if len(records) == 1 else {})
        opts[rec.path] = rec.resolve(yaml_vals if isinstance(yaml_vals, dict) else {}, cli_values)
    return PipelineConfig(
        root=raw.get("root", "."),
        locations=raw.get("locations", {}),
        variables=raw.get("variables", {}),
        data=raw.get("data", {}),
        options=opts,
    )


def config_template(catalog_names: list[str], records: list[OptionsRecord]) -> str:
    """write-config-template (CLI.hs:203-211): emit the default YAML with
    the whole tree + option docs/defaults."""
    cfg: dict[str, Any] = {
        "root": ".",
        "variables": {},
        "locations": {name: "_" for name in catalog_names},
        "options": {rec.path: rec.defaults() for rec in records},
    }
    return dump_config(cfg)
