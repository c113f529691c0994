"""Config/CLI (SURVEY §2.8, §2.11) and content-addressed cache (§2.9)."""

import json

import pytest

from porcupine_spark.cache import CacheStore, Unhashed, cache_key
from porcupine_spark.catalog import Catalog, Dataset
from porcupine_spark.config import (
    OptionField,
    OptionsRecord,
    apply_dotted_overrides,
    config_template,
    parse_config,
)
from porcupine_spark.run import make_cli
from porcupine_spark.task import arr


REC = OptionsRecord(
    "opts",
    [
        OptionField("replications", 10, "how many copies"),
        OptionField("char", "a", "character to replicate"),
        OptionField("verbose", False, "chatty?"),
        OptionField("rate", 1.5, "a float"),
    ],
)


def test_priority_cli_over_yaml_over_default():
    """chooseHighestPriority (OptParse.hs:50-57)."""
    resolved = REC.resolve({"replications": 20, "char": "b"}, {"char": "c"})
    assert resolved["replications"] == 20  # yaml beats default
    assert resolved["char"] == "c"  # cli beats yaml
    assert resolved["verbose"] is False  # default
    assert resolved["rate"] == 1.5


def test_yaml_type_check():
    """type-change warnings (ConfigurationReader.hs:120-150) -> error."""
    with pytest.raises(TypeError):
        REC.resolve({"replications": "lots"}, {})
    assert REC.resolve({"rate": 2}, {})["rate"] == 2.0  # int->float ok


def test_dotted_overrides():
    cfg = {"options": {"opts": {"replications": 1}}}
    out = apply_dotted_overrides(cfg, ["options.opts.replications=7", "variables.x=hi"])
    assert out["options"]["opts"]["replications"] == 7
    assert out["variables"]["x"] == "hi"
    with pytest.raises(ValueError):
        apply_dotted_overrides({}, ["no-equals-sign"])


def test_parse_config_sections():
    raw = {
        "root": "/data",
        "locations": {"in/a": "/x/a.parquet", "dead": None},
        "variables": {"userId": 3},
        "options": {"opts": {"char": "z"}},
    }
    cfg = parse_config(raw, [REC], {})
    assert cfg.root == "/data"
    assert cfg.locations["dead"] is None
    assert cfg.options["opts"]["char"] == "z"
    assert cfg.options["opts"]["replications"] == 10


def test_config_template_contains_tree_and_defaults():
    out = config_template(["in/a", "out/b"], [REC])
    assert "in/a" in out and "out/b" in out
    assert "replications" in out


def test_cli_generation_and_show_tree(capsys, tmp_path):
    cat = Catalog([Dataset("data/in")])
    parser, main = make_cli(arr(lambda x: x), cat, [REC])
    # flags derive from option fields (OptParse.hs:83-156)
    helptext = parser.format_help()
    assert "--replications" in helptext
    # 'verbose' collides with the engine's -v flag and gets the --opt- prefix
    assert "--no-opt-verbose" in helptext
    # mappings are opt-in, like the reference's -m (CLI.hs:398-402)
    main(["show-tree", "--root", str(tmp_path), "--loc", "data/in=/p/x.parquet"])
    out = capsys.readouterr().out
    assert "data/in" in out and "/p/x.parquet" not in out
    main(["show-tree", "-m", "--root", str(tmp_path), "--loc", "data/in=/p/x.parquet"])
    out = capsys.readouterr().out
    assert "data/in" in out and "/p/x.parquet" in out


def test_cli_loc_layer_append():
    from porcupine_spark.run import _parse_locs

    locs = _parse_locs(["a=/p1.parquet", "a+=/p2.parquet", "b=null"])
    assert locs["a"] == ["/p1.parquet", "/p2.parquet"]
    assert locs["b"] is None


def test_cli_save_roundtrip(tmp_path, capsys):
    cat = Catalog([Dataset("d")])
    cfgfile = tmp_path / "cfg.yaml"
    cfgfile.write_text(json.dumps({"locations": {"d": "/old.parquet"}}))
    _, main = make_cli(arr(lambda x: x), cat, [REC])
    main(["save", "--config", str(cfgfile), "--loc", "d=/new.parquet", "--replications", "42"])
    saved = cfgfile.read_text()
    assert "/new.parquet" in saved
    assert "42" in saved


# ---- cache ----
def test_cache_key_sensitivity():
    k1 = cache_key("step", {"a": 1}, ["/p/x.parquet"])
    assert k1 == cache_key("step", {"a": 1}, ["/p/x.parquet"])
    assert k1 != cache_key("step", {"a": 2}, ["/p/x.parquet"])
    # re-binding a location re-triggers (PorcupineTree.hs:118-129)
    assert k1 != cache_key("step", {"a": 1}, ["/p/y.parquet"])
    # order-insensitive locations
    assert cache_key("s", {}, ["/b", "/a"]) == cache_key("s", {}, ["/a", "/b"])


def test_unhashed_excluded_from_key():
    k1 = cache_key("s", {"seed": 1, "label": Unhashed("x")}, [])
    k2 = cache_key("s", {"seed": 1, "label": Unhashed("y")}, [])
    assert k1 == k2


def test_cache_store_hit_miss(spark, tmp_path):
    store = CacheStore(spark, str(tmp_path / "store"))
    calls = []

    def compute():
        calls.append(1)
        return spark.createDataFrame([(1, "a")], "id long, v string")

    df1 = store.cached("step1", {"p": 1}, ["/in.parquet"], compute)
    assert df1.count() == 1 and calls == [1]
    df2 = store.cached("step1", {"p": 1}, ["/in.parquet"], compute)
    assert df2.count() == 1 and calls == [1]  # hit: no recompute
    store.cached("step1", {"p": 2}, ["/in.parquet"], compute)
    assert calls == [1, 1]  # param change: recompute
    assert store.hits == 1 and store.misses == 2


def test_cache_survives_sessions(spark, tmp_path):
    """Parquet checkpoints outlive the session (unlike df.persist)."""
    store = CacheStore(spark, str(tmp_path / "store"))
    store.cached("s", {}, [], lambda: spark.createDataFrame([(9,)], "x long"))
    fresh = CacheStore(spark, str(tmp_path / "store"))
    got = fresh.cached("s", {}, [], lambda: (_ for _ in ()).throw(AssertionError("recomputed")))
    assert got.collect()[0].x == 9


def test_cache_mirror_pull_fallback_push(spark, tmp_path):
    """Two-tier cache (FunflowRemoteCache.hs:27-59): a miss computes
    and pushes to local + mirror; a COLD local store pulls the hit from
    the mirror instead of recomputing; a broken mirror degrades to
    local-only without failing."""
    mirror = f"file://{tmp_path}/mirror"
    a = CacheStore(spark, str(tmp_path / "store_a"), mirror_uri=mirror)
    calls = []

    def compute():
        calls.append(1)
        return spark.createDataFrame([(7, "m")], "id long, v string")

    a.cached("step", {"p": 1}, ["/in.parquet"], compute)
    assert calls == [1] and a.mirror_pushes == 1
    # cold local store, same mirror: pull, don't recompute
    b = CacheStore(spark, str(tmp_path / "store_b"), mirror_uri=mirror)
    got = b.cached(
        "step", {"p": 1}, ["/in.parquet"],
        lambda: (_ for _ in ()).throw(AssertionError("recomputed despite mirror")),
    )
    assert got.collect()[0].id == 7
    assert b.mirror_hits == 1 and b.hits == 1 and b.misses == 0
    # the pulled copy is now local: a third read needs no mirror at all
    assert b.has(cache_key("step", {"p": 1}, ["/in.parquet"]))
    # broken mirror: compute succeeds, push failure only logged
    c = CacheStore(spark, str(tmp_path / "store_c"), mirror_uri="badscheme-x://nope")
    out = c.cached("step2", {}, [], lambda: spark.createDataFrame([(1,)], "x long"))
    assert out.count() == 1 and c.mirror_pushes == 0


def test_config_data_section_binds_literal_rows(spark, tmp_path):
    """replaceWithDataFromConfig (PorcupineTree.hs:440-503): the YAML
    data: section supplies rows; the dataset needs no physical file."""
    from porcupine_spark.run import run_pipeline
    from porcupine_spark.task import load

    cat = Catalog([Dataset.source("params", schema="k string, v long")])
    df = run_pipeline(
        load("params"), cat, spark, root=str(tmp_path),
        data={"params": [("alpha", 1), ("beta", 2)]},
    )
    assert {(r.k, r.v) for r in df.collect()} == {("alpha", 1), ("beta", 2)}
    # non-destructive: the original catalog still has no embedded rows
    assert cat["params"].embedded_default is None


def test_reified_reader_writer(spark, tmp_path):
    """getDataReader/getDataWriter (VirtualFileAccess.hs:186-212)."""
    cat = Catalog([Dataset("t")])
    bound = cat.bind(str(tmp_path))
    w = bound.writer("t")
    r = bound.reader("t")
    assert w.locations == [str(tmp_path / "t.parquet")] == r.locations
    w(spark.createDataFrame([(5,)], "x long"))
    assert r(spark).collect()[0].x == 5


def test_cached_task_uses_store_and_rebind_invalidates(spark, tmp_path):
    """cached() task: hit on same binding, recompute on re-bound input
    (the funflow re-binding semantics)."""
    from porcupine_spark.run import run_pipeline
    from porcupine_spark.task import arr, cached, load

    calls = []

    def transform(df):
        calls.append(1)
        return df

    for i, sub in enumerate(["a", "b"]):
        spark.createDataFrame([(i,)], "x long").write.mode("overwrite").parquet(
            str(tmp_path / f"in_{sub}.parquet")
        )
    cat = Catalog([Dataset.source("in")])
    t = cached(load("in") >> arr(transform), ident="step")
    for _ in range(2):  # second run: cache hit, no recompute
        out = run_pipeline(
            t, cat, spark, root=str(tmp_path),
            mappings={"in": str(tmp_path / "in_a.parquet")},
            cache_dir=str(tmp_path / "store"),
        )
    assert calls == [1]
    assert out.collect()[0].x == 0
    out_b = run_pipeline(  # re-bound input => different key => recompute
        t, cat, spark, root=str(tmp_path),
        mappings={"in": str(tmp_path / "in_b.parquet")},
        cache_dir=str(tmp_path / "store"),
    )
    assert calls == [1, 1]
    assert out_b.collect()[0].x == 1


def test_show_tree_types_flag(capsys, tmp_path):
    cat = Catalog([Dataset("d", schema="x int, y string")])
    _, main = make_cli(arr(lambda x: x), cat, [])
    main(["show-tree", "--root", str(tmp_path), "--types"])
    out = capsys.readouterr().out
    assert ":: x int, y string" in out


def test_show_tree_accesses_and_fields(capsys, tmp_path):
    """-a marks planned reads/writes from the task's static
    requirements; option fields show by default (CLI.hs:393-427)."""
    from porcupine_spark.task import load, write

    cat = Catalog([Dataset("in/a"), Dataset("out/b"), Dataset("unused")])
    t = load("in/a") >> write("out/b")
    _, main = make_cli(t, cat, [REC])
    main(["show-tree", "--root", str(tmp_path), "--accesses"])
    out = capsys.readouterr().out
    assert "in/a (rw)" in out and "<read>" in out
    assert "<write>" in out
    assert "unused" in out and "<unused>" in out
    assert "replications" in out  # option fields listed by default


def test_show_tree_negative_flags_and_num_chars(capsys, tmp_path):
    """-S/-F/-E hide serials/fields/extensions; --num-chars truncates
    the type display (PorcupineTree.hs:205-241)."""
    cat = Catalog([Dataset("d", schema="x int, y string, z double, w date")])
    _, main = make_cli(arr(lambda x: x), cat, [REC])
    main(["show-tree", "--root", str(tmp_path), "-S", "-F", "-E",
          "-t", "--num-chars", "10"])
    out = capsys.readouterr().out
    assert "(rw)" not in out and "[parquet" not in out
    assert "replications" not in out
    assert ":: x int, y s…" in out  # 10 chars + ellipsis


def test_load_config_remote_uris(spark, tmp_path):
    """Remote config files resolve through the accessors (Run.hs:
    232-245): hadoop-scheme URIs via the FileSystem API, http via the
    HTTP accessor; local paths unchanged."""
    import http.server
    import threading

    from porcupine_spark.config import load_config_file

    cfg_text = "root: /data\nvariables: {x: '1'}\n"
    p = tmp_path / "cfg.yaml"
    p.write_text(cfg_text)

    local = load_config_file(str(p))
    assert local["root"] == "/data"

    via_fs = load_config_file(f"file://{p}", spark=spark)
    assert via_fs == local

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = cfg_text.encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        via_http = load_config_file(f"http://127.0.0.1:{port}/cfg.yaml")
        assert via_http == local
    finally:
        srv.shutdown()

    import pytest

    with pytest.raises(ValueError):
        load_config_file("s3a://bucket/cfg.yaml")  # scheme'd URI needs a session


def test_cache_store_env_var_defaults(spark, tmp_path, monkeypatch):
    """Engine env config (funflow reads its store/coordinator opts
    from the environment, PTask/Internal.hs:245-262,291): an unset
    store/mirror falls back to PORCUPINE_SPARK_STORE /
    PORCUPINE_SPARK_MIRROR; explicit args always win."""
    env_store = tmp_path / "env_store"
    env_mirror = f"file://{tmp_path}/env_mirror"
    monkeypatch.setenv(CacheStore.STORE_ENV, str(env_store))
    monkeypatch.setenv(CacheStore.MIRROR_ENV, env_mirror)

    s = CacheStore(spark)
    assert s.store_dir == str(env_store)
    assert s.mirror_uri == env_mirror
    s.cached("estep", {}, [], lambda: spark.createDataFrame([(5,)], "x long"))
    assert any(env_store.iterdir())  # the env-configured store was written

    # explicit args beat the env
    s2 = CacheStore(spark, str(tmp_path / "explicit"), mirror_uri=None)
    assert s2.store_dir == str(tmp_path / "explicit")
    assert s2.mirror_uri == env_mirror  # mirror arg unset -> env fills it

    monkeypatch.delenv(CacheStore.STORE_ENV)
    monkeypatch.delenv(CacheStore.MIRROR_ENV)
    with pytest.raises(ValueError, match="PORCUPINE_SPARK_STORE"):
        CacheStore(spark)
