"""Iceberg SQL views: view-spec metadata over the warehouse + the REST
catalog's /v1/namespaces/{ns}/views surface (sinks/views.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from iceberg_kafka_connect_spark.sinks.catalog import Catalog
from iceberg_kafka_connect_spark.sinks.rest_catalog import (
    RestCatalog,
    RestCatalogError,
)
from iceberg_kafka_connect_spark.sinks.rest_server import IcebergRestServer
from iceberg_kafka_connect_spark.sinks.views import (
    NoSuchViewError,
    ViewAlreadyExistsError,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _seed(spark, cat):
    t = cat.create_table("db.base", SCHEMA)
    t.append(spark.createDataFrame([(i, f"x{i}") for i in range(10)], SCHEMA))
    return t


def test_directory_catalog_view_lifecycle(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"))
    _seed(spark, cat)
    meta = cat.create_view(
        "db.evens",
        "SELECT id, v FROM db_base WHERE id % 2 = 0",
        spark=spark,
        properties={"comment": "even ids"},
    )
    # spec-shaped metadata with the inferred schema
    assert meta["format-version"] == 1
    assert meta["current-version-id"] == 1
    assert [f["name"] for f in meta["schemas"][0]["fields"]] == ["id", "v"]
    rep = meta["versions"][0]["representations"][0]
    assert rep["type"] == "sql" and rep["dialect"] == "spark"
    assert cat.views.list() == ["db.evens"]
    # executes against the warehouse
    got = sorted(r.id for r in cat.read_view(spark, "db.evens").collect())
    assert got == [0, 2, 4, 6, 8]
    # replace: new version becomes current, history retained
    cat.views.add_version(
        "db.evens",
        {
            "representations": [
                {
                    "type": "sql",
                    "sql": "SELECT id FROM db_base WHERE id > 7",
                    "dialect": "spark",
                }
            ]
        },
    )
    _, meta2 = cat.views.load("db.evens")
    assert meta2["current-version-id"] == 2
    assert len(meta2["versions"]) == 2
    assert sorted(
        r.id for r in cat.read_view(spark, "db.evens").collect()
    ) == [8, 9]
    # time-travel rollback: set-current back to version 1
    cat.views.set_current("db.evens", 1)
    assert sorted(
        r.id for r in cat.read_view(spark, "db.evens").collect()
    ) == [0, 2, 4, 6, 8]
    # rename + duplicate + drop
    cat.views.rename("db.evens", "db2.evens")
    assert cat.views.list() == ["db2.evens"]
    with pytest.raises(ViewAlreadyExistsError):
        cat.create_view("db2.evens", "SELECT 1")
    cat.views.drop("db2.evens")
    with pytest.raises(NoSuchViewError):
        cat.views.load("db2.evens")


def test_rest_view_lifecycle(spark, tmp_path):
    with IcebergRestServer(str(tmp_path / "wh")) as srv:
        client = RestCatalog(srv.uri)
        _seed(spark, client)
        meta = client.create_view(
            "db.top",
            "SELECT id, v FROM db_base WHERE id >= 5",
            schema=SCHEMA,
        )
        assert meta["current-version-id"] == 1
        assert client.view_exists("db.top")
        assert not client.view_exists("db.nope")
        assert client.list_views("db") == ["db.top"]
        loc, meta_l = client.load_view("db.top")
        assert loc.endswith("top.view.json")
        assert meta_l["view-uuid"] == meta["view-uuid"]
        # execute through the client
        got = sorted(r.id for r in client.read_view(spark, "db.top").collect())
        assert got == [5, 6, 7, 8, 9]
        # replace-view flow (assert-view-uuid + add + set-current -1)
        meta2 = client.replace_view(
            "db.top", "SELECT id FROM db_base WHERE id < 2"
        )
        assert meta2["current-version-id"] == 2
        assert sorted(
            r.id for r in client.read_view(spark, "db.top").collect()
        ) == [0, 1]
        # stale uuid requirement -> 409, nothing applied
        with pytest.raises(RestCatalogError) as ei:
            client._request(
                "POST",
                client._view_path("db.top"),
                {
                    "requirements": [
                        {"type": "assert-view-uuid", "uuid": "wrong"}
                    ],
                    "updates": [
                        {
                            "action": "set-properties",
                            "updates": {"leak": "y"},
                        }
                    ],
                },
            )
        assert ei.value.code == 409
        assert "leak" not in client.load_view("db.top")[1]["properties"]
        # set-current to a nonexistent version -> 400, atomic
        with pytest.raises(RestCatalogError) as ei:
            client._request(
                "POST",
                client._view_path("db.top"),
                {
                    "updates": [
                        {"action": "set-properties", "updates": {"l2": "y"}},
                        {
                            "action": "set-current-view-version",
                            "view-version-id": 99,
                        },
                    ]
                },
            )
        assert ei.value.code == 400
        assert "l2" not in client.load_view("db.top")[1]["properties"]
        # rollback to version 1 via the commit endpoint
        client._request(
            "POST",
            client._view_path("db.top"),
            {
                "updates": [
                    {
                        "action": "set-current-view-version",
                        "view-version-id": 1,
                    }
                ]
            },
        )
        assert sorted(
            r.id for r in client.read_view(spark, "db.top").collect()
        ) == [5, 6, 7, 8, 9]
        # rename + name-collision rules + drop
        client.rename_view("db.top", "db.renamed")
        assert client.view_exists("db.renamed")
        with pytest.raises(RestCatalogError) as ei:
            client.create_view("db.base", "SELECT 1")  # table name taken
        assert ei.value.code == 409
        client.drop_view("db.renamed")
        with pytest.raises(RestCatalogError) as ei:
            client.load_view("db.renamed")
        assert ei.value.code == 404


def test_rest_view_add_schema_binding(spark, tmp_path):
    """add-schema + add-view-version with schema-id -1 binds the version
    to the schema added in the SAME commit (spec semantics)."""
    with IcebergRestServer(str(tmp_path / "wh")) as srv:
        client = RestCatalog(srv.uri)
        _seed(spark, client)
        client.create_view("db.s", "SELECT id FROM db_base", schema=None)
        new_schema = {
            "type": "struct",
            "fields": [
                {"id": 1, "name": "id", "required": True, "type": "long"},
                {"id": 2, "name": "twice", "required": False, "type": "long"},
            ],
        }
        out = client._request(
            "POST",
            client._view_path("db.s"),
            {
                "updates": [
                    {"action": "add-schema", "schema": new_schema},
                    {
                        "action": "add-view-version",
                        "view-version": {
                            "schema-id": -1,
                            "representations": [
                                {
                                    "type": "sql",
                                    "sql": "SELECT id, id * 2 AS twice "
                                    "FROM db_base",
                                    "dialect": "spark",
                                }
                            ],
                        },
                    },
                    {
                        "action": "set-current-view-version",
                        "view-version-id": -1,
                    },
                ]
            },
        )["metadata"]
        assert out["current-version-id"] == 2
        cur = next(
            v
            for v in out["versions"]
            if v["version-id"] == out["current-version-id"]
        )
        sid = cur["schema-id"]
        bound = next(s for s in out["schemas"] if s.get("schema-id") == sid)
        assert [f["name"] for f in bound["fields"]] == ["id", "twice"]
        rows = client.read_view(spark, "db.s").collect()
        assert {(r.id, r.twice) for r in rows} == {
            (i, 2 * i) for i in range(10)
        }


def test_jdbc_catalog_views(spark, tmp_path):
    """JdbcUtil's third pointer table (iceberg_views): view rows visible
    to raw SQL, metadata doc in the warehouse, rename CAS-protected."""
    import sqlite3

    from iceberg_kafka_connect_spark.sinks.jdbc_catalog import JdbcCatalog

    cat = JdbcCatalog(
        str(tmp_path / "cat.db"), warehouse=str(tmp_path / "wh")
    )
    _seed(spark, cat)
    meta = cat.create_view(
        "db.odds", "SELECT id FROM db_base WHERE id % 2 = 1", spark=spark
    )
    assert meta["current-version-id"] == 1
    assert cat.view_exists("db.odds")
    assert cat.list_views() == ["db.odds"]
    # the pointer row is plain SQL, readable by any JDBC client
    con = sqlite3.connect(str(tmp_path / "cat.db"))
    rows = con.execute(
        "SELECT view_namespace, view_name, metadata_location "
        "FROM iceberg_views"
    ).fetchall()
    con.close()
    assert len(rows) == 1 and rows[0][:2] == ("db", "odds")
    assert rows[0][2].endswith("odds.view.json")
    # executes; replace advances the version
    assert sorted(
        r.id for r in cat.read_view(spark, "db.odds").collect()
    ) == [1, 3, 5, 7, 9]
    cat.replace_view("db.odds", "SELECT id FROM db_base WHERE id = 1")
    assert [r.id for r in cat.read_view(spark, "db.odds").collect()] == [1]
    # rename + duplicate + drop
    cat.rename_view("db.odds", "db2.odds")
    assert cat.list_views() == ["db2.odds"]
    with pytest.raises(ViewAlreadyExistsError):
        cat.create_view("db2.odds", "SELECT 1")
    cat.drop_view("db2.odds")
    assert not cat.view_exists("db2.odds")
    with pytest.raises(NoSuchViewError):
        cat.load_view("db2.odds")


def test_rest_view_commit_validation_is_atomic(spark, tmp_path):
    """Review fixes: every malformed body 400s at prepare with nothing
    written — set-current -1 with no add in the body, a dangling
    add-schema, a set-current targeting a version added only LATER in the
    body, a non-integer id — and renameView refuses a table name."""
    with IcebergRestServer(str(tmp_path / "wh")) as srv:
        client = RestCatalog(srv.uri)
        _seed(spark, client)
        client.create_view("db.w", "SELECT id FROM db_base")

        def commit(updates):
            return client._request(
                "POST", client._view_path("db.w"), {"updates": updates}
            )

        add = {
            "action": "add-view-version",
            "view-version": {
                "representations": [
                    {"type": "sql", "sql": "SELECT 1 AS one",
                     "dialect": "spark"}
                ]
            },
        }
        for bad in (
            # -1 means "the version added in this commit" — none added
            [{"action": "set-current-view-version", "view-version-id": -1}],
            # dangling add-schema: nothing consumes it -> silent no-op
            [{"action": "add-schema",
              "schema": {"type": "struct", "fields": []}}],
            # positional: version 2 exists only AFTER the add that follows
            [
                {"action": "set-properties", "updates": {"leak3": "y"}},
                {"action": "set-current-view-version", "view-version-id": 2},
                add,
            ],
            # non-integer id
            [{"action": "set-current-view-version",
              "view-version-id": "two"}],
        ):
            with pytest.raises(RestCatalogError) as ei:
                commit(bad)
            assert ei.value.code == 400, bad
        _, meta = client.load_view("db.w")
        assert meta["current-version-id"] == 1
        assert len(meta["versions"]) == 1
        assert "leak3" not in meta["properties"]
        # renaming a view onto an existing TABLE name is a 409
        with pytest.raises(RestCatalogError) as ei:
            client.rename_view("db.w", "db.base")
        assert ei.value.code == 409
        # ...and renaming a TABLE onto an existing view name is a 409
        # (the client maps the table-rename 409 to TableAlreadyExistsError)
        from iceberg_kafka_connect_spark.sinks.catalog import (
            TableAlreadyExistsError,
        )

        with pytest.raises(TableAlreadyExistsError):
            client.rename_table("db.base", "db.w")


def test_concurrent_view_replaces_never_lose_a_version(spark, tmp_path):
    """Review fix: add_version is serialized by a cross-process lock —
    N concurrent replaces yield exactly N new versions, none lost."""
    import threading

    cat = Catalog(str(tmp_path / "wh"))
    _seed(spark, cat)
    cat.create_view("db.cc", "SELECT id FROM db_base")
    n = 8
    errs = []

    def rep(i):
        try:
            cat.views.add_version(
                "db.cc",
                {
                    "representations": [
                        {
                            "type": "sql",
                            "sql": f"SELECT {i} AS i",
                            "dialect": "spark",
                        }
                    ]
                },
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=rep, args=(i,)) for i in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    _, meta = cat.views.load("db.cc")
    assert len(meta["versions"]) == 1 + n
    assert meta["current-version-id"] == 1 + n
    assert {v["version-id"] for v in meta["versions"]} == set(
        range(1, n + 2)
    )


# ------------------------------------------------------- property testing
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ops = st.lists(
    st.one_of(
        st.tuples(st.just("add"), st.booleans()),
        st.tuples(st.just("set_current"), st.integers(1, 12)),
        st.tuples(
            st.just("props"),
            st.sampled_from(["a", "b", "c"]),
            st.text(alphabet="xyz", min_size=0, max_size=3),
        ),
    ),
    min_size=0,
    max_size=12,
)


@given(_ops)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_view_store_matches_model(ops):
    """Random add_version / set_current / update_properties sequences
    against a trivial in-memory model: version ids are dense and
    monotonic, history is never lost, current always points at a real
    version, and the version-log records every current change."""
    import tempfile

    from iceberg_kafka_connect_spark.sinks.views import (
        ViewStore,
        sql_view_version,
    )

    with tempfile.TemporaryDirectory() as wh:
        store = ViewStore(wh)
        store.create(
            "db.m",
            {"type": "struct", "schema-id": 0, "fields": []},
            sql_view_version("SELECT 1"),
        )
        versions = [1]
        current = 1
        props: dict = {}
        for op in ops:
            if op[0] == "add":
                make_current = op[1]
                store.add_version(
                    "db.m",
                    {
                        "representations": [
                            {"type": "sql", "sql": "SELECT 2",
                             "dialect": "spark"}
                        ]
                    },
                    make_current=make_current,
                )
                versions.append(versions[-1] + 1)
                if make_current:
                    current = versions[-1]
            elif op[0] == "set_current":
                vid = op[1]
                if vid in versions:
                    store.set_current("db.m", vid)
                    current = vid
                else:
                    with pytest.raises(ValueError):
                        store.set_current("db.m", vid)
            else:
                store.update_properties("db.m", {op[1]: op[2]})
                props[op[1]] = op[2]
        _, meta = store.load("db.m")
        assert [v["version-id"] for v in meta["versions"]] == versions
        assert meta["current-version-id"] == current
        assert meta["properties"] == props
        assert current in {v["version-id"] for v in meta["versions"]}
        # version-log's last entry is the current version
        assert meta["version-log"][-1]["version-id"] == current


def test_concurrent_rest_view_replaces_serialize(spark, tmp_path):
    """N threads race replace_view through the HTTP server: the per-view
    lock serializes the read-modify-write commits, so all N versions land
    (none lost) and current advances to the last one."""
    import threading

    with IcebergRestServer(str(tmp_path / "wh")) as srv:
        client = RestCatalog(srv.uri)
        _seed(spark, client)
        client.create_view("db.race", "SELECT id FROM db_base")
        n = 6
        errs = []

        def rep(i):
            try:
                RestCatalog(srv.uri).replace_view(
                    "db.race", f"SELECT {i} AS i"
                )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=rep, args=(i,)) for i in range(n)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        _, meta = client.load_view("db.race")
        assert len(meta["versions"]) == 1 + n
        assert {v["version-id"] for v in meta["versions"]} == set(
            range(1, n + 2)
        )
        assert meta["current-version-id"] == 1 + n


def test_view_list_survives_child_named_metadata(tmp_path):
    """Pruning must skip the TABLE directory (the child holding metadata/),
    not the parent's own file scan — a table or sub-namespace literally
    named 'metadata' must not hide its sibling *.view.json docs."""
    from iceberg_kafka_connect_spark.sinks.views import (
        ViewStore,
        sql_view_version,
    )

    wh = tmp_path / "wh"
    store = ViewStore(str(wh))
    store.create(
        "db.v1", {"schema-id": 0, "fields": []}, sql_view_version("SELECT 1")
    )
    # a table named `metadata` inside the same namespace
    (wh / "db" / "metadata" / "metadata").mkdir(parents=True)
    (wh / "db" / "metadata" / "metadata" / "v0.json").write_text("{}")
    # and a plain table sibling whose data must still be pruned
    (wh / "db" / "t" / "metadata").mkdir(parents=True)
    (wh / "db" / "t" / "metadata" / "v0.json").write_text("{}")
    (wh / "db" / "t" / "data").mkdir()
    (wh / "db" / "t" / "data" / "junk.view.json").write_text("{}")
    assert store.list("db") == ["db.v1"]
    assert store.list() == ["db.v1"]


def test_rest_view_multi_update_commit_writes_once(spark, tmp_path, monkeypatch):
    """The UpdateViewRequest body applies to the in-memory document and
    hits disk exactly once — a crash mid-body can never leave a partially
    applied commit, and readers never observe intermediate states."""
    from iceberg_kafka_connect_spark.sinks import views as views_mod

    with IcebergRestServer(str(tmp_path / "wh")) as srv:
        client = RestCatalog(srv.uri)
        _seed(spark, client)
        client.create_view(
            "db.w", "SELECT id FROM db_base", schema=SCHEMA
        )
        writes = []
        real = views_mod._write_atomic
        monkeypatch.setattr(
            views_mod,
            "_write_atomic",
            lambda p, doc: (writes.append(p), real(p, doc)),
        )
        meta = client._request(
            "POST",
            client._view_path("db.w"),
            {
                "updates": [
                    {"action": "set-properties", "updates": {"a": "1"}},
                    {
                        "action": "add-view-version",
                        "view-version": {
                            "representations": [
                                {
                                    "type": "sql",
                                    "sql": "SELECT id FROM db_base WHERE id < 3",
                                    "dialect": "spark",
                                }
                            ],
                            "schema-id": 0,
                            "default-namespace": ["db"],
                        },
                    },
                    {
                        "action": "set-current-view-version",
                        "view-version-id": -1,
                    },
                ]
            },
        )["metadata"]
        assert len(writes) == 1
        assert meta["current-version-id"] == 2
        assert meta["properties"]["a"] == "1"
        got = sorted(r.id for r in client.read_view(spark, "db.w").collect())
        assert got == [0, 1, 2]


def test_rest_opposite_view_renames_never_deadlock(spark, tmp_path):
    """Two concurrent opposite renames (A→B and B→A) grab the two per-view
    locks in canonical order, so they serialize instead of deadlocking the
    handler threads forever."""
    import threading

    with IcebergRestServer(str(tmp_path / "wh")) as srv:
        client = RestCatalog(srv.uri)
        _seed(spark, client)
        client.create_view("db.a", "SELECT id FROM db_base", schema=SCHEMA)
        client.create_view("db.b", "SELECT v FROM db_base", schema=SCHEMA)
        errs: list[Exception] = []

        def _ren(src, dst):
            for _ in range(10):
                try:
                    client.rename_view(src, dst)
                except RestCatalogError:
                    pass  # losing the race is fine; hanging is not
                except Exception as e:  # noqa: BLE001
                    errs.append(e)

        t1 = threading.Thread(target=_ren, args=("db.a", "db.b"))
        t2 = threading.Thread(target=_ren, args=("db.b", "db.a"))
        t1.start(); t2.start()
        t1.join(timeout=30); t2.join(timeout=30)
        assert not t1.is_alive() and not t2.is_alive(), "rename deadlocked"
        assert not errs
        # exactly the two views still exist, under some pairing of names
        assert len(client.list_views("db")) == 2


def test_view_over_view_resolves(spark, tmp_path):
    """Layered views (standard in semantic models; the Iceberg view spec's
    SQL representations are engine-agnostic text, so views may reference
    views): resolution registers dependencies in topological order."""
    cat = Catalog(str(tmp_path / "wh"))
    _seed(spark, cat)
    cat.create_view(
        "db.lo", "SELECT id, v FROM db_base WHERE id >= 5", spark=spark
    )
    # schema inference at CREATE time must also resolve the sibling view
    meta = cat.create_view(
        "db.hi", "SELECT id FROM db_lo WHERE id < 8", spark=spark
    )
    assert [f["name"] for f in meta["schemas"][0]["fields"]] == ["id"]
    got = sorted(r.id for r in cat.read_view(spark, "db.hi").collect())
    assert got == [5, 6, 7]
    # three layers deep
    cat.create_view("db.top", "SELECT count(*) AS n FROM db_hi", spark=spark)
    assert cat.read_view(spark, "db.top").collect()[0].n == 3


def test_view_cycle_raises_typed_error(spark, tmp_path):
    from iceberg_kafka_connect_spark.sinks.views import ViewCycleError

    cat = Catalog(str(tmp_path / "wh"))
    _seed(spark, cat)
    # cycles can only be built without planning (spark=None)
    cat.create_view("db.a", "SELECT * FROM db_b")
    cat.create_view("db.b", "SELECT * FROM db_a")
    with pytest.raises(ViewCycleError, match="db.a -> db.b -> db.a"):
        cat.read_view(spark, "db.a")
    cat.create_view("db.selfy", "SELECT * FROM db_selfy")
    with pytest.raises(ViewCycleError, match="cycle"):
        cat.read_view(spark, "db.selfy")


def test_read_view_registers_only_referenced_relations(
    spark, tmp_path, monkeypatch
):
    """A warehouse with many tables must not be re-materialized per view
    read — only the relations the view SQL (transitively) references are
    loaded."""
    cat = Catalog(str(tmp_path / "wh"))
    _seed(spark, cat)
    for i in range(3):
        cat.create_table(f"db.unrelated{i}", SCHEMA)
    cat.create_view("db.only", "SELECT id FROM db_base")
    loaded: list[str] = []
    orig = Catalog.load_table
    monkeypatch.setattr(
        Catalog,
        "load_table",
        lambda self, n: (loaded.append(n), orig(self, n))[1],
    )
    assert cat.read_view(spark, "db.only").count() == 10
    assert set(loaded) == {"db.base"}


def test_view_over_view_rest_and_jdbc(spark, tmp_path):
    """Layered views resolve through the REST and JDBC catalogs too."""
    from iceberg_kafka_connect_spark.sinks.jdbc_catalog import JdbcCatalog

    with IcebergRestServer(str(tmp_path / "rwh")) as srv:
        client = RestCatalog(srv.uri)
        _seed(spark, client)
        client.create_view(
            "db.lo", "SELECT id FROM db_base WHERE id >= 5", schema=SCHEMA
        )
        client.create_view("db.hi", "SELECT id FROM db_lo WHERE id < 8")
        got = sorted(r.id for r in client.read_view(spark, "db.hi").collect())
        assert got == [5, 6, 7]

    jcat = JdbcCatalog(
        str(tmp_path / "cat.sqlite"), warehouse=str(tmp_path / "jwh")
    )
    _seed(spark, jcat)
    jcat.create_view("db.lo", "SELECT id FROM db_base WHERE id >= 7", spark=spark)
    jcat.create_view("db.hi", "SELECT id FROM db_lo WHERE id < 9", spark=spark)
    got = sorted(r.id for r in jcat.read_view(spark, "db.hi").collect())
    assert got == [7, 8]
