"""DDL / DML / COPY and the CLI shell.

The reference rides PostgreSQL for all of these; here the engine is the
database, so CREATE/INSERT/COPY and an interactive shell are part of the
product surface.
"""

import os
import tempfile

import pytest

from pg_strom_tpu.datastore import Database
from pg_strom_tpu.sql import execute
from pg_strom_tpu.errors import SqlError


@pytest.fixture()
def db():
    db = Database()
    execute("create table emp (id int, name text, salary numeric(10,2), "
            "hired date, active boolean)", db)
    execute("insert into emp values "
            "(1, 'ada', 120000.50, '2020-01-15', true), "
            "(2, 'bob', 95000, '2021-06-01', true), "
            "(3, 'eve', 87000.25, '2019-03-10', false)", db)
    return db


class TestDDL:
    def test_create_insert_select(self, db):
        r = execute("select count(*), sum(salary) from emp", db)
        from decimal import Decimal
        assert r.rows == [(3, Decimal("302000.75"))]

    def test_date_and_bool_ingest(self, db):
        r = execute("select name from emp where active "
                    "order by hired", db).rows
        assert r == [("ada",), ("bob",)]
        r = execute("select min(hired) from emp", db).formatted(-3)
        assert r == ["2019-03-10"]

    def test_partial_column_insert_nulls(self, db):
        execute("insert into emp (id, name) values (4, 'kim')", db)
        r = execute("select count(*), count(salary) from emp", db).rows
        assert r == [(4, 3)]

    def test_insert_select(self, db):
        execute("create table e2 (id int, nm text)", db)
        execute("insert into e2 select id, name from emp where id < 3", db)
        assert execute("select count(*) from e2", db).rows == [(2,)]

    def test_insert_arity_mismatch(self, db):
        with pytest.raises(SqlError):
            execute("insert into emp (id, name) values (9)", db)

    def test_create_if_not_exists_and_drop(self, db):
        execute("create table if not exists emp (id int)", db)  # no-op
        assert execute("select count(*) from emp", db).rows == [(3,)]
        execute("drop table if exists nothere", db)
        execute("drop table emp", db)
        with pytest.raises(KeyError):
            execute("select 1 from emp", db)

    def test_copy_csv(self, db):
        fd, path = tempfile.mkstemp(suffix=".csv")
        os.close(fd)
        try:
            with open(path, "w") as f:
                f.write("id,name,salary,hired,active\n"
                        "5,zoe,101000,2022-02-02,t\n"
                        "6,max,,2023-08-08,f\n")
            r = execute(f"copy emp from '{path}' with (format csv, header)",
                        db)
            assert r.command == "COPY 2"
            rows = execute("select count(*), count(salary) from emp", db).rows
            assert rows == [(5, 4)]
        finally:
            os.unlink(path)


class TestShell:
    def test_run_stmt_and_describe(self, capsys, db):
        from pg_strom_tpu.cli import Shell
        sh = Shell()
        sh.db = db
        sh.run_stmt("select id, name from emp order by id limit 2")
        out = capsys.readouterr().out
        assert "ada" in out and "(2 rows)" in out
        assert sh.backslash("\\d emp")
        out = capsys.readouterr().out
        assert "salary" in out
        assert not sh.backslash("\\q")

    def test_run_file(self, tmp_path, capsys):
        from pg_strom_tpu.cli import Shell
        f = tmp_path / "s.sql"
        f.write_text("create table t (x int);\n"
                     "insert into t values (1), (2), (3);\n"
                     "select sum(x) from t;\n")
        sh = Shell()
        sh.run_file(str(f))
        assert "6" in capsys.readouterr().out


class TestNativeCopy:
    """Int/float-only COPY targets ride the native parallel CSV loader
    (sql/api._copy_native); must match the python path exactly, and must
    fall back to it for NULLs-are-fine-but-malformed/overflow cases."""

    def _mkfile(self, lines):
        fd, path = tempfile.mkstemp(suffix=".csv")
        os.close(fd)
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        return path

    def _run_copy(self, body, force_python=False):
        from pg_strom_tpu.datastore import Database
        import pg_strom_tpu.sql.api as api
        db = Database()
        execute("create table nt (a int2, b int8, x float4, y float8)", db)
        path = self._mkfile(body)
        orig = api._copy_native
        try:
            if force_python:
                api._copy_native = lambda *a: None
            execute(f"copy nt from '{path}'", db)
        finally:
            api._copy_native = orig
            os.unlink(path)
        return execute("select * from nt order by b", db).rows

    def test_matches_python_path(self):
        body = ["1,10,1.5,2.5", ",20,,-0.125", "-7,30,3.25,"]
        assert self._run_copy(body) == self._run_copy(body,
                                                      force_python=True)

    def test_fast_path_engaged(self):
        import pg_strom_tpu.sql.api as api
        from pg_strom_tpu.datastore import Database
        db = Database()
        execute("create table nt (a int4, b float8)", db)
        path = self._mkfile(["1,2.5", "2,"])
        calls = {}
        orig = api._copy_python
        try:
            api._copy_python = lambda *a: calls.setdefault("py", True) or 0
            execute(f"copy nt from '{path}'", db)
        finally:
            api._copy_python = orig
            os.unlink(path)
        assert "py" not in calls, "native COPY path did not engage"
        assert execute("select count(*), count(b) from nt", db).rows \
            == [(2, 1)]

    def test_overflow_falls_back_with_pg_error(self):
        from pg_strom_tpu.errors import SqlError
        from pg_strom_tpu.datastore import Database
        db = Database()
        execute("create table nt (a int2)", db)
        path = self._mkfile(["40000"])      # > int2 range
        try:
            with pytest.raises(SqlError):
                execute(f"copy nt from '{path}'", db)
        finally:
            os.unlink(path)


class TestNativeCopyExtended:
    """COPY via the native parallel loader for date/text/numeric columns
    (VERDICT round-1 item 7: the loader previously handled only int/float
    lanes, so string-bearing tables fell back to the slow python path)."""

    def _db(self):
        from pg_strom_tpu.datastore import Database
        from pg_strom_tpu.sql.api import execute
        db = Database()
        execute("create table mix (id int4, x float8, d date, "
                "name text, n numeric)", db)
        return db

    def _write(self, tmp_path, body):
        f = tmp_path / "data.csv"
        f.write_text(body)
        return str(f)

    def test_native_path_taken_and_exact(self, tmp_path):
        import pg_strom_tpu.sql.api as api
        from pg_strom_tpu.datastore import Database
        from pg_strom_tpu.sql.api import execute
        body = "".join(
            f"{i},{i * 0.25},2023-0{1 + i % 9}-1{i % 3},nm{i % 7},{i}.5\n"
            for i in range(500))
        fn = self._write(tmp_path, body)
        db = self._db()
        orig = api._copy_native
        hit = {}

        def wrapped(stmt, db2, tbl):
            r = orig(stmt, db2, tbl)
            hit["native"] = r is not None
            return r

        api._copy_native = wrapped
        try:
            r = execute(f"copy mix from '{fn}' with (format csv)", db)
        finally:
            api._copy_native = orig
        assert hit["native"] is True
        assert r.command == "COPY 500"
        # python-path twin must agree value-for-value
        db2 = self._db()
        from pg_strom_tpu.sql import parser as ast
        api._copy_python(ast.parse(f"copy mix from '{fn}' with (format csv)"),
                         db2, db2.get("mix"))
        q = ("select mix.id, mix.x, mix.d, mix.name, mix.n from mix "
             "order by mix.id")
        assert execute(q, db).rows == execute(q, db2).rows

    def test_nulls_and_appends_merge_dictionaries(self, tmp_path):
        from pg_strom_tpu.sql.api import execute
        db = self._db()
        execute("insert into mix values (1, 0.5, '2024-01-15', 'zed', 1.25)",
                db)
        fn = self._write(tmp_path, "2,,2020-06-09,alpha,-3.07\n3,1.5,,,\n")
        execute(f"copy mix from '{fn}' with (format csv)", db)
        rows = execute("select mix.id, mix.name, mix.n from mix "
                       "order by mix.id", db).rows
        from decimal import Decimal
        assert rows == [(1, "zed", Decimal("1.25")),
                        (2, "alpha", Decimal("-3.07")),
                        (3, None, None)]

    def test_bad_date_falls_back_to_exact_errors(self, tmp_path):
        import pytest
        from pg_strom_tpu.sql.api import execute
        db = self._db()
        fn = self._write(tmp_path, "2,1.0,2023-02-31,x,1\n")
        with pytest.raises(Exception):
            execute(f"copy mix from '{fn}' with (format csv)", db)

    def test_arena_shows_live_planes(self, tmp_path):
        from pg_strom_tpu.datastore import Database
        from pg_strom_tpu.sql.api import execute
        db = Database()
        execute("create table b2 (id int8, x float8)", db)
        body = "".join(f"{i},{i * 0.5}\n" for i in range(20000))
        fn = self._write(tmp_path, body)
        execute(f"copy b2 from '{fn}' with (format csv)", db)
        live = execute("select * from pgstrom_arena_info", db).rows
        assert any(r[2] > 0 for r in live)      # bytes_live > 0
        s = execute("select sum(b2.x) from b2", db).scalar()
        assert s == sum(i * 0.5 for i in range(20000))
