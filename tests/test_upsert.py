"""RDBMS-upsert machinery tests (no database: statement building,
paging, retry policy — the executor-side pieces that are pure logic)."""

import pytest

from getl_spark.common import upsert
from getl_spark.plans.executor import redact


def test_paged_batches():
    rows = iter([(i, f"v{i}") for i in range(2500)])
    pages = list(upsert._paged(rows, 1000))
    assert [len(p) for p in pages] == [1000, 1000, 500]
    assert pages[0][0] == (0, "v0")


def test_paged_empty():
    assert list(upsert._paged(iter([]), 10)) == []


def test_with_retry_succeeds_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert upsert._with_retry(flaky, max_tries=5, sleep=0) == "ok"
    assert calls["n"] == 3


def test_with_retry_exhausts():
    def always_fails():
        raise RuntimeError("fatal")

    with pytest.raises(RuntimeError, match="fatal"):
        upsert._with_retry(always_fails, max_tries=2, sleep=0)


def test_postgres_statement_shape(monkeypatch):
    captured = {}

    def fake_foreach(run_partition):
        captured["fn"] = run_partition

    class FakeDF:
        def foreachPartition(self, fn):
            fake_foreach(fn)

        def select(self, *cols):
            captured["cols"] = cols
            return self

    upsert.postgres_upsert(
        FakeDF(),
        conn_url="postgresql://h/db",
        user="u",
        password="p",
        table="t",
        columns=["a", "b", "c"],
        conflict_columns=["a"],
    )
    # update columns default to columns − conflict columns
    assert captured["cols"] == ("a", "b", "c")


def test_secret_redaction():
    params = {
        "Properties": {
            "ConnUrl": "jdbc:...",
            "Password": "hunter2",
            "ApiToken": "abc",
            "Nested": [{"ClientSecret": "x", "Name": "ok"}],
        }
    }
    clean = redact(params)
    assert clean["Properties"]["Password"] == "***"
    assert clean["Properties"]["ApiToken"] == "***"
    assert clean["Properties"]["Nested"][0]["ClientSecret"] == "***"
    assert clean["Properties"]["Nested"][0]["Name"] == "ok"
    assert params["Properties"]["Password"] == "hunter2"  # original untouched


def test_storage_path_local_roundtrip(tmp_path):
    from getl_spark.common.path import StoragePath

    base = StoragePath(str(tmp_path))
    f = base / "sub" / "a.txt"
    f.write_text("hello")
    assert f.exists() and f.read_text() == "hello"
    (base / "sub" / "b.json").write_text("{}")
    found = [str(p) for p in base.glob(".txt")]
    assert found == [str(tmp_path / "sub" / "a.txt")]
    g = base / "copy.txt"
    f.copy(g)
    assert g.read_text() == "hello"
    f.delete()
    assert not f.exists() and g.exists()
    assert (base / "x") / "" == base / "x"
