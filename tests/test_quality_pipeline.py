"""Quality validators + pipeline DAG + ETL logging tests."""

from __future__ import annotations

import pytest

from evolution_data_warehouse_spark.operators.etl_log import (
    log_event,
    logged_step,
    monitoring_summary,
    read_log,
)
from evolution_data_warehouse_spark.operators.quality import (
    duplicate_keys,
    negative_values,
    orphan_keys,
    run_validations,
)
from evolution_data_warehouse_spark.pipeline import Step, run_pipeline


@pytest.fixture(scope="module")
def fact(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (9, 3.0), (2, 4.0)],
        schema="dim_id int, measure double",
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([(1,), (2,), (3,)], schema="dim_id int")


def test_orphan_keys(spark, fact, dim):
    orphans = orphan_keys(fact, dim, "dim_id")
    assert [r.dim_id for r in orphans.collect()] == [9]


def test_negative_and_duplicates(spark, fact):
    assert negative_values(fact, "measure").count() == 1
    dups = duplicate_keys(fact, "dim_id")
    assert {r.dim_id for r in dups.collect()} == {2}


def test_run_validations(spark, fact, dim):
    results = run_validations(
        {
            "orphans": orphan_keys(fact, dim, "dim_id"),
            "negatives": negative_values(fact, "measure"),
            "clean": negative_values(dim, "dim_id"),
        }
    )
    by_name = {r.name: r for r in results}
    assert not by_name["orphans"].ok and by_name["orphans"].violations == 1
    assert not by_name["negatives"].ok
    assert by_name["clean"].ok


def test_pipeline_cascade_skip():
    ran = []

    def ok(name):
        def _run():
            ran.append(name)
            return 1
        return _run

    def boom():
        raise RuntimeError("staging blew up")

    steps = [
        Step("staging", boom),
        Step("security", ok("security")),
        Step("dimensions", ok("dimensions"), depends_on=["staging"]),
        Step("facts", ok("facts"), depends_on=["dimensions"]),
        Step("refresh", ok("refresh"), depends_on=["facts", "security"]),
    ]
    report = run_pipeline(steps)
    statuses = {r.name: r.status for r in report.results}
    # run_etl.py:206-224 semantics: failure cascades to dependents only.
    assert statuses == {
        "staging": "ERREUR",
        "security": "OK",
        "dimensions": "IGNORE",
        "facts": "IGNORE",
        "refresh": "IGNORE",
    }
    assert not report.ok
    assert ran == ["security"]
    assert report.as_dict()["steps"][0]["error"].startswith("staging blew up")


def test_pipeline_explicit_skip():
    report = run_pipeline(
        [Step("a", lambda: 1), Step("b", lambda: 2, depends_on=["a"])],
        skip=["a"],
    )
    statuses = {r.name: r.status for r in report.results}
    assert statuses == {"a": "SKIP", "b": "OK"}
    assert report.ok


def test_etl_logging(spark, tmp_path):
    log_dir = str(tmp_path / "log_etl")
    log_event(spark, log_dir, "staging", "stg_population", "OK", lignes=100)
    with pytest.raises(ValueError):
        with logged_step(spark, log_dir, "facts", "fait_population") as info:
            info["lignes"] = 5
            raise ValueError("bad rows")
    with logged_step(spark, log_dir, "facts", "fait_population") as info:
        info["lignes"] = 50

    log = read_log(spark, log_dir)
    assert log.count() == 3
    summary = monitoring_summary(log)
    facts = summary.filter(summary.nom_table == "fait_population").first()
    assert facts.n_executions == 2 and facts.n_erreurs == 1


def test_report_html_render():
    from evolution_data_warehouse_spark.operators.etl_log import (
        render_report_html,
    )

    report = run_pipeline([Step("a", lambda: 3), Step("b", lambda: 1/0)])
    html = render_report_html(report.as_dict())
    assert "ECHEC" in html and "ERREUR" in html and "<table" in html
    ok_report = run_pipeline([Step("a", lambda: 3)])
    assert "SUCCES" in render_report_html(ok_report.as_dict())
