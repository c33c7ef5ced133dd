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


class _MiniSMTP:
    """Minimal in-process SMTP server: enough of RFC 5321 for smtplib's
    EHLO/MAIL/RCPT/DATA/QUIT happy path, capturing the message body."""

    def __init__(self):
        import socket
        import threading

        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.messages: list[str] = []
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        conn, _ = self.sock.accept()
        f = conn.makefile("rb")
        conn.sendall(b"220 mini ESMTP\r\n")
        data_mode, buf = False, []
        while True:
            line = f.readline()
            if not line:
                break
            if data_mode:
                if line == b".\r\n":
                    self.messages.append(b"".join(buf).decode("utf-8"))
                    conn.sendall(b"250 OK\r\n")
                    data_mode, buf = False, []
                else:
                    buf.append(line)
                continue
            cmd = line.decode("latin-1").strip().upper()
            if cmd.startswith("EHLO") or cmd.startswith("HELO"):
                conn.sendall(b"250-mini\r\n250 OK\r\n")
            elif cmd.startswith("MAIL") or cmd.startswith("RCPT"):
                conn.sendall(b"250 OK\r\n")
            elif cmd.startswith("DATA"):
                conn.sendall(b"354 go\r\n")
                data_mode = True
            elif cmd.startswith("QUIT"):
                conn.sendall(b"221 bye\r\n")
                break
            else:
                conn.sendall(b"250 OK\r\n")
        conn.close()


def test_send_report_smtp_transport():
    # Real SMTP conversation against an in-process server: the message
    # must carry the HTML report; a failure path and the unconfigured
    # path must return False without raising.
    from evolution_data_warehouse_spark.operators.etl_log import (
        notify_from_env,
        send_report,
    )

    report = {
        "ok": True,
        "steps": [
            {"name": "load", "status": "OK", "rows": 42,
             "duration_sec": 1.5, "error": ""},
        ],
    }
    srv = _MiniSMTP()
    cfg = {
        "host": "127.0.0.1", "port": srv.port,
        "user": "etl@example.org", "to": "ops@example.org",
    }
    assert send_report(report, cfg, use_tls=False) is True
    srv.thread.join(timeout=5)
    assert len(srv.messages) == 1
    import email
    from email.header import decode_header

    msg = email.message_from_string(srv.messages[0])
    subj = "".join(
        part.decode(enc or "utf-8") if isinstance(part, bytes) else part
        for part, enc in decode_header(msg["Subject"])
    )
    assert "Rapport ETL" in subj and "SUCCES" in subj
    html_parts = [
        p for p in msg.walk() if p.get_content_type() == "text/html"
    ]
    assert len(html_parts) == 1
    html = html_parts[0].get_payload(decode=True).decode("utf-8")
    assert "Rapport ETL" in html and "load" in html and "42" in html

    # unconfigured → logged no-op
    assert send_report(report, {"host": "127.0.0.1"}) is False
    assert notify_from_env(report, env={}) is False

    # connection refused → False, never raises
    assert (
        send_report(
            report,
            {"host": "127.0.0.1", "port": 1, "user": "u", "to": "t"},
            use_tls=False,
            timeout=2,
        )
        is False
    )


def test_blocklist_matches_positions_and_lengths(spark):
    """Multi-length dictionary matching: exact 1-based token positions,
    overlapping hits of different lengths both reported, lowercase
    matching, and within-doc repeats each reported once per position."""
    from evolution_data_warehouse_spark.operators.quality import (
        blocklist_matches,
    )

    docs = spark.createDataFrame(
        [
            (1, "Bad Word here bad word"),
            (2, "totally clean text"),
            (3, "word bad word salad"),
        ],
        "doc_id long, text string",
    )
    bl = [("bad word", 2), ("word", 1), ("clean", 1)]
    got = sorted(
        (r.doc_id, r.pos, r.phrase, r.severity)
        for r in blocklist_matches(docs, bl).collect()
    )
    assert got == [
        (1, 1, "bad word", 2),
        (1, 2, "word", 1),
        (1, 4, "bad word", 2),
        (1, 5, "word", 1),
        (2, 2, "clean", 1),
        (3, 1, "word", 1),
        (3, 2, "bad word", 2),
        (3, 3, "word", 1),
    ]
    # mixed-case dictionary entries match (both sides are lowered) and
    # an empty dynamic blocklist yields an empty, correctly-typed frame
    upper = blocklist_matches(docs, [("BAD Word", 3)]).collect()
    assert [(r.doc_id, r.pos) for r in sorted(upper)] == [(1, 1), (1, 4), (3, 2)]
    empty = blocklist_matches(docs, [])
    assert empty.count() == 0
    assert empty.columns == ["doc_id", "pos", "phrase", "severity"]
    # the empty-blocklist schema tracks the INPUT's id type (r8 ADVICE:
    # a hardcoded `doc_id long` diverged from the non-empty path for
    # string/int ids)
    sdocs = spark.createDataFrame(
        [("a", "bad word")], "doc_id string, text string"
    )
    assert (
        blocklist_matches(sdocs, []).schema
        == blocklist_matches(sdocs, [("bad word", 1)]).schema
    )
