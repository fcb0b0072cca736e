"""NL→SQL heuristic tests (reference X2/X3 rule set, no LLM required)."""

from __future__ import annotations

import pytest

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (
    Engine,
)
from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.plans import (
    nl,
)

TABLES = {
    "students": ["id", "name", "course"],
    "orders": ["order_id", "amount", "status"],
}


def test_is_natural_language():
    assert not nl.is_natural_language("SELECT * FROM students")
    assert not nl.is_natural_language("  update t set a = 1")
    assert nl.is_natural_language("how many students are there?")
    assert nl.is_natural_language("show me everything")


def test_match_table_by_name_and_columns():
    assert nl.match_table("how many students?", TABLES) == "students"
    assert nl.match_table("show every order", TABLES) == "orders"
    # column-keyword scoring when no table name is mentioned
    assert nl.match_table("which course has the best amount?", TABLES) in TABLES


def test_count_template():
    assert nl.nl_to_sql("how many students are there?", TABLES) == "SELECT COUNT(*) FROM students"


def test_show_all_template():
    assert nl.nl_to_sql("show all orders", TABLES) == "SELECT * FROM orders"


def test_numeric_where_extraction():
    sql = nl.nl_to_sql("show orders with amount more than 500", TABLES)
    assert sql == "SELECT * FROM orders WHERE amount > 500"
    sql = nl.nl_to_sql("how many orders have amount at least 100?", TABLES)
    assert sql == "SELECT COUNT(*) FROM orders WHERE amount >= 100"
    sql = nl.nl_to_sql("orders with amount under 50", TABLES)
    assert sql == "SELECT * FROM orders WHERE amount < 50"


def test_value_sampling_where():
    samples = {"status": ["OPEN", "CLOSED"], "course": []}
    sql = nl.nl_to_sql(
        "show closed orders", TABLES, samples_fn=lambda t: samples
    )
    assert sql == "SELECT * FROM orders WHERE status = 'CLOSED'"


def test_delete_requires_condition():
    with pytest.raises(ValueError):
        nl.nl_to_sql("delete all orders", TABLES)
    sql = nl.nl_to_sql("delete orders with amount more than 900", TABLES)
    assert sql == "DELETE FROM orders WHERE amount > 900"


def test_no_matching_table():
    with pytest.raises(ValueError):
        nl.nl_to_sql("what is the weather like?", TABLES)


def test_end_to_end_ask(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "db"))
    e.create_table("students", [("id", "INT"), ("name", "TEXT"), ("course", "TEXT")])
    e.insert_rows(
        "students",
        [
            {"id": 1, "name": "Noel", "course": "Mech"},
            {"id": 2, "name": "Abel", "course": "AI/ML"},
            {"id": 6, "name": "Frank", "course": "Mech"},
        ],
    )
    sql, df = nl.ask(e, "how many students are there?")
    assert sql == "SELECT COUNT(*) FROM students"
    assert df.first()["count"] == 3

    sql, df = nl.ask(e, "show students with id more than 1")
    assert df.count() == 2

    # enum-value sampling: 'mech' maps onto course='Mech'
    sql, df = nl.ask(e, "how many students take Mech?")
    assert sql == "SELECT COUNT(*) FROM students WHERE course = 'Mech'"
    assert df.first()["count"] == 2


def test_repl_run_statement(spark, tmp_path):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.__main__ import (
        run_statement,
    )

    e = Engine(spark, str(tmp_path / "repl"))
    assert run_statement(e, "CREATE TABLE t (a INT, b TEXT)") == "OK"
    assert "2 row(s)" in run_statement(e, "INSERT INTO t VALUES (1, 'x'), (2, 'y')")
    out = run_statement(e, "SELECT * FROM t ORDER BY a")
    assert out.splitlines()[0].startswith("a") and "x" in out
    assert run_statement(e, "show tables") == "t"
    assert "image dir set" in run_statement(e, "SET IMAGE DIR /tmp/imgs")
    assert run_statement(e, "SHOW IMAGE DIR") == "/tmp/imgs"
    nl_out = run_statement(e, "how many t are there?")
    assert nl_out.startswith("-- SELECT COUNT(*)")
    # the r5 dialect verbs route as SQL through the sniffer, not as NL
    assert run_statement(e, "ALTER TABLE t ADD COLUMN c DECIMAL") == (
        "altered 't': added c DECIMAL"
    )
    assert "Physical Plan" in run_statement(e, "EXPLAIN SELECT a FROM t WHERE a > 1")


def test_llm_to_sql_against_stub_endpoint():
    # X2 is endpoint-gated (no Ollama in CI); a stub HTTP server exercises
    # the full request/response path: schema-context prompt assembly, JSON
    # envelope, markdown fence stripping, first-statement truncation
    # (reference main.go:219-266,688-752).
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.plans.nl import (
        llm_to_sql,
    )

    seen = {}

    class Stub(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            seen.update(body)
            resp = json.dumps(
                {"response": "```sql\nSELECT name FROM students WHERE grade > 90;\nSELECT 2;\n```"}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Stub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        sql = llm_to_sql(
            "top students?",
            "students(name TEXT, grade INT)",
            endpoint=f"http://127.0.0.1:{srv.server_address[1]}/api/generate",
        )
    finally:
        srv.shutdown()
        t.join(timeout=5)
    assert sql == "SELECT name FROM students WHERE grade > 90"
    assert seen["stream"] is False and seen["options"]["temperature"] == 0.1
    assert "students(name TEXT, grade INT)" in seen["prompt"]
    assert "top students?" in seen["prompt"]


def test_is_natural_language_knows_round5_verbs():
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.plans.nl import (
        is_natural_language,
    )

    assert not is_natural_language("SUMMARIZE orders")
    assert not is_natural_language("REFRESH MATERIALIZED VIEW mv")
    assert not is_natural_language("SHOW MATERIALIZED VIEWS")
    # NL phrasings stay NL
    assert is_natural_language("summarize the sales by region please")
    assert is_natural_language("show me all students")


def test_round9_verbs_sniff_as_sql():
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.plans.nl import (
        is_natural_language,
    )

    assert not is_natural_language("SHOW VECTOR INDEXES")
    assert not is_natural_language(
        "SEARCH vi K 10 USING SELECT embedding FROM embeddings WHERE vec_id = 7"
    )
    assert not is_natural_language("DIFF v FROM VERSION 0 TO CURRENT")
    # the NL shapes stay NL
    assert is_natural_language("search for the best students")
    assert is_natural_language("diff these two answers for me")
    assert is_natural_language("show me every vector in the table")


def test_values_statement_is_sql_not_nl():
    """Round-10: 'VALUES (1, ...)' is the SQL table constructor; prose
    starting with the word 'values' stays NL."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.plans.nl import (
        is_natural_language,
    )

    assert not is_natural_language("VALUES (1, 'a'), (2, 'b')")
    assert not is_natural_language("values(1)")
    assert is_natural_language("values matter to this team")


def test_truncate_sniffs_as_sql():
    """Round-11: 'TRUNCATE [TABLE] t' routes as SQL; truncate-prose
    stays NL."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.plans.nl import (
        is_natural_language,
    )

    assert not is_natural_language("TRUNCATE TABLE events")
    assert not is_natural_language("truncate events")
    assert is_natural_language("truncate this essay to one hundred words")
