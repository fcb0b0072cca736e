"""Natural-language → SQL adapter (reference X2/X3, SURVEY.md §2.9).

The reference converts NL to SQL two ways: pattern heuristics (CLI
``main.go:306-606``, server ``cmd/server/main.go:564-902``) with table
matching, numeric-phrase WHERE extraction, and enum-value sampling from the
first 40 rows; plus an optional Ollama/llama3 call with a schema-context
prompt (``main.go:219-266,609-651``). This is a fresh Python implementation
of the same rule set over our catalog, emitting the reference SQL dialect
(plans/refsql.py) so the output is runnable on either engine.

The LLM path is optional and endpoint-gated: ``llm_to_sql`` talks to an
Ollama-compatible HTTP endpoint if one is reachable, else raises — the
heuristics never require it.
"""

from __future__ import annotations

import json
import re
import urllib.request

SAMPLE_ROWS = 40  # value sampling depth, mirroring the reference's 40-row scan

_NUM_OPS = [
    # phrase → operator; longest-first so "more than or equal" wins over "more than"
    ("greater than or equal to", ">="),
    ("less than or equal to", "<="),
    ("more than", ">"),
    ("greater than", ">"),
    ("at least", ">="),
    ("less than", "<"),
    ("fewer than", "<"),
    ("at most", "<="),
    ("under", "<"),
    ("over", ">"),
    ("above", ">"),
    ("below", "<"),
    ("equal to", "="),
    ("equals", "="),
]

_COUNT_PAT = re.compile(r"\b(how many|count of|number of|total number of)\b", re.I)
_SHOW_PAT = re.compile(r"\b(show|list|display|give me|get)\b(\s+(all|me|every))?\b", re.I)
_DELETE_PAT = re.compile(r"\b(delete|remove)\b", re.I)
_DROP_PAT = re.compile(r"\bdrop\s+(the\s+)?table\b", re.I)


def _words(text: str) -> list[str]:
    return re.findall(r"[a-zA-Z0-9_']+", text.lower())


def _singular(w: str) -> str:
    return w[:-1] if w.endswith("s") and len(w) > 3 else w


def match_table(nl: str, catalog_tables: dict[str, list[str]]) -> str | None:
    """Best table for the question: exact/singular name mention first, then
    column-keyword overlap scoring (reference table-matching,
    server main.go:608-687)."""
    words = {_singular(w) for w in _words(nl)}
    best, best_score = None, 0
    for table, columns in catalog_tables.items():
        score = 0
        if _singular(table.lower()) in words:
            score += 10
        score += sum(2 for c in columns if _singular(c.lower()) in words)
        if score > best_score:
            best, best_score = table, score
    return best


def extract_numeric_where(nl: str, columns: list[str]) -> str | None:
    """'<col> more than N' phrases → predicates (server main.go:690-755)."""
    low = nl.lower()
    for col in columns:
        cl = col.lower()
        for phrase, op in _NUM_OPS:
            m = re.search(
                rf"\b{re.escape(cl)}\b[^0-9]*?\b{re.escape(phrase)}\b\s*(-?\d+(?:\.\d+)?)",
                low,
            )
            if m:
                return f"{col} {op} {m.group(1)}"
            m = re.search(
                rf"\b{re.escape(phrase)}\b\s*(-?\d+(?:\.\d+)?)\s*\b{re.escape(cl)}\b",
                low,
            )
            if m:
                return f"{col} {op} {m.group(1)}"
    return None


def extract_value_where(
    nl: str, samples: dict[str, list[str]], exclude: set[str] | None = None
) -> str | None:
    """Map question words onto sampled column values (enum matching from the
    first 40 data rows, server main.go:808-902). Single- and two-word values
    are probed; longest match wins."""
    exclude = exclude or set()
    words = _words(nl)
    grams = [" ".join(words[i : i + k]) for k in (2, 1) for i in range(len(words) - k + 1)]
    for gram in grams:
        if gram in exclude:
            continue
        for col, vals in samples.items():
            for v in vals:
                if v.lower() == gram:
                    return f"{col} = '{v}'"
    return None


def nl_to_sql(
    nl: str,
    catalog_tables: dict[str, list[str]],
    samples_fn=None,
    prev_table: str | None = None,
) -> str:
    """Heuristic NL → reference-dialect SQL. Raises ValueError when no rule
    matches (the reference falls through to its LLM in that case).

    ``prev_table`` is conversation context: when the question names no table
    ("among these, how many are active?"), fall back to the table of the
    previous answer — the reference's prevTable mechanism
    (cmd/server/main.go:413-433,610-621)."""
    table = match_table(nl, catalog_tables)
    if table is None and prev_table in catalog_tables:
        table = prev_table
    if table is None:
        raise ValueError(f"no table matches question: {nl!r}")
    columns = catalog_tables[table]

    where = extract_numeric_where(nl, columns)
    if where is None and samples_fn is not None:
        table_words = {_singular(table.lower())} | {
            _singular(c.lower()) for c in columns
        }
        where = extract_value_where(nl, samples_fn(table), exclude=table_words)
    where_sql = f" WHERE {where}" if where else ""

    if _DROP_PAT.search(nl):
        return f"DROP TABLE {table}"
    if _DELETE_PAT.search(nl):
        if not where:
            raise ValueError("refusing DELETE without an extractable condition")
        return f"DELETE FROM {table}{where_sql}"
    if _COUNT_PAT.search(nl):
        return f"SELECT COUNT(*) FROM {table}{where_sql}"
    if _SHOW_PAT.search(nl):
        return f"SELECT * FROM {table}{where_sql}"
    # Default: a filtered/plain scan (reference's final fallback).
    return f"SELECT * FROM {table}{where_sql}"


def is_natural_language(text: str) -> bool:
    """NL-vs-SQL sniff (reference main.go:124-183): SQL verbs in leading
    position ⇒ SQL; question words / no recognized verb ⇒ NL."""
    words = [w.lower() for w in text.strip().split()] or [""]
    first = words[0]
    if first == "show":
        # 'SHOW TABLES' / 'SHOW VERSIONS FOR t' / 'SHOW MATERIALIZED VIEWS'
        # / 'SHOW VECTOR INDEXES' are SQL; 'show me all students' is NL.
        return not (
            len(words) > 1
            and words[1] in ("tables", "versions", "materialized", "vector")
        )
    if first == "search":
        # 'SEARCH vi K 10 USING SELECT ...' is SQL (the vector-index
        # query has a USING clause); 'search for the best students' is NL.
        return "using" not in words
    if first == "diff":
        # 'DIFF t FROM VERSION 0 TO CURRENT' is SQL; 'diff these two
        # answers for me' is NL — the statement shape is FROM VERSION.
        return not (
            len(words) > 3 and words[2] == "from" and words[3] == "version"
        )
    if first == "summarize":
        # 'SUMMARIZE t' is SQL; 'summarize the sales for me' is NL.
        return len(words) != 2
    if first == "with":
        # 'WITH x AS (SELECT ...' is SQL; 'with all due respect, show me
        # the students' is NL — the CTE shape has AS as the third word.
        return not (len(words) > 3 and words[2] == "as")
    if first == "merge":
        # 'MERGE INTO t USING ...' is SQL; 'merge these two lists for me'
        # is NL — the statement shape has INTO as the second word.
        return not (len(words) > 1 and words[1] == "into")
    if first == "values" or first.startswith("values("):
        # Round-10: 'VALUES (1, ...)' / 'VALUES(1)' is the SQL table
        # constructor; 'values matter to this team' is NL — the statement
        # shape opens a parenthesized row immediately.
        return not text.strip()[len("values"):].lstrip().startswith("(")
    if first == "truncate":
        # Round-11: 'TRUNCATE [TABLE] t' is SQL; 'truncate this essay to
        # 100 words' is NL — the statement shape is 2-3 words.
        return len(words) not in (2, 3)
    return first not in (
        "select", "insert", "update", "delete", "create", "drop",
        "optimize", "vacuum", "alter", "explain", "describe", "copy",
        "refresh",
    )


def engine_samples(engine, table: str) -> dict[str, list[str]]:
    """First-N-rows value samples for string columns of an engine table."""
    meta = engine.catalog.get(table)
    str_cols = [
        c.name for c in meta.columns if c.decl.upper() in ("TEXT", "IMAGE", "STRING")
    ]
    if not str_cols:
        return {}
    rows = engine.table(table).select(*str_cols).limit(SAMPLE_ROWS).collect()
    return {
        c: sorted({str(r[c]) for r in rows if r[c] is not None}) for c in str_cols
    }


def generate_sql(engine, question: str, prev_table: str | None = None) -> str:
    """Generation half of :func:`ask`: NL question → SQL against the
    engine's catalog (reads only — callers needing lock discipline can
    hold a shared lock here and pick the execution lock from the verb)."""
    tables = {t: [c.name for c in engine.catalog.get(t).columns] for t in engine.show_tables()}
    return nl_to_sql(
        question,
        tables,
        samples_fn=lambda t: engine_samples(engine, t),
        prev_table=prev_table,
    )


def ask(
    engine,
    question: str,
    weak_typing: bool = False,
    prev_table: str | None = None,
):
    """End-to-end: NL question → SQL → execution on the engine."""
    sql = generate_sql(engine, question, prev_table=prev_table)
    return sql, engine.ref_sql(sql, weak_typing=weak_typing)


def llm_to_sql(
    nl: str,
    schema_context: str,
    endpoint: str = "http://localhost:11434/api/generate",
    model: str = "llama3",
    timeout: float = 10.0,
) -> str:
    """Optional LLM fallback against an Ollama-compatible endpoint — same
    schema-context prompt + markdown-stripping cleanup as the reference
    (main.go:219-266,688-752). Raises URLError when no endpoint is running."""
    prompt = (
        "You translate questions to SQL for this schema:\n"
        f"{schema_context}\n"
        "Reply with ONE SQL statement only, no markdown, no explanation.\n"
        f"Question: {nl}\nSQL:"
    )
    payload = json.dumps(
        {"model": model, "prompt": prompt, "stream": False, "options": {"temperature": 0.1}}
    ).encode()
    req = urllib.request.Request(
        endpoint, data=payload, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        text = json.loads(resp.read())["response"]
    # markdown/code-fence cleanup, as the reference does
    text = re.sub(r"```(?:sql)?", "", text).strip()
    return text.split(";")[0].strip()
