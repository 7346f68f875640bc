"""Postgres → Spark SQL transpiler.

The analog of the reference's ``PostgresCompatibilityParser``
(``datafusion-pg-catalog/src/sql/parser.rs:288-473``): tokenize once,
apply the blacklist substitution, then the rewrite-rule chain in a fixed
order, and re-emit SQL for Spark's own parser — exactly the reference's
shape (it re-serializes the rewritten AST and hands the string to
DataFusion, ``handlers.rs:193-210``).

Rule objects are built once per transpiler instance (the reference
pre-tokenizes its blacklist at construction; see BASELINE.md).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from datafusion_postgres_spark.dialect import rules as R
from datafusion_postgres_spark.dialect.tokenizer import (
    IDENT, WS, emit, split_on_semicolons, tokenize,
)


@dataclass
class BlacklistEntry:
    """Whole-query stub: client queries Spark cannot plan get a canned
    replacement (``sql/parser.rs:56-267`` mechanism; far fewer entries are
    needed than the reference since Catalyst plans correlated subqueries)."""

    needle: str          # normalized substring that identifies the query
    replacement_sql: str  # Spark SQL producing the stub result


DEFAULT_BLACKLIST: list[BlacklistEntry] = [
    # psql \d probes array(SELECT ...) over unsupported catalog corners.
    BlacklistEntry(
        needle="current_setting('search_path')",
        replacement_sql="SELECT 'public' AS search_path"),
]


def _normalize(sql: str) -> str:
    return " ".join(sql.lower().split())


@dataclass
class PostgresTranspiler:
    blacklist: list[BlacklistEntry] = field(
        default_factory=lambda: list(DEFAULT_BLACKLIST))

    def split_statements(self, sql: str) -> list[str]:
        return [emit(stmt).strip() for stmt in
                split_on_semicolons(tokenize(sql))]

    def transpile(self, sql: str) -> str:
        norm = _normalize(sql)
        for entry in self.blacklist:
            if entry.needle in norm:
                return entry.replacement_sql
        tokens = tokenize(sql)
        for rule in R.ALL_RULES:
            tokens = rule(tokens)
        return emit(tokens)

    def statement_kind(self, sql: str) -> str:
        """First significant keyword, uppercased — used for permission
        mapping (hooks/permissions.rs:44-92) and command tags."""
        for t in tokenize(sql):
            if t.kind == IDENT:
                return t.text.upper()
            if t.kind != WS:
                break
        return ""

    def table_names(self, sql: str) -> list[str]:
        """Tables referenced in FROM/JOIN/INTO/UPDATE/TABLE position —
        feeds the per-statement RBAC check (the reference walks its AST
        for table refs; we walk the token stream)."""
        from datafusion_postgres_spark.dialect.tokenizer import significant

        toks = tokenize(sql)
        names = []
        for i, t in enumerate(toks):
            if t.kind == IDENT and t.text.upper() in (
                    "FROM", "JOIN", "INTO", "UPDATE", "TABLE"):
                j = significant(toks, i)
                if j < 0 or toks[j].kind not in (IDENT, "qident"):
                    continue
                name = toks[j].text.strip('"')
                # qualified name: a.b(.c)
                k = significant(toks, j)
                while k >= 0 and toks[k].text == ".":
                    k2 = significant(toks, k)
                    if k2 < 0:
                        break
                    name += "." + toks[k2].text.strip('"')
                    k = significant(toks, k2)
                # skip subqueries / table functions
                if k >= 0 and toks[k].text == "(":
                    continue
                if name.upper() not in ("SELECT", "LATERAL", "VALUES"):
                    names.append(name.lower())
        return names
