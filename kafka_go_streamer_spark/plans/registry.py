"""Query/oracle registry used by ``__spark_entry__.py``.

Contract (driver-defined): for each name, ``QUERIES[name](spark, sf_dir)``
returns a DataFrame and ``ORACLES[name]`` is ANSI SQL DuckDB runs over the
same parquet tables; results must agree on row count, schema, and an
order-insensitive value hash. Column names are aliased identically on
both sides; float aggregates are rounded on both sides so the hashes are
bit-stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}


class _OracleRegistry(dict):
    """Oracle registry; a value registered as a zero-arg callable is
    resolved (and ``stabilize_rounds``-rewritten) lazily at first
    access. Oracles built out of ANOTHER query's oracle (the recursive
    CTE and triangle-count twins reuse the winnowing-pairs SQL) register
    the builder function instead of calling it at decoration time, so
    there is no import-order dependency on the other module having
    registered first."""

    def _resolve(self, name: str) -> str:
        v = dict.__getitem__(self, name)
        if callable(v):
            v = stabilize_rounds(v())
            dict.__setitem__(self, name, v)
        return v

    def __getitem__(self, name: str) -> str:
        return self._resolve(name)

    def get(self, name, default=None):
        return self._resolve(name) if name in self else default

    def items(self):
        return [(k, self._resolve(k)) for k in dict.keys(self)]

    def values(self):
        return [self._resolve(k) for k in dict.keys(self)]


ORACLES: dict[str, str] = _OracleRegistry()


def stabilize_rounds(sql: str) -> str:
    """Rewrite every ``round(<expr>, <n>)`` in an oracle to
    ``round((<expr>) + eps(n), <n>)`` with the scale-proportional
    epsilon from ``functions.rounding`` (see that module for why exact
    decimal ties and large-sum drift make Spark and DuckDB disagree).
    Paren-aware scan, no regex over nested expressions."""
    from kafka_go_streamer_spark.functions.rounding import eps_for_scale
    out = []
    i, n = 0, len(sql)
    lower = sql.lower()
    while i < n:
        j = lower.find("round(", i)
        # skip identifiers ending in 'round(' that aren't the function
        while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            j = lower.find("round(", j + 1)
        if j == -1:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        # find the matching close paren and the top-level comma
        depth = 0
        k = j + len("round(")
        arg_start, comma = k, -1
        while k < n:
            c = sql[k]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            elif c == "," and depth == 0 and comma == -1:
                comma = k
            k += 1
        if comma == -1:  # single-arg round: leave untouched
            out.append(sql[j:k + 1])
        else:
            expr = stabilize_rounds(sql[arg_start:comma])  # handle nesting
            scale = sql[comma + 1 : k]
            eps = eps_for_scale(int(scale.strip()))
            if expr.rstrip().endswith(f"+ {eps:.1e}"):
                # Idempotent: this arg already carries the injected eps
                # for this scale (a composed oracle embedding another
                # query's ALREADY-stabilized SQL — e.g. pacf embedding
                # the ACF rounds). Re-injecting would double the eps on
                # the DuckDB side only, re-opening the one-sided
                # boundary asymmetry functions/rounding.py forbids.
                out.append(f"round({expr},{scale})")
            else:
                out.append(f"round(({expr}) + {eps:.1e},{scale})")
        i = k + 1
    return "".join(out)


def query(
    name: str, oracle: str | Callable[[], str] | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` marks a genuinely
    non-SQL-expressible op (driver records a weaker rows-only check).
    ``oracle`` may be a zero-arg callable, resolved lazily at first
    access (for oracles composed from other queries' oracles)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if callable(oracle):
            dict.__setitem__(ORACLES, name, oracle)
        elif oracle is not None:
            ORACLES[name] = stabilize_rounds(oracle)
        return fn

    return deco
