"""ksql-style SQL front door: named streams/tables over Spark SQL.

Reproduces the reference's second entry point
(ksqldb-consumer/setup-ksqldb-correct.sh:49-146): CREATE STREAM binds a
schema onto a source (pure metadata — here a temp view), CREATE TABLE AS
SELECT deploys a continuously-maintained aggregate. Parsing, analysis and
optimization are Catalyst's; this module only (a) keeps a registry of named
queries (SHOW QUERIES, :145-146) and (b) string-maps the ~6 ksql-dialect
constructs onto Spark SQL (SURVEY §7 step 4 — deliberately NOT a parser
port):

  LATEST_BY_OFFSET(x)            → max_by(x, <offset_col>)         (A3)
  TIMESTAMPTOSTRING(x, 'fmt')    → date_format(x, 'fmt')           (F6)
  WINDOWSTART / WINDOWEND        → window.start / window.end       (F7)
  CAST(WINDOWEND AS BIGINT)      → unix_millis(window.end)         (F7)
  WINDOW TUMBLING (SIZE n UNIT)  → window(<ts>, 'n unit') prepended
                                   to GROUP BY                     (T1/A2)
  WINDOW HOPPING (SIZE n UNIT, ADVANCE BY m UNIT)
                                 → window(<ts>, 'n unit', 'm unit')
                                   — overlapping windows, each row in
                                   size/advance of them
  WINDOW SESSION (n UNIT)        → session_window(<ts>, 'n unit') —
                                   gap-merged session windows
  EMIT CHANGES                   → removed; marks the query continuous
                                   (update output mode)            (T3)
  AS_VALUE(x)                    → (x) — ksql's key-to-value copy is
                                   an identity projection in Spark,
                                   where grouping keys are ordinary
                                   output columns
                                   (ksqldb-consumer/profiles/
                                   low_latency.sql AS_VALUE usage)
  ROWTIME                        → unix_millis(<ts>) — the record-
                                   timestamp pseudo-column, epoch ms
                                   (low_latency.sql MAX(ROWTIME))

Statement forms handled by KsqlFrontDoor.execute beyond the bare
CREATE TABLE name AS SELECT:
  CREATE TABLE name WITH (kafka_topic=..., partitions=...) AS SELECT
      — sink metadata in WITH is deployment glue (topic/partitions/
        replicas have no meaning over temp views) and is recorded but
        otherwise ignored (low_latency.sql:5-10)
  DROP TABLE [IF EXISTS] name [DELETE TOPIC]
      — terminates the backing continuous query if one is running and
        unregisters the view (low_latency.sql:2)
"""

from __future__ import annotations

import re
import tempfile
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def translate_ksql(
    sql: str, *, ts_col: str = "ts", offset_col: str = "offset"
) -> tuple[str, bool]:
    """Map ksql dialect onto Spark SQL text. Returns (spark_sql,
    is_continuous)."""
    out = sql

    continuous = bool(re.search(r"\bEMIT\s+CHANGES\b", out, re.I))
    out = re.sub(r"\bEMIT\s+CHANGES\b", "", out, flags=re.I)

    out = re.sub(
        r"\bLATEST_BY_OFFSET\s*\(\s*([^)]+?)\s*\)",
        rf"max_by(\1, {offset_col})",
        out,
        flags=re.I,
    )
    out = re.sub(r"\bTIMESTAMPTOSTRING\s*\(", "date_format(", out, flags=re.I)
    out = re.sub(
        r"\bCAST\s*\(\s*WINDOWEND\s+AS\s+BIGINT\s*\)",
        "unix_millis(window.end)",
        out,
        flags=re.I,
    )
    out = re.sub(
        r"\bCAST\s*\(\s*WINDOWSTART\s+AS\s+BIGINT\s*\)",
        "unix_millis(window.start)",
        out,
        flags=re.I,
    )
    out = re.sub(r"\bWINDOWSTART\b", "window.start", out, flags=re.I)
    out = re.sub(r"\bWINDOWEND\b", "window.end", out, flags=re.I)
    # AS_VALUE(k): ksql tables keep grouping keys in the Kafka key; the
    # function copies one into the value. Spark grouping keys are already
    # ordinary columns — identity projection.
    out = re.sub(r"\bAS_VALUE\s*\(", "(", out, flags=re.I)
    # ROWTIME: record-timestamp pseudo-column, epoch milliseconds.
    out = re.sub(r"\bROWTIME\b", f"unix_millis({ts_col})", out, flags=re.I)

    # WINDOW TUMBLING (SIZE 1 MINUTES) → prepend window(ts, '1 minutes')
    # to the GROUP BY list (ksql puts the window clause before GROUP BY;
    # Spark expresses it as a grouping expression).
    def _find_top_level(text: str, pattern: str) -> "re.Match | None":
        """First match of `pattern` at paren depth 0, scanning the
        ORIGINAL text (never an upper() copy — case mapping can change
        string length, e.g. 'ß' → 'SS', misaligning every index) with
        case-insensitive matching. The scan skips single-quoted string
        literals ('' escape honored), backtick-quoted identifiers, and
        `--` line comments, so parens or keyword lookalikes inside any
        of them can neither corrupt the depth counter nor match; a
        keyword substring inside a snake_case identifier is rejected by
        the word-character guards on both sides."""
        depth = 0
        i = 0
        rx = re.compile(pattern + r"(?![A-Za-z0-9_])", re.I)

        def _wordch(c: str) -> bool:
            return c.isalnum() or c == "_"

        while i < len(text):
            c = text[i]
            if c == "'":
                i += 1
                while i < len(text):
                    if text[i] == "'":
                        if i + 1 < len(text) and text[i + 1] == "'":
                            i += 2
                            continue
                        break
                    i += 1
            elif c == "`":
                i += 1
                while i < len(text) and text[i] != "`":
                    i += 1
            elif c == "-" and text[i : i + 2] == "--":
                while i < len(text) and text[i] != "\n":
                    i += 1
                continue
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif depth == 0:
                m = rx.match(text, i)
                if m and (i == 0 or not _wordch(text[i - 1])):
                    return m
            i += 1
        return None

    def _prepend_group_expr(text: str, span: tuple[int, int], expr: str) -> str:
        text = text[: span[0]] + text[span[1]:]
        # only a TOP-LEVEL GROUP BY owns the window — a GROUP BY inside
        # a derived-table subquery must not attract it
        g = _find_top_level(text, r"GROUP\s+BY")
        if g is not None:
            return f"{text[: g.start()]}GROUP BY {expr},{text[g.end():]}"
        # Global windowed aggregate (legal ksql: WINDOW clause, no GROUP
        # BY keys) — the window itself is the only grouping expression.
        # Insert GROUP BY at the TOP LEVEL of the statement, before any
        # depth-0 HAVING/ORDER BY/LIMIT and before a trailing ';', so the
        # window is never silently dropped into an unwindowed agg and the
        # clause never lands inside a subquery.
        t = _find_top_level(text, r"(HAVING|ORDER\s+BY|LIMIT)")
        if t is not None:
            pos = t.start()
        else:
            body = text.rstrip()
            while body.endswith(";"):
                body = body[:-1].rstrip()
            pos = len(body)
        return f"{text[:pos].rstrip()} GROUP BY {expr} {text[pos:]}"

    m = re.search(
        r"\bWINDOW\s+TUMBLING\s*\(\s*SIZE\s+(\d+)\s+(\w+?)S?\s*\)",
        out,
        flags=re.I,
    )
    if m:
        dur = f"{m.group(1)} {m.group(2).lower()}"
        out = _prepend_group_expr(
            out, m.span(), f"window({ts_col}, '{dur}')"
        )

    # WINDOW HOPPING (SIZE n U, ADVANCE BY m U) → sliding window(ts,
    # size, slide): each row lands in size/advance overlapping windows,
    # exactly ksql's hopping semantics.
    m = re.search(
        r"\bWINDOW\s+HOPPING\s*\(\s*SIZE\s+(\d+)\s+(\w+?)S?\s*,"
        r"\s*ADVANCE\s+BY\s+(\d+)\s+(\w+?)S?\s*\)",
        out,
        flags=re.I,
    )
    if m:
        size = f"{m.group(1)} {m.group(2).lower()}"
        adv = f"{m.group(3)} {m.group(4).lower()}"
        out = _prepend_group_expr(
            out, m.span(), f"window({ts_col}, '{size}', '{adv}')"
        )

    # WINDOW SESSION (n UNIT) → session_window(ts, gap): windows merge
    # while events arrive within the gap of each other.
    m = re.search(
        r"\bWINDOW\s+SESSION\s*\(\s*(\d+)\s+(\w+?)S?\s*\)",
        out,
        flags=re.I,
    )
    if m:
        gap = f"{m.group(1)} {m.group(2).lower()}"
        out = _prepend_group_expr(
            out, m.span(), f"session_window({ts_col}, '{gap}')"
        )
    return out, continuous


@dataclass
class KsqlFrontDoor:
    """Registry of named streams/tables ≈ ksql server state."""

    spark: SparkSession
    ts_col: str = "ts"
    offset_col: str = "offset"
    streams: dict[str, DataFrame] = field(default_factory=dict)
    tables: dict[str, DataFrame] = field(default_factory=dict)
    queries: dict[str, StreamingQuery] = field(default_factory=dict)

    def create_stream(self, name: str, df: DataFrame) -> None:
        """CREATE STREAM name (...) WITH (kafka_topic=...) — bind a name
        onto a (possibly streaming) DataFrame as a temp view
        (setup-ksqldb-correct.sh:59-82)."""
        df.createOrReplaceTempView(name)
        self.streams[name] = df

    def create_table_as(
        self, name: str, ksql: str, *, output_mode: str = "update"
    ) -> DataFrame | StreamingQuery:
        """CREATE TABLE name AS SELECT ... (setup-ksqldb-correct.sh:93-142).

        Over batch views this materializes a named result view; over a
        streaming view (EMIT CHANGES) it deploys a continuous query into a
        memory sink readable as `name` — the changelog-table equivalent.
        """
        spark_sql, continuous = translate_ksql(
            ksql, ts_col=self.ts_col, offset_col=self.offset_col
        )
        df = self.spark.sql(spark_sql)
        if continuous and df.isStreaming:
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .option(
                    "checkpointLocation",
                    tempfile.mkdtemp(prefix=f"ksql_{name}_{uuid.uuid4().hex[:6]}_"),
                )
                .trigger(availableNow=True)
                .start()
            )
            self.queries[name] = q
            self.tables[name] = self.spark.table(name)
            return q
        df.createOrReplaceTempView(name)
        self.tables[name] = df
        return df

    def execute(self, statement: str) -> object:
        """Dispatch one ksql statement — the `ksql --file` surface
        (setup-ksqldb-correct.sh:157-162). Supported statements (regex
        dispatch, deliberately not a parser):

        CREATE STREAM name (col TYPE, ...) WITH (kafka_topic='t', ...);
            binds the declared schema onto a registered source. The WITH
            options select the source: a previously-registered DataFrame
            under `kafka_topic` (tests pre-register file-backed streams),
            else an error — this engine does not invent brokers.
        CREATE TABLE name AS SELECT ...;   → create_table_as
        SHOW STREAMS; / SHOW TABLES; / SHOW QUERIES;
        TERMINATE name;
        """
        stmt = statement.strip().rstrip(";").strip()
        up = stmt.upper()
        m = re.match(
            r"DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\w+)(\s+DELETE\s+TOPIC)?$",
            stmt,
            re.I,
        )
        if m:
            self.drop_table(m.group(1), missing_ok="IF EXISTS" in up)
            return None
        if up.startswith("SHOW STREAMS"):
            return self.show_streams()
        if up.startswith("SHOW TABLES"):
            return self.show_tables()
        if up.startswith("SHOW QUERIES"):
            return self.show_queries()
        if up.startswith("TERMINATE"):
            self.terminate(stmt.split()[1])
            return None
        m = re.match(
            r"CREATE\s+STREAM\s+(\w+)\s*\((.*?)\)\s*WITH\s*\((.*)\)",
            stmt,
            re.I | re.S,
        )
        if m:
            name, _cols, with_opts = m.groups()
            topic_m = re.search(
                r"kafka_topic\s*=\s*'([^']+)'", with_opts, re.I
            )
            topic = topic_m.group(1) if topic_m else name
            if topic not in self.streams:
                raise ValueError(
                    f"no source registered for topic '{topic}'; register a "
                    "DataFrame via create_stream(topic, df) first (this "
                    "engine binds declared schemas to registered sources; "
                    "it does not connect to brokers from DDL)"
                )
            self.create_stream(name, self.streams[topic])
            return self.streams[name]
        # CREATE TABLE name [WITH (sink options)] AS SELECT ... — the
        # reference's deployed form carries WITH (KAFKA_TOPIC=...,
        # VALUE_FORMAT='AVRO', PARTITIONS=5, REPLICAS=1); those are Kafka
        # sink placement options with no equivalent over a temp view, so
        # they parse and drop (low_latency.sql:5-10).
        m = re.match(
            r"CREATE\s+TABLE\s+(\w+)\s*(?:WITH\s*\((.*?)\)\s*)?AS\s+(SELECT.*)",
            stmt,
            re.I | re.S,
        )
        if m:
            return self.create_table_as(m.group(1), m.group(3))
        raise ValueError(f"unsupported ksql statement: {stmt[:80]}...")

    def drop_table(self, name: str, *, missing_ok: bool = False) -> None:
        """DROP TABLE [IF EXISTS] name [DELETE TOPIC]: stop the backing
        continuous query if running, unregister the view. DELETE TOPIC is
        Kafka-side cleanup — nothing to delete over a memory sink."""
        if name not in self.tables and not missing_ok:
            raise ValueError(f"table '{name}' does not exist")
        self.terminate(name)
        if name in self.tables:
            del self.tables[name]
            self.spark.catalog.dropTempView(name)

    def execute_script(self, script: str) -> list[object]:
        """Run a multi-statement ksql file (statements separated by ';'),
        returning per-statement results — the CLI-over-file shape."""
        results = []
        for stmt in script.split(";"):
            if stmt.strip():
                results.append(self.execute(stmt))
        return results

    def show_streams(self) -> list[str]:
        return sorted(self.streams)

    def show_tables(self) -> list[str]:
        return sorted(self.tables)

    def show_queries(self) -> list[str]:
        """SHOW QUERIES (setup-ksqldb-correct.sh:180-182)."""
        return sorted(self.queries)

    def terminate(self, name: str) -> None:
        q = self.queries.pop(name, None)
        if q is not None:
            q.stop()
