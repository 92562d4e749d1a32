"""SQL Server Change Tracking source (S1-S5): T-SQL builders + JDBC wiring.

The delta/backfill/probe SQL runs **on SQL Server** (exactly as in the
reference — pushdown is the whole point): the generated text goes into
``spark.read.format("jdbc").option("query", ...)``. Reference semantics:

- delta query (S1): base table RIGHT JOIN ``CHANGETABLE(CHANGES t, lastId)``
  emitting PKs, ``SYS_CHANGE_VERSION``/``SYS_CHANGE_OPERATION``, non-PK
  columns and the server-computed ``ARCANE_MERGE_KEY`` = lower-hex SHA-256
  of '#'-joined PKs (template ``src/main/resources/get_select_delta_query.
  sql``; builders ``services/mssql/QueryProvider.scala:215-295``);
- backfill query (S2): ``SELECT *`` + synthetic version 0 / operation 'I'
  (``get_select_all_query.sql``);
- PK/schema discovery (S3): INFORMATION_SCHEMA join
  (``get_column_summaries.sql``);
- version probes (S4): ``CHANGE_TRACKING_CURRENT_VERSION()`` and
  ``sys.dm_tran_commit_table`` min-commit lookups
  (``QueryProvider.scala:195-213``);
- sharding (S5): the reference builds server-side shard tables filled by
  ``ABS(CHECKSUM(pk)) % N = i``; Spark reads sharded JDBC natively via
  ``predicates`` — same modulo split, no server-side staging tables
  (SURVEY §2.1 S5 mapping).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from arcane_framework_scala_spark.schema.schema import MERGE_KEY_COLUMN
from arcane_framework_scala_spark.sources.base import MicroBatch

#: (column_name, is_primary_key[, data_type]) — reference ColumnSummary,
#: optionally extended with the lowercase INFORMATION_SCHEMA DATA_TYPE so
#: the builders know which columns need a wire conversion (currently:
#: ``time`` → int64 nanos-of-day, the engine-wide TIME encoding —
#: schema/sql_types.py). Plain 2-tuples remain valid (no conversion).
ColumnSummary = tuple


def _summary(col: ColumnSummary) -> tuple[str, bool, str | None]:
    name, is_pk = col[0], col[1]
    dtype = col[2].lower() if len(col) > 2 and col[2] else None
    return name, is_pk, dtype


def _select_ref(name: str, dtype: str | None, alias: str) -> str:
    """Column reference for a generated SELECT list; TIME columns are
    wrapped server-side so the JDBC wire value is already the int64
    nanos-of-day the declared schema (92 → LongType) promises."""
    if dtype == "time":
        from arcane_framework_scala_spark.schema.sql_types import (
            time_to_nanos_tsql,
        )

        return f"{time_to_nanos_tsql(name, alias)} as [{name}]"
    return f"{alias}.[{name}]"


@dataclass(frozen=True)
class MsSqlQueryBuilder:
    database: str
    schema: str
    table: str

    # -- expression helpers (QueryProvider.scala:215-268) ------------------
    @staticmethod
    def merge_expression(columns: list[ColumnSummary], alias: str) -> str:
        return " + '#' + ".join(
            f"cast({alias}.[{name}] as nvarchar(128))"
            for name, is_pk, _ in map(_summary, columns)
            if is_pk
        )

    @staticmethod
    def match_statement(columns: list[ColumnSummary], src: str, tgt: str) -> str:
        return " and ".join(
            f"{tgt}.[{name}] = {src}.[{name}]"
            for name, is_pk, _ in map(_summary, columns)
            if is_pk
        )

    @staticmethod
    def delta_columns(columns: list[ColumnSummary], ct: str, tq: str) -> str:
        cols = [_summary(c) for c in columns]
        pk = [_select_ref(n, dt, ct) for n, is_pk, dt in cols if is_pk]
        extra = [f"{ct}.SYS_CHANGE_VERSION", f"{ct}.SYS_CHANGE_OPERATION"]
        non_pk = [
            _select_ref(n, dt, tq)
            for n, is_pk, dt in cols
            if not is_pk and n not in ("SYS_CHANGE_VERSION", "SYS_CHANGE_OPERATION")
        ]
        return ",\n".join(pk + extra + non_pk)

    @staticmethod
    def backfill_columns(columns: list[ColumnSummary], tq: str) -> str:
        cols = [_summary(c) for c in columns]
        pk = [_select_ref(n, dt, tq) for n, is_pk, dt in cols if is_pk]
        extra = ["CAST(0 as BIGINT) as SYS_CHANGE_VERSION", "'I' as SYS_CHANGE_OPERATION"]
        non_pk = [
            _select_ref(n, dt, tq)
            for n, is_pk, dt in cols
            if not is_pk and n not in ("SYS_CHANGE_VERSION", "SYS_CHANGE_OPERATION")
        ]
        return ",\n".join(pk + extra + non_pk)

    # -- query builders ----------------------------------------------------
    def changes_query(self, columns: list[ColumnSummary], last_id: int) -> str:
        """S1 delta query — runs on SQL Server, exactly the reference shape."""
        fqn = f"[{self.database}].[{self.schema}].[{self.table}]"
        return (
            "SELECT\n"
            f"{self.delta_columns(columns, 'ct', 'tq')},\n"
            f"cast({last_id} as bigint) AS 'ChangeTrackingVersion',\n"
            f"lower(convert(nvarchar(128), HashBytes('SHA2_256', "
            f"{self.merge_expression(columns, 'ct')}),2)) as [{MERGE_KEY_COLUMN}]\n"
            f"FROM {fqn} tq\n"
            f"RIGHT JOIN (SELECT ct.* FROM CHANGETABLE (CHANGES {fqn}, {last_id}) ct ) ct "
            f"ON {self.match_statement(columns, 'ct', 'tq')}"
        )

    def backfill_query(self, columns: list[ColumnSummary]) -> str:
        """S2 full-scan query with synthetic version/operation."""
        fqn = f"[{self.database}].[{self.schema}].[{self.table}]"
        return (
            "SELECT\n"
            f"{self.backfill_columns(columns, 'tq')},\n"
            "CHANGE_TRACKING_CURRENT_VERSION() AS 'ChangeTrackingVersion',\n"
            f"lower(convert(nvarchar(128), HashBytes('SHA2_256', "
            f"{self.merge_expression(columns, 'tq')}),2)) as [{MERGE_KEY_COLUMN}]\n"
            f"FROM {fqn} tq"
        )

    def column_summaries_query(self) -> str:
        """S3: (COLUMN_NAME, IsPrimaryKey, DATA_TYPE) discovery. The
        DATA_TYPE code feeds the 3-tuple ColumnSummary so delta/backfill
        SELECTs know which columns need the TIME→nanos wire wrapper."""
        return f"""select
    c.COLUMN_NAME,
    case when kcu.CONSTRAINT_NAME is not null then 1 else 0 end as IsPrimaryKey,
    c.DATA_TYPE
from
    [{self.database}].INFORMATION_SCHEMA.COLUMNS c
    left join [{self.database}].INFORMATION_SCHEMA.TABLE_CONSTRAINTS tc on c.TABLE_SCHEMA = tc.TABLE_SCHEMA and c.TABLE_NAME = tc.TABLE_NAME
    left join [{self.database}].INFORMATION_SCHEMA.KEY_COLUMN_USAGE kcu on tc.CONSTRAINT_NAME = kcu.CONSTRAINT_NAME and c.COLUMN_NAME = kcu.COLUMN_NAME
where
    tc.CONSTRAINT_TYPE = N'PRIMARY KEY'
    and tc.TABLE_NAME = N'{self.table}'
    and tc.TABLE_SCHEMA = N'{self.schema}'
order by c.ORDINAL_POSITION"""

    # S4 probes
    @staticmethod
    def current_version_query() -> str:
        return "SELECT CHANGE_TRACKING_CURRENT_VERSION()"

    @staticmethod
    def version_from_timestamp_query(iso_timestamp: str) -> str:
        return (
            "SELECT MIN(commit_ts) FROM sys.dm_tran_commit_table "
            f"WHERE commit_time >= '{iso_timestamp}'"
        )

    @staticmethod
    def version_commit_time_query(version: int) -> str:
        return (
            "SELECT MIN(commit_time) FROM sys.dm_tran_commit_table "
            f"WHERE commit_ts = {version}"
        )

    def has_changes_query(self, last_id: int) -> str:
        """O2: TOP 1 emptiness probe."""
        fqn = f"[{self.database}].[{self.schema}].[{self.table}]"
        return (
            f"SELECT TOP 1 1 FROM CHANGETABLE (CHANGES {fqn}, {last_id}) ct"
        )

    # A7: STATISTICS PROFILE cost probe → shard sizing (reference
    # QueryProvider.scala:163-186 + MsSqlStreamingSource.scala:382-411).
    # The reference estimates `SELECT *` cost from the profile result
    # set, folds it through costToSize = clamp(1 + ln(cost)³, 1, 1000)
    # MiB, and derives the shard count from the table's physical size.
    # Here the probes RENDER (pinned by s3_tsql_surfaces — they only
    # execute on live SQL Server) and the arithmetic is executable: feed
    # `shards_from_cost` into `shard_predicates`/`backfill(num_shards=…)`
    # when no advised shard size is configured.
    def stats_profile_query(self) -> str:
        return (
            "EXEC('\n"
            " SET STATISTICS PROFILE ON;\n"
            f" SELECT TOP 1 * FROM [{self.schema}].[{self.table}];\n"
            " SET STATISTICS PROFILE OFF')"
        )

    def physical_stats_query(self, shard_size_estimate: float) -> str:
        """``dm_db_index_physical_stats`` shard profile with the shard
        size (MiB) already resolved — pass an advised integer size or
        :func:`cost_to_size` of the profiled cost, exactly the two
        overloads the reference renders."""
        return (
            "SELECT\n"
            "    (page_count * 8.0) / 1024 / 1024 as total_size_gib,\n"
            f"    ceiling((page_count * 8.0) / 1024 / {shard_size_estimate}) as shards,\n"
            f"    record_count / ceiling((page_count * 8.0) / 1024 / {shard_size_estimate}) as records_per_shard\n"
            "FROM\n"
            "    sys.dm_db_index_physical_stats(DB_ID(), "
            f"OBJECT_ID('{self.schema}.{self.table}'), 1, NULL, 'DETAILED')\n"
            "where index_level = 0"
        )

    # S5: Spark-native sharding — predicate list instead of server-side
    # shard tables (reference MsSqlStreamingSource.scala:375-458)
    @staticmethod
    def shard_predicates(pk_columns: list[str], num_shards: int) -> list[str]:
        checksum = ", ".join(f"[{c}]" for c in pk_columns)
        return [
            f"ABS(CHECKSUM({checksum})) % {num_shards} = {i}"
            for i in range(num_shards)
        ]


def sum_profile_cost(rows) -> float:
    """A7: total estimated read cost from the STATISTICS PROFILE result
    set — Σ (EstimateIO + EstimateCPU) over all plan rows, NULLs as 0
    (reference ``MsSqlStreamingSource.scala:389-409``, the unfold/runSum
    over the JDBC result set). ``rows`` is any iterable of mappings —
    the fetched profile rows."""
    total = 0.0
    for r in rows:
        if hasattr(r, "asDict"):  # pyspark Row from a JDBC fetch
            r = r.asDict()
        total += (r.get("EstimateIO") or 0.0) + (r.get("EstimateCPU") or 0.0)
    return total


def cost_to_size(cost: float) -> float:
    """A7: the reference's cost → shard-size-MiB fold
    (``QueryProvider.scala:169-174``): ``1 + ln(cost)³`` clamped to
    [1, 1000] — cheap tables get small shards, expensive ones cap at
    1 GiB so a shard always fits one JDBC reader."""
    import math

    calculated = 1.0 + math.log(cost) ** 3
    if calculated < 0:
        return 1.0
    if calculated > 1000:
        return 1000.0
    return calculated


def shards_from_cost(total_size_mib: float, cost: float) -> int:
    """A7 → S5 hand-off: the shard count the reference's physical-stats
    query computes server-side (``ceiling(size_mib / costToSize)``),
    executable driver-side — feed it to
    :meth:`MsSqlQueryBuilder.shard_predicates` /
    :meth:`MsSqlSource.backfill` when no advised shard size is
    configured."""
    import math

    return max(1, math.ceil(total_size_mib / cost_to_size(cost)))


@dataclass
class MsSqlSource:
    """JDBC-backed change source. Needs a reachable SQL Server; builders
    above are unit-tested without one."""

    spark: SparkSession
    jdbc_url: str
    builder: MsSqlQueryBuilder
    columns: list[ColumnSummary]
    options: dict | None = None
    fetch_size: int = 1000  # reference default, MsSqlStreamingSource.scala:94

    def _jdbc(self, query: str) -> DataFrame:
        reader = (
            self.spark.read.format("jdbc")
            .option("url", self.jdbc_url)
            .option("query", query)
            .option("fetchsize", str(self.fetch_size))
        )
        for k, v in (self.options or {}).items():
            reader = reader.option(k, v)
        return reader.load()

    def current_version(self) -> dict:
        v = self._jdbc(self.builder.current_version_query()).first()[0]
        return {"version": int(v) if v is not None else 0}

    def changes(self, since: dict | None) -> Iterator[MicroBatch]:
        last_id = int((since or {}).get("version", 0))
        upper = self.current_version()
        df = self._jdbc(self.builder.changes_query(self.columns, last_id))
        yield MicroBatch(df=df, watermark=upper, units=1)

    def backfill(self, num_shards: int = 1) -> DataFrame:
        """S2/S5: sharded full read via JDBC predicates — Spark parallelizes
        one partition per predicate; no server-side shard tables."""
        query = self.builder.backfill_query(self.columns)
        if num_shards <= 1:
            return self._jdbc(query)
        pks = [n for n, is_pk in self.columns if is_pk]
        predicates = self.builder.shard_predicates(pks, num_shards)
        props = {"fetchsize": str(self.fetch_size), **(self.options or {})}
        return self.spark.read.jdbc(
            self.jdbc_url,
            table=f"({query}) shard_src",
            predicates=predicates,
            properties=props,
        )
