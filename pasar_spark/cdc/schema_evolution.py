"""In-flight schema evolution: interpret feed-declared DDL and promote
JSON-carried columns.

The change feed (FIXTURES.md F2) carries ``schema_ver`` plus an ``extra``
JSON payload holding not-yet-promoted columns. An :class:`EvolutionPlan`
maps each feed schema version to the DDL it implies. When the replay
runner sees events with ``schema_ver`` above the table's applied version
it applies the DDL (metadata-only snapshot commits on the lake table —
see lake/schema.py for why old files stay readable), then
:func:`promote_extra` pulls the JSON fields into real typed columns for
the merge.

The reference has no counterpart (schema is frozen DDL,
etl/pypasar/db/sql/postgres/ddl.sql); this is a pure north-rule feature.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pasar_spark.lake.table import LakeTable

# Base envelope columns that are never promoted from JSON.
ENVELOPE = {"lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "schema_ver", "extra"}


@dataclass
class EvolutionPlan:
    """feed schema_ver -> ordered DDL ops.

    op forms: ("add", name, type) | ("rename", old, new) | ("widen", name, type)
    """

    steps: dict[int, list[tuple]] = field(default_factory=dict)

    def apply_up_to(self, table: LakeTable, target_ver: int) -> LakeTable:
        applied = table.manifest["ledger"].get("feed_schema_ver", 0)
        while applied < target_ver:
            applied += 1
            for op in self.steps.get(applied, []):
                kind = op[0]
                if kind == "add":
                    table = table.add_column(op[1], op[2])
                elif kind == "rename":
                    table = table.rename_column(op[1], op[2])
                elif kind == "widen":
                    table = table.widen_column(op[1], op[2])
                else:
                    raise ValueError(f"unknown evolution op {op!r}")
            # Record progress in the ledger (next commit persists it).
            table.manifest["ledger"]["feed_schema_ver"] = applied
            table = table._commit(
                table.manifest, tag=f"feed-schema-ver-{applied}"
            )
        return table


def promote_extra(events: DataFrame, table: LakeTable) -> DataFrame:
    """Materialize evolved columns from the ``extra`` JSON for every table
    column that is not part of the base envelope. JSON access + cast is
    pure Catalyst (get_json_object) — no Python."""
    for f in table.schema.fields:
        if f.name in ENVELOPE or f.name in events.columns or f.name.startswith("_"):
            continue  # never synthesize engine-internal (_-prefixed) columns
        events = events.withColumn(
            f.name, F.get_json_object(F.col("extra"), f"$.{f.name}").cast(f.type)
        )
    return events


def max_schema_ver(events: DataFrame) -> int:
    row = events.agg(F.max("schema_ver").alias("v")).collect()[0]
    return int(row["v"] or 0)
