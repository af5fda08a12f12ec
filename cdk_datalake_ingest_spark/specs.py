"""Typed metadata model — the engine's public configuration surface.

A "query" in the reference is a DynamoDB configuration item; these
dataclasses mirror that attribute set one-for-one (etl_configuration /
stage_columns_especification / databases_credentials, per
datalake_ingestion/datalake_ingestion_stack.py:156-202 and
README.md:29-98 of the reference), so a user of the reference can port
their metadata by renaming keys to snake_case (or not at all:
``from_dict`` accepts both conventions).
"""

from __future__ import annotations

import csv
import io
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Iterable


def _read_model_csv(path: str | Path) -> list[dict[str, str]]:
    """Rows of an authoring-model CSV as dicts.

    Handles both plain CSV and the reference models' wrapped form
    (each physical line is a single quoted field holding the actual
    row, inner quotes doubled)."""
    rows: list[list[str]] = []
    with open(path, newline="") as f:
        for rec in csv.reader(f):
            if len(rec) == 1 and ("," in rec[0]):
                rec = next(csv.reader(io.StringIO(rec[0])))
            rows.append([c.strip() for c in rec])
    if not rows:
        return []
    header = rows[0]
    return [dict(zip(header, r)) for r in rows[1:] if any(r)]


def _norm_key(k: str) -> str:
    return k.strip().lower().replace(" ", "_")


def _coerce_bool(v: Any) -> bool:
    if isinstance(v, bool):
        return v
    if isinstance(v, dict):  # DynamoDB attribute form {"BOOL": true}
        return bool(v.get("BOOL", False))
    if isinstance(v, str):
        return v.strip().lower() in ("true", "1", "y", "yes", "t")
    return bool(v)


@dataclass
class ColumnSpec:
    """One stage output column (stage_columns_especification item).

    Reference semantics: aje-stage-dms-load.py:390-425 — ``column_id``
    fixes output order, ``new_data_type`` is the Spark DDL cast target,
    ``transformation`` is a DSL expression (see dsl/), the ``is_*``
    booleans drive dedup keys / ordering / partitioning / dedup recency.
    """

    column_name: str
    column_id: int = 0
    new_data_type: str = "string"
    transformation: str = ""
    is_id: bool = False
    is_order_by: bool = False
    is_partition: bool = False
    is_filter_date: bool = False

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ColumnSpec":
        nd = {_norm_key(k): v for k, v in d.items()}
        return cls(
            column_name=str(nd["column_name"]).strip(),
            column_id=int(nd.get("column_id", 0)),
            new_data_type=str(nd.get("new_data_type", "string")).strip(),
            transformation=str(nd.get("transformation", "") or "").strip(),
            is_id=_coerce_bool(nd.get("is_id", False)),
            is_order_by=_coerce_bool(nd.get("is_order_by", False)),
            is_partition=_coerce_bool(nd.get("is_partition", False)),
            is_filter_date=_coerce_bool(nd.get("is_filter_date", False)),
        )


@dataclass
class TableSpec:
    """One ingestion pipeline (etl_configuration item).

    ``filter_operator``: between = bounded full, between-date = threaded
    incremental, lte = plain full (reference README.md:96-98);
    ``load_type`` in {incremental, between-date} selects MERGE at stage,
    anything else overwrites (aje-stage-dms-load.py:474-495).
    ``source_table_type`` 't' (transactional) enables the delete-window
    before merge (aje-stage-dms-load.py:488-491).
    """

    target_table_name: str
    endpoint: str = ""
    source_schema: str = ""
    source_table: str = ""
    stage_table_name: str = ""
    columns: str = ""
    id_column: str = ""
    join_expr: str = ""
    filter_column: str = ""
    filter_exp: str = ""
    filter_operator: str = "lte"
    filter_type: str = ""
    filter_data_type: str = ""
    start_value: str = ""
    end_value: str = ""
    delay_incremental_ini: int = -2
    load_type: str = "full"
    source_table_type: str = "m"
    process_id: str = ""
    query_by_glue: str = ""
    active_flag: str = "Y"

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "TableSpec":
        nd = {_norm_key(k): v for k, v in d.items()}
        kwargs: dict[str, Any] = {}
        for f_name in cls.__dataclass_fields__:
            if f_name in nd and nd[f_name] is not None:
                kwargs[f_name] = nd[f_name]
        kwargs["target_table_name"] = str(nd["target_table_name"]).strip()
        if "delay_incremental_ini" in kwargs:
            kwargs["delay_incremental_ini"] = int(kwargs["delay_incremental_ini"])
        return cls(**kwargs)

    @property
    def id_columns(self) -> list[str]:
        return [c.strip() for c in self.id_column.split(",") if c.strip()]

    @property
    def is_incremental(self) -> bool:
        return self.load_type.strip() in ("incremental", "between-date")

    @property
    def is_transactional(self) -> bool:
        return self.source_table_type.strip() == "t"

    @property
    def is_active(self) -> bool:
        return self.active_flag.strip().upper() == "Y"


@dataclass
class EndpointSpec:
    """Source connection metadata (databases_credentials item)."""

    endpoint_name: str
    bd_type: str = "mysql"  # oracle | mysql | mssql
    server: str = ""
    port: int = 0
    db_name: str = ""
    username: str = ""
    password: str = ""

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "EndpointSpec":
        nd = {_norm_key(k): v for k, v in d.items()}
        aliases = {
            "endpoint_name": ("endpoint_name", "endpoint"),
            "server": ("server", "src_server_name"),
            "port": ("port", "db_port_number"),
            "db_name": ("db_name", "src_db_name"),
            "username": ("username", "src_db_username"),
            "password": ("password", "src_db_secret"),
        }
        kwargs: dict[str, Any] = {}
        for f_name in cls.__dataclass_fields__:
            for a in aliases.get(f_name, (f_name,)):
                if a in nd and nd[a] is not None:
                    kwargs[f_name] = nd[a]
                    break
        if "port" in kwargs:
            kwargs["port"] = int(kwargs["port"])
        return cls(**kwargs)


class ConfigCatalog:
    """The engine's metadata catalog (replaces the DynamoDB tables).

    Loads table specs + column specs from plain dicts or JSON files; at
    scale this would live in a Delta/parquet table with the same
    attribute names.
    """

    def __init__(
        self,
        tables: Iterable[TableSpec] = (),
        columns: dict[str, list[ColumnSpec]] | None = None,
        endpoints: Iterable[EndpointSpec] = (),
    ):
        self.tables: dict[str, TableSpec] = {
            t.target_table_name: t for t in tables
        }
        self.columns: dict[str, list[ColumnSpec]] = dict(columns or {})
        self.endpoints: dict[str, EndpointSpec] = {
            e.endpoint_name: e for e in endpoints
        }

    @classmethod
    def from_json(cls, path: str | Path) -> "ConfigCatalog":
        doc = json.loads(Path(path).read_text())
        tables = [TableSpec.from_dict(t) for t in doc.get("tables", [])]
        columns = {
            k: [ColumnSpec.from_dict(c) for c in v]
            for k, v in doc.get("columns", {}).items()
        }
        endpoints = [EndpointSpec.from_dict(e) for e in doc.get("endpoints", [])]
        return cls(tables, columns, endpoints)

    @classmethod
    def from_csv(
        cls,
        config_csv: str | Path,
        credentials_csv: str | Path | None = None,
        columns_csv: str | Path | None = None,
    ) -> "ConfigCatalog":
        """Load from the reference's authoring-model CSVs (entry point C:
        upload-data-to-dynamo.py reads these shapes into DynamoDB items;
        models/config_model.csv, models/credentials_model.csv).

        Tolerates the models' wrapped encoding, where each physical line
        is one quoted field containing the real CSV row with doubled
        quotes."""
        tables = [TableSpec.from_dict(r) for r in _read_model_csv(config_csv)]
        endpoints = (
            [EndpointSpec.from_dict(r) for r in _read_model_csv(credentials_csv)]
            if credentials_csv
            else []
        )
        columns: dict[str, list[ColumnSpec]] = {}
        if columns_csv:
            for r in _read_model_csv(columns_csv):
                nd = {_norm_key(k): v for k, v in r.items()}
                tname = str(nd["target_table_name"]).strip()
                columns.setdefault(tname, []).append(ColumnSpec.from_dict(r))
        return cls(tables, columns, endpoints)

    def add_table(
        self, spec: TableSpec, columns: Iterable[ColumnSpec] = ()
    ) -> None:
        self.tables[spec.target_table_name] = spec
        cols = sorted(columns, key=lambda c: c.column_id)
        if cols:
            self.columns[spec.target_table_name] = cols

    def table(self, name: str) -> TableSpec:
        return self.tables[name]

    def table_columns(self, name: str) -> list[ColumnSpec]:
        return sorted(self.columns.get(name, []), key=lambda c: c.column_id)

    def active_tables(
        self, process_id: str | None = None, endpoint_prefix: str | None = None
    ) -> list[TableSpec]:
        """Run-planner selection (StartWorkFlow.py:62-100 semantics):
        ACTIVE_FLAG='Y', optional PROCESS_ID equality, optional ENDPOINT
        begins_with prefix."""
        out = []
        for t in self.tables.values():
            if not t.is_active:
                continue
            if process_id is not None and t.process_id != process_id:
                continue
            if endpoint_prefix is not None and not t.endpoint.startswith(
                endpoint_prefix
            ):
                continue
            out.append(t)
        return out
