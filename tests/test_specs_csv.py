"""ConfigCatalog.from_csv — the reference's authoring-model CSV path
(entry point C; models/config_model.csv shape incl. the wrapped
quoting)."""

from __future__ import annotations

from cdk_datalake_ingest_spark.specs import ConfigCatalog

WRAPPED_CONFIG = (
    '"TARGET_TABLE_NAME,""ACTIVE_FLAG"",""ENDPOINT"",""FILTER_COLUMN"",'
    '""FILTER_OPERATOR"",""ID_COLUMN"",""SOURCE_SCHEMA"",""SOURCE_TABLE"",'
    '""START_VALUE"",""END_VALUE"""\n'
    '"PE_ITEMS,""Y"",""BANNER"",""UPD_TS"",""between-date"",""ID"",'
    '""SAT"",""ITEMS"",""2024-01-01 00:00:00"",""2024-02-01 00:00:00"""\n'
    '"PE_OFF,""N"",""BANNER"","""",""lte"","""",""SAT"",""OFF"","""",""""\n'
)

PLAIN_CREDENTIALS = (
    "ENDPOINT_NAME,BD_TYPE,DB_PORT_NUMBER,SRC_DB_NAME,SRC_DB_USERNAME,SRC_SERVER_NAME\n"
    "BANNER,oracle,1521,PROD,USR,10.0.0.1\n"
)

PLAIN_COLUMNS = (
    "TARGET_TABLE_NAME,COLUMN_NAME,COLUMN_ID,NEW_DATA_TYPE,TRANSFORMATION,IS_ID\n"
    "PE_ITEMS,id,1,bigint,ID,true\n"
    "PE_ITEMS,upd,2,timestamp,fn_transform_Datetime(UPD_TS),false\n"
)


def test_from_csv_wrapped_and_plain(tmp_path):
    cfg = tmp_path / "config.csv"
    cfg.write_text(WRAPPED_CONFIG)
    creds = tmp_path / "creds.csv"
    creds.write_text(PLAIN_CREDENTIALS)
    cols = tmp_path / "cols.csv"
    cols.write_text(PLAIN_COLUMNS)

    cat = ConfigCatalog.from_csv(cfg, creds, cols)
    t = cat.table("PE_ITEMS")
    assert t.endpoint == "BANNER"
    assert t.filter_operator == "between-date"
    assert t.is_active and not cat.table("PE_OFF").is_active
    assert t.start_value == "2024-01-01 00:00:00"

    ep = cat.endpoints["BANNER"]
    assert ep.bd_type == "oracle" and ep.server == "10.0.0.1"

    specs = cat.table_columns("PE_ITEMS")
    assert [c.column_name for c in specs] == ["id", "upd"]
    assert specs[0].is_id and specs[0].new_data_type == "bigint"
    assert specs[1].transformation == "fn_transform_Datetime(UPD_TS)"

    active = cat.active_tables(endpoint_prefix="BAN")
    assert [a.target_table_name for a in active] == ["PE_ITEMS"]


def test_port_alias_from_credentials(tmp_path):
    creds = tmp_path / "creds.csv"
    creds.write_text(PLAIN_CREDENTIALS)
    from cdk_datalake_ingest_spark.specs import EndpointSpec, _read_model_csv

    ep = EndpointSpec.from_dict(_read_model_csv(creds)[0])
    assert ep.port == 1521
