"""Config-driven table catalog.

Reference counterpart: ``src/config/table_config_utils.py:80-180`` +
``configs/tables.yaml`` / ``configs/environments.yaml`` — a TableConfig
resolved from (entity, layer, environment) with a Unity-style
``catalog.schema.table`` full name and an ADLS path.

Engine redesign: same resolution shape, but portable — the 3-level
``catalog.schema.table`` maps onto open-source Spark's ``database.table``
(database = ``{env}_{layer}``), and storage roots are plain paths
(local/HDFS/S3A) instead of ``abfss://`` URIs.  Config can come from a dict
or a YAML file; nothing Databricks-specific remains.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

#: Medallion layer names (reference: ``src/unikargo_utils/constants.py:6-16``).
LAYERS = ("bronze", "silver", "gold")

#: Default in-code config, mirroring the shape of ``configs/tables.yaml``.
DEFAULT_CONFIG: dict = {
    "environments": {
        "dev": {"storage_root": "/tmp/unicargo_medallion_warehouse/dev"},
        "prod": {"storage_root": "/tmp/unicargo_medallion_warehouse/prod"},
    },
    "tables": {
        "flights": {
            "bronze": {"table": "flights_raw", "source_format": "csv"},
            "silver": {"table": "fact_flight", "partition_by": ["date_sk"]},
        },
        "airlines": {
            "bronze": {"table": "airlines_raw", "source_format": "csv"},
            "silver": {"table": "dim_airline"},
        },
        "airports": {
            "bronze": {"table": "airports_raw", "source_format": "csv"},
            "silver": {"table": "dim_airport"},
        },
        "dates": {"silver": {"table": "dim_date"}},
    },
}


@dataclass(frozen=True)
class TableConfig:
    """Resolved identity of one managed table (reference:
    ``table_config_utils.py:80-112``, ``full_name`` property at 110-112)."""

    entity: str
    layer: str
    environment: str
    table: str
    storage_root: str
    source_format: str = "parquet"
    partition_by: tuple[str, ...] = field(default_factory=tuple)

    @property
    def database(self) -> str:
        # OSS mapping of the 3-level namespace: catalog → env prefix.
        return f"{self.environment}_{self.layer}"

    @property
    def full_name(self) -> str:
        return f"{self.database}.{self.table}"

    @property
    def path(self) -> str:
        return os.path.join(self.storage_root, self.layer, self.table)


def get_table_config(
    entity: str,
    layer: str,
    environment: str = "dev",
    config: dict | None = None,
) -> TableConfig:
    """Resolve (entity, layer, environment) → TableConfig.

    Raises KeyError with a precise message on unknown keys (the reference
    silently KeyErrors deep in dict access; the engine names the miss).
    """
    # `is None`, not truthiness: an EMPTY config (blank YAML → {}) must
    # fail fast on the key lookups below, not silently resolve every
    # table against the built-in defaults
    cfg = DEFAULT_CONFIG if config is None else config
    envs = cfg["environments"]
    if environment not in envs:
        raise KeyError(f"unknown environment {environment!r}; have {sorted(envs)}")
    tables = cfg["tables"]
    if entity not in tables:
        raise KeyError(f"unknown entity {entity!r}; have {sorted(tables)}")
    if layer not in tables[entity]:
        raise KeyError(f"entity {entity!r} has no {layer!r} layer; have {sorted(tables[entity])}")
    spec = tables[entity][layer]
    return TableConfig(
        entity=entity,
        layer=layer,
        environment=environment,
        table=spec["table"],
        storage_root=envs[environment]["storage_root"],
        source_format=spec.get("source_format", "parquet"),
        partition_by=tuple(spec.get("partition_by", ())),
    )


def load_yaml_config(path: str) -> dict:
    """Load a tables/environments config from YAML (same file shape as the
    in-code default)."""
    import yaml  # lazy: engine works without PyYAML if dict config is used

    with open(path) as f:
        return yaml.safe_load(f)
