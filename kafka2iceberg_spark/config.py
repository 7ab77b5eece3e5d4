"""Task-spec / config parsing — the reference's ParamUtils semantics, Spark-side.

Reference behavior re-expressed (NOT ported):
  * ``k=v`` arg parsing with quote stripping    — ParamUtils.java:56-81
  * config enhancement / defaulting             — ParamUtils.java:83-113
  * field-config filtering (fields.<name>.*)    — ParamUtils.java:203-258
  * primary-key / not-null / ref extraction     — ParamUtils.java:160-200
  * defaults: is_nullable=true, is_primary_key=false, ref=data.<name>
                                                — ParamUtils.java:246-256

Known reference quirk (SURVEY.md §1.3): the reference's ``getNotNullableCols``
actually filters on ``is_primary_key`` reversed (ParamUtils.java:189-200),
returning fields explicitly marked is_primary_key=false. We implement the
*intended* semantics: not-null = {is_nullable=false} ∪ {primary keys}.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# -- param keys (mirror of the reference CLI surface, task.json:1-96) --------
SOURCE_DATABASE = "source-database"
SOURCE_TABLE = "source-table"
KAFKA_BOOTSTRAP = "kafka.bootstrap-server"
KAFKA_TOPICS = "kafka.topics"
KAFKA_GROUP = "kafka.group-id"
CATALOG_TYPE = "catalog.type"
ICEBERG_NAMESPACE = "iceberg.namespace"
ICEBERG_TABLE = "iceberg.table"
ICEBERG_WAREHOUSE = "iceberg.warehouse"

_TRUE = {"true", "1", "yes", "y", "t"}


def parse_args(args: list[str]) -> dict[str, str]:
    """Parse ``k=v`` CLI args with quote stripping (ParamUtils.java:56-81)."""
    out: dict[str, str] = {}
    for arg in args:
        if "=" not in arg:
            continue
        k, _, v = arg.partition("=")
        k = k.strip()
        v = v.strip()
        if len(v) >= 2 and v[0] == v[-1] and v[0] in {"'", '"'}:
            v = v[1:-1]
        out[k] = v
    return out


def enhance_config(params: dict[str, str]) -> dict[str, str]:
    """Fill catalog/warehouse defaults (ParamUtils.java:83-113 analogue).

    Spark-side we default to a local 'hadoop'-style path catalog: the sink
    module owns an Iceberg-semantics table format over a warehouse dir.
    """
    out = dict(params)
    out.setdefault(CATALOG_TYPE, "hadoop")
    out.setdefault(ICEBERG_NAMESPACE, "default")
    wh = out.setdefault(ICEBERG_WAREHOUSE, "file:///tmp/iceberg-warehouse")
    if ICEBERG_TABLE in out and "table.location" not in out:
        out["table.location"] = (
            f"{wh.rstrip('/')}/{out[ICEBERG_NAMESPACE]}/{out[ICEBERG_TABLE]}"
        )
    return out


@dataclass
class FieldSpec:
    """One target column (dao/Field.java:17-22 + ParamUtils field config)."""

    name: str
    seq: int
    type: str = "string"
    is_nullable: bool = True
    is_primary_key: bool = False
    ref: str = ""  # JSON path into the envelope, default data.<name>

    def __post_init__(self) -> None:
        if not self.ref:
            self.ref = f"data.{self.name}"


@dataclass
class TaskSpec:
    """Job spec (task.json:1-96 / dao/Task.java:19-29 analogue)."""

    source_database: str
    source_table: str
    fields: list[FieldSpec] = field(default_factory=list)
    namespace: str = "default"
    table: str = "sink"
    partition_by: str = ""  # e.g. "days(ts)"

    @property
    def ordered_fields(self) -> list[FieldSpec]:
        return sorted(self.fields, key=lambda f: f.seq)

    @property
    def primary_keys(self) -> list[str]:
        return [f.name for f in self.ordered_fields if f.is_primary_key]

    @property
    def not_null_cols(self) -> list[str]:
        # intended semantics (see module docstring): explicit not-null ∪ PKs
        return [
            f.name
            for f in self.ordered_fields
            if (not f.is_nullable) or f.is_primary_key
        ]

    @property
    def ref_map(self) -> dict[str, str]:
        """field name → JSON ref path (ParamUtils.java:170-187)."""
        return {f.name: f.ref for f in self.ordered_fields}


def fields_from_params(params: dict[str, str]) -> list[FieldSpec]:
    """Assemble FieldSpecs from ``fields.<name>.<attr>`` params
    (ParamUtils.java:203-258), applying reference defaults."""
    by_name: dict[str, dict[str, str]] = {}
    for k, v in params.items():
        if not k.startswith("fields."):
            continue
        parts = k.split(".")
        if len(parts) != 3:
            continue
        _, name, attr = parts
        by_name.setdefault(name, {})[attr] = v
    specs = []
    for name, attrs in by_name.items():
        specs.append(
            FieldSpec(
                name=name,
                seq=int(attrs.get("seq", 10**9)),
                type=attrs.get("type", "string"),
                is_nullable=attrs.get("is_nullable", "true").lower() in _TRUE,
                is_primary_key=attrs.get("is_primary_key", "false").lower()
                in _TRUE,
                ref=attrs.get("ref", ""),
            )
        )
    specs.sort(key=lambda f: f.seq)
    return specs


def task_from_params(params: dict[str, str]) -> TaskSpec:
    return TaskSpec(
        source_database=params.get(SOURCE_DATABASE, ""),
        source_table=params.get(SOURCE_TABLE, ""),
        fields=fields_from_params(params),
        namespace=params.get(ICEBERG_NAMESPACE, "default"),
        table=params.get(ICEBERG_TABLE, "sink"),
        partition_by=params.get("partition-by", ""),
    )
