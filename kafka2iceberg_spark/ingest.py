"""Envelope ingest: Canal-JSON CDC → typed rows. Operators P1–P15.

Re-expresses the reference's per-row Java deserializer
(DeserializedSchema.java:90-193) as declarative Spark column expressions that
Catalyst compiles into whole-stage-codegen'd vectorized code:

  P1  null-payload filter (tombstones)        DeserializedSchema.java:91-94
  P2  JSON envelope parse                     :97-98    → from_json
  P3  routing filter (database/table)         :100-107  → filter, pre-explode
  P4  type filter (drop 'query')              :109-112
  P5  DDL branch (recognized, ignored)        :114-116
  P6  data[] flatten                          :139-142  → explode
  P7  projection + ref-path extraction        :144-149  → select on struct
  P8  textual "null" → SQL NULL + not-null    :151-156, 184-188
  P9  scalar casts                            :157-171  → cast/to_timestamp
  P10 datetime parse patterns                 DateTimeUtils.java:18-29
  P11 is_cdc_delete = upper(type)='DELETE'    :135-136, 172-173
  P12 offset column (Kafka metadata)          :174-175
  P13 partition_idx column                    :176-177
  P14 ts/es/CommitTs envelope epochs          :178-186
  P15 derived date partition col via ref      task.json:89-94

Filters P1/P3/P4 run BEFORE the explode so Catalyst prunes whole envelopes
without materializing their data[] arrays — the declarative analogue of the
reference running them inside the source deserializer. At 100 TB this is the
difference between shuffling parsed rows and dropping them at the scan.

The same ``parse`` function serves batch and Structured Streaming (it is a
pure DataFrame→DataFrame transformation with no actions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import TaskSpec
from .schema import DATE_PATTERN, TIMESTAMP_PATTERN, envelope_schema, spark_type

# sink-side derived columns the reference appends after the payload fields
# (task.json:71-95, DeserializedSchema.java:172-183)
DERIVED_COLS = ["offset", "partition_idx", "is_cdc_delete"]

# P14: configured fields that, when their ref key is ABSENT from the data[]
# element, fall back to envelope epoch-millis values — matched by trimmed,
# case-insensitive field NAME exactly like DeserializedSchema.java:178-186.
# Maps lowered field name → carried envelope column.
_ENVELOPE_EPOCH_FALLBACK = {
    "ts": "_env_ts",
    "es": "_env_es",
    "committs": "_env_commit_ts",
    "commit_ts": "_env_commit_ts",
}


def _null_lit(c: Column) -> Column:
    """Textual 'null' → SQL NULL (DeserializedSchema.java:151-156)."""
    return F.when(F.lower(F.trim(c)) == "null", F.lit(None)).otherwise(c)


def _cast(c: Column, type_str: str) -> Column:
    """String payload value → typed column (P9/P10)."""
    dt = spark_type(type_str)
    if isinstance(dt, T.TimestampNTZType):
        # reference pattern yyyy-MM-dd HH:mm:ss (DateTimeUtils.java:15)
        return F.to_timestamp_ntz(c, F.lit(TIMESTAMP_PATTERN))
    if isinstance(dt, T.DateType):
        # bare date OR datetime-truncated (DateTimeUtils.java:22-29)
        return F.coalesce(
            F.to_date(c, DATE_PATTERN),
            F.to_date(F.to_timestamp_ntz(c, F.lit(TIMESTAMP_PATTERN))),
        )
    if isinstance(dt, T.BooleanType):
        # Canal emits "true"/"false"/"1"/"0"
        return F.when(F.lower(F.trim(c)).isin("true", "1"), F.lit(True)).when(
            F.lower(F.trim(c)).isin("false", "0"), F.lit(False)
        )
    return c.cast(dt)


def parse(
    raw: DataFrame,
    spec: TaskSpec,
    value_col: str = "value",
    offset_col: str | None = None,
    partition_col: str | None = None,
    enforce_not_null: bool = True,
) -> DataFrame:
    """Raw envelope stream/batch → typed rows per the task spec.

    ``raw`` needs a string/binary ``value_col`` holding the Canal-JSON
    envelope. With a real Kafka source pass offset_col='offset',
    partition_col='partition'; with the file-simulated broker the envelope
    carries ``_offset``/``_partition`` inline (gen.py) and those are used.
    """
    payload_fields = sorted(
        {ref.split(".", 1)[1] for ref in spec.ref_map.values() if "." in ref}
    )
    env = envelope_schema(payload_fields)

    # P1: tombstone filter
    df = raw.filter(F.col(value_col).isNotNull())
    # P2: envelope parse (Catalyst prunes unreferenced struct fields)
    df = df.withColumn("j", F.from_json(F.col(value_col).cast("string"), env))
    # P3: routing filter — BEFORE explode so pruning hits the scan
    df = df.filter(
        (F.col("j.database") == F.lit(spec.source_database))
        & (F.col("j.table") == F.lit(spec.source_table))
    )
    # P4: drop query events (case-insensitive, trimmed)
    df = df.filter(F.lower(F.trim(F.col("j.type"))) != "query")
    # P5: DDL branch — recognized, not processed here (reference TODO,
    # DeserializedSchema.java:114-116): isDdl envelopes carry no data[] so
    # the explode below drops them from the row path, matching reference
    # behavior. ``ddl_events``/``pipeline.start_ddl_sink`` additionally
    # land them in a queryable side table.

    # P12/P13: Kafka metadata (native cols when real Kafka, inline otherwise)
    off = F.col(offset_col) if offset_col else F.col("j._offset")
    part = F.col(partition_col) if partition_col else F.col("j._partition")
    df = df.select(
        F.col("j"),
        off.cast("long").alias("offset"),
        part.cast("int").alias("partition_idx"),
        F.upper(F.trim(F.col("j.type"))).alias("_etype"),
    )
    # P6: one output row per data[] element. Envelope epochs ride along for
    # the P14 name-based fallbacks below.
    df = df.select(
        F.explode("j.data").alias("d"),
        "offset",
        "partition_idx",
        "_etype",
        F.col("j.ts").alias("_env_ts"),
        F.col("j.es").alias("_env_es"),
        F.col("j.CommitTs").alias("_env_commit_ts"),
    )

    # P7-P10, P15: projection with ref-path extraction + typed casts
    cols: list[Column] = []
    for f in spec.ordered_fields:
        leaf = f.ref.split(".", 1)[1] if "." in f.ref else f.ref
        raw_val = F.col(f"d.{leaf}")
        typed = _cast(_null_lit(raw_val), f.type)
        # P14: dataNode.has(key) is false → fall back to the envelope epoch
        # for fields NAMED ts/es/CommitTs (DeserializedSchema.java:178-186).
        # An absent key and a JSON null both surface as NULL raw_val (a
        # literal "null" string does not — it is non-null until _null_lit),
        # so isNull() is the has()-test for the only distinguishable cases.
        # Applied only to BIGINT targets: the reference stuffs asLong()
        # epochs into these columns, i.e. they are BIGINT by contract. A
        # timestamp-typed field keeps NULL rather than a mis-scaled cast,
        # and an int-typed field keeps NULL rather than a silently
        # wrapped low-32-bits epoch.
        fb = _ENVELOPE_EPOCH_FALLBACK.get(f.name.strip().lower())
        if fb is not None and isinstance(spark_type(f.type), T.LongType):
            typed = F.when(
                raw_val.isNull(), F.col(fb).cast(spark_type(f.type))
            ).otherwise(typed)
        cols.append(typed.alias(f.name))
    # P11-P14: derived columns
    cols += [
        F.col("offset"),
        F.col("partition_idx"),
        (F.col("_etype") == "DELETE").alias("is_cdc_delete"),
    ]
    out = df.select(*cols)

    # P8: not-null enforcement — the reference throws per-row
    # (IllegalArgumentException, DeserializedSchema.java:153-156). Throwing
    # inside codegen'd expressions is the declarative analogue: raise_error
    # under a when(). Toggleable for dead-letter routing instead.
    if enforce_not_null and spec.not_null_cols:
        for name in spec.not_null_cols:
            out = out.withColumn(
                name,
                F.when(
                    F.col(name).isNull(),
                    F.raise_error(
                        F.lit(f"field {name} cannot be null but is null")
                    ).cast(out.schema[name].dataType),
                ).otherwise(F.col(name)),
            )
    return out


def corrupt_envelopes(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Rows whose payload is non-null but not parseable as a JSON envelope.

    The reference's Jackson tree-parse throws on malformed bytes
    (DeserializedSchema.java:97-98, killing the job); the declarative
    ``from_json`` instead yields a NULL struct, which the routing filter
    then silently drops. This helper makes that silence observable: route
    it to a dead-letter table or count it via ``observe`` so a poisoned
    topic surfaces in metrics instead of as quietly-missing rows.
    Detection key: ``database`` is a required envelope field, so a parsed
    struct with NULL database means the JSON was malformed (or foreign).
    """
    env = envelope_schema([])
    parsed = F.from_json(F.col(value_col).cast("string"), env)
    return raw.filter(
        F.col(value_col).isNotNull() & parsed["database"].isNull()
    )


def ddl_events(
    raw: DataFrame,
    spec: TaskSpec | None = None,
    value_col: str = "value",
    offset_col: str | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """P5 made queryable: ``isDdl=true`` envelopes as typed side rows.

    The reference recognizes the DDL branch but leaves it a TODO
    (DeserializedSchema.java:114-116) — DDL events silently vanish. Here
    they are projected (database, table, ddl sql, event type, envelope
    epochs, broker coordinates) so a schema change on the source is
    queryable evidence in a side table instead of a silent no-op. With
    ``spec`` given, only the routed database/table's DDL is kept. As with
    ``parse`` (P12/P13), a real Kafka source supplies broker coordinates
    natively — pass offset_col='offset', partition_col='partition'; the
    file-simulated broker carries them inline as ``_offset``/``_partition``.
    """
    env = envelope_schema([])
    df = raw.filter(F.col(value_col).isNotNull()).withColumn(
        "j", F.from_json(F.col(value_col).cast("string"), env)
    )
    if spec is not None:
        df = df.filter(
            (F.col("j.database") == F.lit(spec.source_database))
            & (F.col("j.table") == F.lit(spec.source_table))
        )
    off = F.col(offset_col) if offset_col else F.col("j._offset")
    part = F.col(partition_col) if partition_col else F.col("j._partition")
    return df.filter(F.col("j.isDdl")).select(
        F.col("j.database").alias("database"),
        F.col("j.table").alias("table"),
        F.col("j.sql").alias("ddl_sql"),
        F.upper(F.trim(F.col("j.type"))).alias("event_type"),
        F.col("j.ts").alias("env_ts"),
        F.col("j.es").alias("env_es"),
        off.cast("long").alias("offset"),
        part.cast("int").alias("partition_idx"),
    )


def pk_mismatch_envelopes(
    raw: DataFrame, spec: TaskSpec, value_col: str = "value"
) -> DataFrame:
    """Envelopes whose ``pkNames`` disagree with the configured primary
    keys, for observability (the reference parses pkNames but never
    validates them — a silently mis-keyed upstream topic corrupts the
    upsert keying with no signal). Routed db/table only; envelopes
    without pkNames are NOT flagged (Canal omits it for some sources).
    Output: (database, table, pk_names, expected_pk, offset,
    partition_idx) — route to a side table or ``observe`` a count.
    """
    env = envelope_schema([])
    expected = F.array(
        *[F.lit(c) for c in sorted(spec.primary_keys)]
    )
    df = raw.filter(F.col(value_col).isNotNull()).withColumn(
        "j", F.from_json(F.col(value_col).cast("string"), env)
    )
    return (
        df.filter(
            (F.col("j.database") == F.lit(spec.source_database))
            & (F.col("j.table") == F.lit(spec.source_table))
            & F.col("j.pkNames").isNotNull()
            & (F.array_sort(F.col("j.pkNames")) != expected)
        )
        .select(
            F.col("j.database").alias("database"),
            F.col("j.table").alias("table"),
            F.col("j.pkNames").alias("pk_names"),
            expected.alias("expected_pk"),
            F.col("j._offset").alias("offset"),
            F.col("j._partition").alias("partition_idx"),
        )
    )


def update_diffs(
    raw: DataFrame,
    spec: TaskSpec,
    value_col: str = "value",
) -> DataFrame:
    """CDC field-level diffs from UPDATE envelopes' ``old`` array.

    Canal UPDATE envelopes carry, per data[] element, a parallel old[]
    element holding ONLY the columns that changed (pre-image). The
    reference parses and discards it; this surfaces it as one row per
    changed field — the audit-log / slowly-changing-dimension feed a
    CDC consumer usually has to reconstruct with a self-join over
    snapshots. Declarative shape: zip data[] with old[] by position
    (arrays_zip), explode once, then one output row per configured
    field present in the old image. Output: (pk..., field, old_value,
    new_value, offset, partition_idx) with values as wire strings
    ('null' normalized to NULL).
    """
    payload_fields = sorted(
        {ref.split(".", 1)[1] for ref in spec.ref_map.values() if "." in ref}
    )
    env = envelope_schema(payload_fields)
    df = (
        raw.filter(F.col(value_col).isNotNull())
        .withColumn("j", F.from_json(F.col(value_col).cast("string"), env))
        .filter(
            (F.col("j.database") == F.lit(spec.source_database))
            & (F.col("j.table") == F.lit(spec.source_table))
            & (F.upper(F.trim(F.col("j.type"))) == "UPDATE")
            & F.col("j.old").isNotNull()
        )
        .select(
            F.explode(F.arrays_zip("j.data", "j.old")).alias("z"),
            F.col("j._offset").alias("offset"),
            F.col("j._partition").alias("partition_idx"),
        )
    )
    pk_leafs = {
        f.name: (f.ref.split(".", 1)[1] if "." in f.ref else f.ref)
        for f in spec.ordered_fields
        if f.is_primary_key
    }
    pk_cols = [
        _null_lit(F.col(f"z.data.{leaf}")).alias(name)
        for name, leaf in pk_leafs.items()
    ]
    diffs = []
    for f in spec.ordered_fields:
        if f.is_primary_key:
            continue
        leaf = f.ref.split(".", 1)[1] if "." in f.ref else f.ref
        diffs.append(
            F.when(
                F.col(f"z.old.{leaf}").isNotNull(),
                F.struct(
                    F.lit(f.name).alias("field"),
                    _null_lit(F.col(f"z.old.{leaf}")).alias("old_value"),
                    _null_lit(F.col(f"z.data.{leaf}")).alias("new_value"),
                ),
            )
        )
    return (
        df.select(
            *pk_cols,
            F.explode(
                F.filter(F.array(*diffs), lambda d: d.isNotNull())
            ).alias("d"),
            "offset",
            "partition_idx",
        )
        .select(
            *pk_leafs.keys(),
            F.col("d.field").alias("field"),
            F.col("d.old_value").alias("old_value"),
            F.col("d.new_value").alias("new_value"),
            "offset",
            "partition_idx",
        )
    )


def violations(parsed: DataFrame, spec: TaskSpec) -> DataFrame:
    """Dead-letter variant of P8: rows violating not-null, for metrics."""
    if not spec.not_null_cols:
        return parsed.limit(0)
    cond = None
    for name in spec.not_null_cols:
        c = F.col(name).isNull()
        cond = c if cond is None else (cond | c)
    return parsed.filter(cond)


def field_drift(
    raw: DataFrame, spec: TaskSpec, value_col: str = "value"
) -> DataFrame:
    """Upstream schema-drift report: which fields actually arrive in the
    envelopes' ``data[]`` records vs what the task spec declares — the
    monitoring twin of the add-column evolution path (reference
    ConnectionUtils.java:54-61 ``addSignTime`` mutates the source mid-run;
    this is how you NOTICE it before deciding to evolve).

    One JSON-keys explode over the raw stream (json_object_keys of
    data[0] — JVM JSON path, no Python), one count agg on the tiny field
    domain, one full outer join against the |spec| field relation
    (broadcast). Fields the spec declares but no envelope carried show
    n_seen = 0; fields arriving that the spec never declared show
    expected = false — the alert condition.

    Output: (field, n_seen, expected) — one row per union of
    declared/observed field names.
    """
    observed = (
        raw.select(
            F.explode(
                F.json_object_keys(
                    F.get_json_object(F.col(value_col), "$.data[0]")
                )
            ).alias("field")
        )
        .groupBy("field")
        .agg(F.count(F.lit(1)).cast("long").alias("n_seen"))
    )
    spark = raw.sparkSession
    declared = spark.createDataFrame(
        [(f.name,) for f in spec.fields], "field string"
    ).withColumn("_declared", F.lit(True))
    # a FULL OUTER join cannot broadcast (Spark falls back to sort-merge);
    # split into a broadcast LEFT join for observed fields plus a
    # broadcast LEFT ANTI for declared-but-never-seen — same relation,
    # both sides stay broadcast hash joins
    seen = observed.join(F.broadcast(declared), "field", "left").select(
        "field",
        F.col("n_seen").cast("long").alias("n_seen"),
        F.coalesce("_declared", F.lit(False)).alias("expected"),
    )
    never = (
        declared.join(F.broadcast(observed), "field", "left_anti")
        .select(
            "field",
            F.lit(0).cast("long").alias("n_seen"),
            F.lit(True).alias("expected"),
        )
    )
    return seen.unionByName(never)


# ---------------------------------------------------------------------------
# P5 closed: DDL application (beyond the reference's TODO)

#: MySQL column type → task-spec type (schema.spark_type vocabulary).
#: Conservative: anything absent is unsupported and leaves the DDL as a
#: recognized-but-unapplied side event (never a guess).
MYSQL_TYPE_MAP = {
    "datetime": "timestamp",
    "timestamp": "timestamp",
    "date": "date",
    "varchar": "string",
    "char": "string",
    "text": "string",
    "tinytext": "string",
    "mediumtext": "string",
    "longtext": "string",
    "json": "string",
    "int": "int",
    "integer": "int",
    "tinyint": "int",
    "smallint": "int",
    "mediumint": "int",
    "bigint": "bigint",
    "float": "double",
    "double": "double",
    "decimal": "double",
    "numeric": "double",
    "bool": "boolean",
    "boolean": "boolean",
}

_ALTER_HEAD_RE = None
_ADD_CLAUSE_RE = None


def _split_clauses(rest: str) -> list[str]:
    """Split an ALTER body on top-level commas — commas inside parens
    (``decimal(10,2)``) or single-quoted strings (``comment 'a,b'``)
    never split."""
    out, buf, depth, in_str = [], [], 0, False
    for ch in rest:
        if in_str:
            buf.append(ch)
            if ch == "'":
                in_str = False
            continue
        if ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == "," and depth == 0:
            out.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    out.append("".join(buf))
    return [c.strip() for c in out if c.strip()]


def parse_add_columns(sql: str) -> list[tuple[str, str]]:
    """``ALTER TABLE … ADD [COLUMN] <name> <type> …`` → [(name, spec_type)].

    Handles the MySQL shape the reference's mock emits
    (ConnectionUtils.java:57-58: ``alter table test.t_busi_detail add
    sign_time datetime null comment '签收时间' after is_valid``):
    optional COLUMN keyword, backticks, a type with optional length
    args, trailing NULL/COMMENT/AFTER noise — and the multi-clause form
    ``add a int, add column b text``. ALL-OR-NOTHING: if ANY clause of
    the statement is not a supported ADD COLUMN (a drop/modify/rename
    mixed in, an exotic type), the whole statement returns [] —
    recognized, surfaced in the DDL side table, never HALF-applied
    (applying one clause of a multi-add and journaling the statement as
    done would silently drop the other columns forever).
    """
    import re

    global _ALTER_HEAD_RE, _ADD_CLAUSE_RE
    if _ALTER_HEAD_RE is None:
        _ALTER_HEAD_RE = re.compile(
            r"alter\s+table\s+[`\w.]+\s+", re.IGNORECASE
        )
        _ADD_CLAUSE_RE = re.compile(
            r"add\s+(?:column\s+)?"
            r"`?(?P<col>\w+)`?\s+(?P<type>\w+)(?:\s*\(\s*[\d,\s]*\s*\))?"
            r"(?:\s|$)",
            re.IGNORECASE,
        )
    stmt = (sql or "").strip().rstrip(";")
    m = _ALTER_HEAD_RE.match(stmt)
    if not m:
        return []
    cols: list[tuple[str, str]] = []
    for clause in _split_clauses(stmt[m.end():]):
        cm = _ADD_CLAUSE_RE.match(clause)
        if not cm:
            return []  # any non-ADD clause poisons the whole statement
        spec_type = MYSQL_TYPE_MAP.get(cm.group("type").lower())
        if spec_type is None:
            return []
        cols.append((cm.group("col"), spec_type))
    return cols


_MODIFY_HEAD_RE = None
_MODIFY_CLAUSE_RE = None


def parse_modify_columns(sql: str) -> list[tuple[str, str]]:
    """``ALTER TABLE … MODIFY [COLUMN] <name> <type> …`` → [(name,
    spec_type)].

    The type-change twin of :func:`parse_add_columns`, same MySQL noise
    tolerance (optional COLUMN keyword, backticks, length args, trailing
    NULL/COMMENT/AFTER) and the same ALL-OR-NOTHING rule: any clause
    that is not a supported MODIFY (a CHANGE rename, a drop, an exotic
    type, an ADD mixed in) poisons the whole statement to [] — it stays
    a recognized, surfaced side event, never half-applied. Whether the
    type change is actually a legal WIDENING is decided downstream by
    :func:`evolve_spec` against the sink's promotion lattice; this
    function only parses.
    """
    import re

    global _MODIFY_HEAD_RE, _MODIFY_CLAUSE_RE
    if _MODIFY_HEAD_RE is None:
        _MODIFY_HEAD_RE = re.compile(
            r"alter\s+table\s+[`\w.]+\s+", re.IGNORECASE
        )
        _MODIFY_CLAUSE_RE = re.compile(
            r"modify\s+(?:column\s+)?"
            r"`?(?P<col>\w+)`?\s+(?P<type>\w+)(?:\s*\(\s*[\d,\s]*\s*\))?"
            r"(?:\s|$)",
            re.IGNORECASE,
        )
    stmt = (sql or "").strip().rstrip(";")
    m = _MODIFY_HEAD_RE.match(stmt)
    if not m:
        return []
    cols: list[tuple[str, str]] = []
    for clause in _split_clauses(stmt[m.end():]):
        cm = _MODIFY_CLAUSE_RE.match(clause)
        if not cm:
            return []
        spec_type = MYSQL_TYPE_MAP.get(cm.group("type").lower())
        if spec_type is None:
            return []
        cols.append((cm.group("col"), spec_type))
    return cols


def _is_widening(old_spec_type: str, new_spec_type: str) -> bool:
    """True iff new is a strict widening of old in the sink's promotion
    lattice (int→bigint, float→double, small-int→double, …) — the exact
    same rule the table applies to data schemas, so a spec evolved here
    can never ask the sink for an illegal promotion."""
    from .schema import spark_type
    from .sink import SchemaEvolutionError, _widen_type

    old_t, new_t = spark_type(old_spec_type), spark_type(new_spec_type)
    if old_t == new_t:
        return False
    try:
        return _widen_type(old_t, new_t, "ddl") == new_t
    except SchemaEvolutionError:
        return False


def evolve_spec(spec: TaskSpec, ddl_sql: str) -> TaskSpec:
    """Apply a supported ADD COLUMN or type-widening MODIFY COLUMN
    statement to the task spec.

    Returns a NEW spec with the column appended (nullable, next seq) or
    its type widened — or the spec unchanged when the statement is
    unsupported, the column already exists (ADD), or the type change is
    not a widening / is already applied (MODIFY): idempotent, so
    journal replay and duplicate DDL delivery are no-ops. Narrowings
    and renames are never applied — they surface in the DDL side table
    like any other unsupported statement. The reference leaves this
    branch a TODO (DeserializedSchema.java:114-116) and silently drops
    schema changes until the job's field config is redeployed; applying
    the DDL closes that window without a restart.
    """
    from dataclasses import replace

    from .config import FieldSpec

    mods = parse_modify_columns(ddl_sql)
    if mods:
        by_name = {f.name: f for f in spec.fields}
        # a column named by more than one MODIFY clause is ambiguous
        # (which clause wins depends on dict-collapse order, and a
        # widening could be silently shadowed by a later no-op) —
        # reject the whole statement, preserving all-or-nothing + the
        # identity contract (evolve_spec(out, sql) is out)
        if len({name for name, _ in mods}) != len(mods):
            return spec
        # all-or-nothing: every clause must name a known column and be a
        # widening (or an already-applied no-op)
        changed = False
        for name, new_type in mods:
            f = by_name.get(name)
            if f is None:
                return spec
            if f.type == new_type:
                continue  # already applied (replay / duplicate delivery)
            if not _is_widening(f.type, new_type):
                return spec
            changed = True
        if not changed:
            return spec
        to_widen = dict(mods)
        new_fields = [
            replace(f, type=to_widen[f.name])
            if f.name in to_widen and f.type != to_widen[f.name]
            else f
            for f in spec.fields
        ]
        return replace(spec, fields=new_fields)

    cols = parse_add_columns(ddl_sql)
    if not cols:
        return spec
    # same ambiguity rule as MODIFY above: a column named by more than
    # one ADD clause is rejected whole (first-wins would silently shadow
    # a conflicting later type, e.g. 'add a smallint, add a bigint')
    if len({name for name, _ in cols}) != len(cols):
        return spec
    existing = {f.name for f in spec.fields}
    new_fields = list(spec.fields)
    next_seq = max((f.seq for f in spec.fields), default=0)
    changed = False
    for name, spec_type in cols:
        if name in existing:
            continue
        next_seq += 1
        new_fields.append(FieldSpec(name, next_seq, spec_type))
        changed = True
    if not changed:
        return spec
    return replace(spec, fields=new_fields)
