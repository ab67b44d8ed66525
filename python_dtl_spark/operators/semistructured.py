"""Semi-structured (JSON sidecar) column handling — schema-on-read
extraction of typed fields from JSON string columns.

The reference has no nested or semi-structured types at all (its Arrow
import whitelist rejects anything non-scalar, ast_to_ir.py:636-650);
event pipelines universally carry a JSON "properties" sidecar, so this
is an M6 extension like streaming.

Spark-first shape: ``F.from_json`` with an explicit DDL schema — ONE
JVM-side parse per row materialising a struct, then plain column
projections off that struct.  That keeps extraction inside whole-stage
codegen and parses each row exactly once no matter how many fields are
pulled (``get_json_object`` re-parses the document per field, k parses
per row for k fields).  Schema-on-read means malformed documents or
missing keys become NULL fields, never job failures — the right
contract at 100 TB where some fraction of sidecars is always junk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_extract_fields(
    df: DataFrame,
    json_col: str,
    fields: dict[str, str],
    prefix: str = "",
) -> DataFrame:
    """Append one typed column per ``fields`` entry extracted from the
    JSON string column ``json_col``.

    ``fields`` maps field name → Spark DDL type (``"bigint"``,
    ``"double"``, ``"string"``, nested ``"array<bigint>"`` …).  Output
    columns are named ``{prefix}{field}``; a document where the field
    is absent, has an incompatible type, or fails to parse yields NULL
    for that column (PERMISSIVE mode — the whole row never drops).

    Plan shape: a single ``from_json`` struct evaluated once per row
    (common-subexpression-eliminated across the projections), no
    shuffle, fully codegen'd.  The extracted columns are ordinary
    Catalyst columns: filters on them sit directly on the scan output,
    and any later aggregation/partitioning sees plain typed values.
    """
    if not fields:
        raise ValueError("fields must name at least one field to extract")
    clash = [prefix + name for name in fields if prefix + name in df.columns]
    if clash:
        # Spark allows duplicate column names in a projection; the
        # ambiguity only explodes later at resolution time — reject it
        # here where the cause is obvious
        raise ValueError(
            f"extracted column(s) {clash} collide with existing columns; "
            "set prefix= to disambiguate"
        )
    ddl = ", ".join(
        "`" + name.replace("`", "``") + "` " + dtype
        for name, dtype in fields.items()
    )
    parsed = F.from_json(F.col(json_col), ddl)
    helper = "__json_parsed"
    while helper in df.columns:
        helper += "_"
    out = df.withColumn(helper, parsed)
    return out.select(
        *df.columns,
        *[
            F.col(helper).getField(name).alias(prefix + name)
            for name in fields
        ],
    )
