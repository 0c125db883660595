"""Elasticsearch bulk-API encoder (the ``elasticsearch`` sink's wire
format).

Parity: reference ``src/sinks/elasticsearch/encoder.rs``:

- each event encodes as an action line + ``\\n`` + document JSON + ``\\n``
  (encode_input, :115-136 — the newline goes BEFORE the doc and after it).
- action line layout (write_bulk_action, :142-220):
  ``{"<action>":{"_index":"<index>"[,"_type":"<doc_type>"]
  [,"_id":"<id>"][,"version_type":"<vt>","version":<v>]}}`` — ``_type``
  is omitted when ``suppress_type_name`` (the ES 8 default), version only
  with an id (DocumentMetadata::IdAndVersion).
- bulk actions: ``index`` / ``create`` / ``update``
  (BulkAction::as_str, mod.rs:97-103).
- the reference writes index/id values raw (write! — no JSON escaping);
  we mirror that, so callers must not put ``"`` in ids/index names
  (templated indexes never do).
- index templating: the common ``logs-%Y.%m.%d`` date-stamped index
  (Template::render with event timestamp) ≙ :func:`datestamped_index`.

Pure column expressions; the doc JSON is whatever the caller encodes
(``F.to_json(struct)`` or a hand-built column). The full request body is
the concatenation of blocks — at scale that's ``array_join(collect_list)``
per POST-sized partition, never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BULK_ACTIONS = ("index", "create", "update")


def datestamped_index(prefix: str, ts: Column, fmt: str = "yyyy.MM.dd") -> Column:
    """``<prefix>-<date>`` index name from the event timestamp (the
    reference's ``Template`` render of e.g. ``logs-%Y.%m.%d``)."""
    return F.concat(F.lit(prefix + "-"), F.date_format(ts, fmt))


def bulk_action_line(
    action: Column | str,
    index: Column,
    doc_id: Column | None = None,
    doc_type: str = "_doc",
    suppress_type: bool = True,
    version: Column | None = None,
    version_type: str = "external",
) -> Column:
    """The bulk-API action line (write_bulk_action field order)."""
    act = F.lit(action) if isinstance(action, str) else action
    parts = [F.lit('{"'), act, F.lit('":{"_index":"'), index, F.lit('"')]
    if not suppress_type:
        parts += [F.lit(',"_type":"'), F.lit(doc_type), F.lit('"')]
    if doc_id is not None:
        parts += [F.lit(',"_id":"'), doc_id.cast("string"), F.lit('"')]
        if version is not None:
            parts += [
                F.lit(',"version_type":"'), F.lit(version_type),
                F.lit('","version":'), version.cast("long").cast("string"),
            ]
    parts.append(F.lit("}}"))
    return F.concat(*parts)


def encode_bulk(action_line: Column, doc_json: Column) -> Column:
    """One event's bulk block: action + newline + doc + newline
    (encoder.rs:127-135)."""
    return F.concat(action_line, F.lit("\n"), doc_json, F.lit("\n"))
