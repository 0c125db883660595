"""The VRL-stdlib function surface (reference: 180 functions documented under
website/cue/reference/remap/functions/*.cue), re-expressed as builders that
return ``pyspark.sql.Column`` — JVM-side built-ins wherever Spark has them,
vectorized pandas UDFs only for grok-class parses.

Submodules: ``parse`` (parse_* family), ``strings``, ``crypto`` (hash/encode),
``ip``, ``syslog`` (facility/level maps), ``grok`` (pattern expansion).
"""

from vector_spark.functions import crypto, grok, ip, parse, strings, syslog  # noqa: F401
